"""Fixture-file tests for every dataset-catalog family (data/catalog.py).

Each test hand-writes tiny files in the REAL on-disk format the loader
expects at its canonical cache location, then asserts vocab sizes, split
shapes, column-order handling, merge semantics, and graph selection against
the reference's parsing rules (/root/reference/ultra/dataset.py line refs
inline below).
"""

import os

import numpy as np
import pytest

from ultra_torchdrug_tpu.data import catalog
from ultra_torchdrug_tpu.utils.config import lookup


def _write(path, rows, sep="\t"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write(sep.join(row) + "\n")
    return path


# ---------------------------------------------------------------------------
# transductive tsv families
# ---------------------------------------------------------------------------


def test_codex_hrt_shared_vocab(tmp_path):
    """CoDEx (ref :17-196): h r t columns, one vocab across all splits,
    ids assigned in file order h-then-t."""
    root = tmp_path / "codex-s"
    _write(root / "train.txt", [("a", "r0", "b"), ("b", "r1", "c")])
    _write(root / "valid.txt", [("a", "r0", "c")])
    _write(root / "test.txt", [("d", "r1", "a")])
    ds = lookup("CoDExSmall")(path=str(tmp_path))
    assert ds.num_entities == 4 and ds.num_relations == 2
    assert len(ds.train) == 2 and len(ds.valid) == 1 and len(ds.test) == 1
    # (h, t, r) storage; a=0 b=1 c=2 d=3, r0=0 r1=1
    assert ds.train.tolist() == [[0, 1, 0], [1, 2, 1]]
    assert ds.test.tolist() == [[3, 0, 1]]
    assert int(ds.graph.num_edges) == 4


def test_tab_separated_entities_with_spaces(tmp_path):
    """The tsv families split on TAB only (csv.reader(delimiter='\\t'),
    ref :345): entity names containing spaces stay one token."""
    root = tmp_path / "codex-s"
    _write(root / "train.txt", [("New York", "in", "United States")])
    _write(root / "valid.txt", [("New York", "in", "United States")])
    _write(root / "test.txt", [("New York", "in", "United States")])
    ds = lookup("CoDExSmall")(path=str(tmp_path))
    assert ds.num_entities == 2 and ds.num_relations == 1


def test_dbpedia50k_htr_order(tmp_path):
    """DBpedia50k (ref :1149-1152): columns are h, t, r — NOT h, r, t."""
    rows = [("a", "b", "likes"), ("b", "c", "knows")]
    for s in ("train", "valid", "test"):
        _write(tmp_path / f"dbp50k_{s}.txt", rows[: 1 if s != "train" else 2])
    ds = lookup("DBpedia50k")(path=str(tmp_path))
    assert ds.num_entities == 3  # a, b, c — "likes"/"knows" are relations
    assert ds.num_relations == 2
    assert ds.train.tolist() == [[0, 1, 0], [1, 2, 1]]


def test_sparser_kg_triples_files(tmp_path):
    """SparserKG (ref :1231-1246): <folder>/{train,dev,test}.triples in
    h t r order (inherits the DBpedia50k parser)."""
    root = tmp_path / "WD-singer"
    _write(root / "train.triples", [("s1", "s2", "sang"), ("s2", "s3", "wrote")])
    _write(root / "dev.triples", [("s1", "s3", "sang")])
    _write(root / "test.triples", [("s3", "s1", "wrote")])
    ds = lookup("WDsinger")(path=str(tmp_path))
    assert ds.num_entities == 3 and ds.num_relations == 2
    assert len(ds.valid) == 1  # dev file -> valid split
    assert ds.valid.tolist() == [[0, 2, 0]]


def test_nell995_facts_train_merge(tmp_path):
    """NELL995 (ref :1275-1311): four files; train split = facts + train
    (num_samples[0]+num_samples[1] collapsed into one chunk)."""
    _write(tmp_path / "nell995_facts.txt", [("a", "r0", "b"), ("b", "r0", "c")])
    _write(tmp_path / "nell995_train.txt", [("c", "r1", "a")])
    _write(tmp_path / "nell995_valid.txt", [("a", "r1", "c")])
    _write(tmp_path / "nell995_test.txt", [("b", "r1", "a")])
    ds = lookup("NELL995")(path=str(tmp_path))
    assert len(ds.train) == 3  # 2 facts + 1 train
    assert ds.train.tolist()[:2] == [[0, 1, 0], [1, 2, 0]]
    assert len(ds.valid) == 1 and len(ds.test) == 1
    assert ds.num_entities == 3 and ds.num_relations == 2


def test_urbankg_suffix_files(tmp_path):
    """UrbanKG (ref :1317-1337): UrbanKG_<suffix>/{split}_<suffix>.txt."""
    root = tmp_path / "UrbanKG_NYC"
    _write(root / "train_NYC.txt", [("poi1", "near", "poi2")])
    _write(root / "valid_NYC.txt", [("poi2", "near", "poi1")])
    _write(root / "test_NYC.txt", [("poi1", "near", "poi2")])
    ds = lookup("UUKG_NYC")(path=str(tmp_path))
    assert ds.num_entities == 2 and ds.num_relations == 1


# ---------------------------------------------------------------------------
# GraIL six-file inductives
# ---------------------------------------------------------------------------


def _grail_fixture(tmp_path, version="v1"):
    """fb15k237_<v>_{train,valid,test}.txt + _ind_ counterparts.
    Transductive entities A..; inductive entities X.. (disjoint);
    relations shared."""
    t = [
        ("A", "r0", "B"), ("B", "r1", "C"), ("C", "r0", "A"),  # train
        ("A", "r1", "C"),                                       # valid
        ("B", "r0", "A"),                                       # test
    ]
    i = [
        ("X", "r0", "Y"), ("Y", "r1", "Z"),  # ind train (inference graph)
        ("X", "r1", "Z"),                     # ind valid
        ("Z", "r0", "X"), ("Z", "r1", "Y"),   # ind test
    ]
    _write(tmp_path / f"fb15k237_{version}_train.txt", t[:3])
    _write(tmp_path / f"fb15k237_{version}_valid.txt", t[3:4])
    _write(tmp_path / f"fb15k237_{version}_test.txt", t[4:5])
    _write(tmp_path / f"fb15k237_{version}_ind_train.txt", i[:2])
    _write(tmp_path / f"fb15k237_{version}_ind_valid.txt", i[2:3])
    _write(tmp_path / f"fb15k237_{version}_ind_test.txt", i[3:5])


@pytest.mark.parametrize(
    "merge,ind_valid,n_valid,n_test",
    [
        (True, False, 1, 3),   # valid=t_valid, test=i_valid+i_test (ref :415-418)
        (True, True, 2, 3),    # valid=i_train, test=i_valid+i_test (ref :409-413)
        (False, False, 1, 2),  # valid=t_valid, test=i_test (ref :426-429)
        (False, True, 1, 2),   # valid=i_valid, test=i_test (ref :420-424)
    ],
)
def test_grail_merge_combos(tmp_path, merge, ind_valid, n_valid, n_test):
    _grail_fixture(tmp_path)
    ds = catalog._grail_inductive(
        "FB15k237Inductive", "fb237_%s", "fb15k237", path=str(tmp_path),
        version="v1", merge_valid_test=merge, use_inductive_valid=ind_valid,
    )
    assert len(ds.train) == 3
    assert len(ds.valid) == n_valid and len(ds.test) == n_test
    # vocabularies: 3 transductive entities, 3 inductive, 2 shared relations
    assert ds.train_graph.num_nodes == 3 and ds.test_graph.num_nodes == 3
    assert ds.num_relations == 2
    # graph selection (ref :398-401): valid_graph is train or test graph
    assert ds.valid_graph is (ds.test_graph if ind_valid else ds.train_graph)
    # filter graphs: all 5 transductive edges / all 5 inductive edges
    assert int(ds.graph.num_edges) == 5
    assert int(ds.inductive_graph.num_edges) == 5
    # inductive ids are inductive-local (X=0, Y=1, Z=2)
    ind_train_graph_edges = np.asarray(ds.test_graph.edge_index)
    assert ind_train_graph_edges.max() <= 2


def test_grail_rejects_unseen_inductive_relation(tmp_path):
    """Reference asserts every inductive relation exists transductively
    (dataset.py:379)."""
    _grail_fixture(tmp_path)
    _write(tmp_path / "fb15k237_v1_ind_test.txt", [("X", "rNEW", "Y")])
    with pytest.raises(ValueError, match="relations absent"):
        catalog._grail_inductive(
            "FB15k237Inductive", "fb237_%s", "fb15k237", path=str(tmp_path),
            version="v1",
        )


# ---------------------------------------------------------------------------
# four-file inductives: ILPC / InGram / MTDEA / Hamaguchi
# ---------------------------------------------------------------------------


def test_ilpc_inference_vocab(tmp_path):
    """ILPC (ref :222-247): valid/test extend the INFERENCE vocab; the train
    vocab is separate; valid_graph = test_graph = inference graph."""
    root = tmp_path / "ilpc-small" / "pykeen-ilpc2022-c5ea003" / "data" / "small"
    _write(root / "train.txt", [("a", "r0", "b"), ("b", "r1", "c")], sep=" ")
    _write(root / "inference.txt", [("p", "r0", "q"), ("q", "r1", "s")], sep=" ")
    _write(root / "inference_validation.txt", [("p", "r1", "s")], sep=" ")
    _write(root / "inference_test.txt", [("s", "r0", "p")], sep=" ")
    ds = lookup("ILPC2022SmallInductive")(path=str(tmp_path))
    assert ds.train_graph.num_nodes == 3  # a, b, c
    assert ds.test_graph.num_nodes == 3   # p, q, s
    assert ds.valid_graph is ds.test_graph
    assert ds.graph is ds.train_graph     # ref :244
    assert int(ds.inductive_graph.num_edges) == 4  # inference + valid + test
    # valid triples indexed in the inference vocab: p=0 q=1 s=2
    assert ds.valid.tolist() == [[0, 2, 1]]


def test_ingram_msg_file_is_inference_graph(tmp_path):
    """InGram (ref :760-790): files train/msg/valid/test; msg is the
    inference graph; valid+test extend its vocab."""
    root = tmp_path / "fb-25"
    _write(root / "fb-25_train.txt", [("a", "r0", "b")], sep=" ")
    _write(root / "fb-25_msg.txt", [("m", "r0", "n")], sep=" ")
    _write(root / "fb-25_valid.txt", [("m", "r0", "o")], sep=" ")
    _write(root / "fb-25_test.txt", [("o", "r0", "n")], sep=" ")
    ds = lookup("FBIngram")(path=str(tmp_path))
    assert ds.train_graph.num_nodes == 2
    assert ds.valid_graph is ds.test_graph
    assert int(ds.test_graph.num_edges) == 1  # msg only
    assert int(ds.inductive_graph.num_edges) == 3
    # o joined the inference vocab after m, n
    assert ds.valid.tolist() == [[0, 2, 0]]


def test_mtdea_limit_valid_vocab(tmp_path):
    """MTDEA (ref :916-948): valid loads on the TRAIN vocab with
    limit_vocab=True — rows mentioning unseen entities/relations are DROPPED;
    test loads on the inference vocab (growing). Separate relation vocabs."""
    root = tmp_path / "Metafam"
    _write(root / "Metafam-trans/train.txt",
           [("a", "r0", "b"), ("b", "r1", "c")], sep=" ")
    _write(root / "Metafam-trans/valid.txt",
           [("a", "r1", "c"), ("a", "r0", "UNSEEN"), ("a", "rNEW", "b")],
           sep=" ")
    _write(root / "Metafam-ind/observe.txt", [("x", "r0", "y")], sep=" ")
    _write(root / "Metafam-ind/test.txt", [("y", "r0", "zNEW")], sep=" ")
    ds = lookup("Metafam")(path=str(tmp_path))
    # the UNSEEN-entity and rNEW-relation rows are dropped from valid
    assert len(ds.valid) == 1 and ds.valid.tolist() == [[0, 2, 1]]
    assert ds.train_graph.num_nodes == 3  # vocab NOT grown by valid
    # valid lives on the TRAIN graph (ref :939-940)
    assert int(ds.valid_graph.num_edges) == int(ds.train_graph.num_edges)
    # test grew the inference vocab: x, y, zNEW
    assert ds.test_graph.num_nodes == 3
    assert int(ds.inductive_graph.num_edges) == 2  # observe + test


def test_mtdea_versioned_paths(tmp_path):
    """WikiTopics (ref :1013-1046): prefix wikidata_<version>v1 under the
    WikiTopics-MT1 folder."""
    root = tmp_path / "WikiTopics-MT1"
    _write(root / "wikidata_healthv1-trans/train.txt", [("a", "r0", "b")], sep=" ")
    _write(root / "wikidata_healthv1-trans/valid.txt", [("a", "r0", "b")], sep=" ")
    _write(root / "wikidata_healthv1-ind/observe.txt", [("x", "r0", "y")], sep=" ")
    _write(root / "wikidata_healthv1-ind/test.txt", [("x", "r0", "y")], sep=" ")
    ds = lookup("WikiTopicsMT1")(path=str(tmp_path), version="health")
    assert len(ds.train) == 1 and len(ds.valid) == 1 and len(ds.test) == 1
    with pytest.raises(AssertionError):
        lookup("WikiTopicsMT1")(path=str(tmp_path), version="nope")


def test_hamaguchi_valid_grows_train_vocab(tmp_path):
    """HamaguchiBM (ref :1069-1100): valid loads on the train vocab WITHOUT
    limit_vocab — unseen valid entities grow the vocab (valid_graph num_node
    = valid_results num_node)."""
    root = tmp_path / "bm-1k"
    _write(root / "bm-1k_train.txt", [("a", "r0", "b")], sep=" ")
    _write(root / "bm-1k_test-graph.txt", [("x", "r0", "y")], sep=" ")
    _write(root / "bm-1k_valid.txt", [("a", "r0", "NEWENT")], sep=" ")
    _write(root / "bm-1k_test-fact.txt", [("y", "r0", "x")], sep=" ")
    ds = lookup("HamaguchiBM")(path=str(tmp_path), version="1k")
    assert len(ds.valid) == 1  # not dropped
    # valid_graph carries train edges but the GROWN vocab (a, b, NEWENT)
    assert ds.valid_graph.num_nodes == 3
    assert int(ds.valid_graph.num_edges) == 1
    assert ds.train_graph.num_nodes == 2  # train vocab before valid


# ---------------------------------------------------------------------------
# joint
# ---------------------------------------------------------------------------


def test_joint_dataset_from_files(tmp_path):
    """JointDataset (ref :668-738): named sub-datasets built off one root."""
    root = tmp_path / "codex-s"
    for s in ("train", "valid", "test"):
        _write(root / f"{s}.txt", [("a", "r0", "b")])
    _write(tmp_path / "nell995_facts.txt", [("a", "r0", "b")])
    _write(tmp_path / "nell995_train.txt", [("b", "r0", "a")])
    _write(tmp_path / "nell995_valid.txt", [("a", "r0", "b")])
    _write(tmp_path / "nell995_test.txt", [("b", "r0", "a")])
    ds = lookup("JointDataset")(path=str(tmp_path),
                                graphs=("CoDExSmall", "NELL995"))
    assert len(ds.datasets) == 2
    assert ds.datasets[0].num_entities == 2
    assert len(ds.datasets[1].train) == 2  # facts+train merge
