"""Config system, dataset catalog parsers, and the run_full CLI driver."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "script"))

from ultra_torchdrug_tpu.data.catalog import _load_file, _load_grail, Vocab
from ultra_torchdrug_tpu.utils.config import (
    detect_variables, load_config, lookup, meshgrid, parse_args,
)


def test_meshgrid():
    grid = {"a": [1, 2], "b": ["x"]}
    combos = list(meshgrid(grid))
    assert {(c["a"], c["b"]) for c in combos} == {(1, "x"), (2, "x")}


def test_detect_variables_and_load(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("lr: {{ lr }}\nname: fixed\n")
    assert detect_variables(str(cfg_file)) == ["lr"]
    cfg = load_config(str(cfg_file), context={"lr": 0.1})[0]
    assert cfg["lr"] == 0.1 and cfg["name"] == "fixed"


def test_grid_expansion(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("lr: [0.1, 0.2]\n---\nlearning_rate: {{ lr }}\n")
    cfgs = load_config(str(cfg_file))
    assert [c["learning_rate"] for c in cfgs] == [0.1, 0.2]


def test_parse_args(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("d: {{ dataset }}\ng: {{ gpus }}\n")
    args, ctx = parse_args(
        ["-c", str(cfg_file), "--dataset", "SynthKG", "--gpus", "[0]"]
    )
    assert ctx == {"dataset": "SynthKG", "gpus": [0]}
    assert args.seed == 1024


def test_load_file_orders(tmp_path):
    f = tmp_path / "t.txt"
    f.write_text("a\tr1\tb\nb\tr2\tc\n")
    v = Vocab()
    tri = _load_file(str(f), v, "hrt")  # default: tab-separated (tsv families)
    assert tri.tolist() == [[0, 1, 0], [1, 2, 1]]
    fs = tmp_path / "ts.txt"
    fs.write_text("a r1 b\nb r2 c\n")
    vs = Vocab()
    tri_s = _load_file(str(fs), vs, "hrt", sep=None)  # four-file families
    assert tri_s.tolist() == [[0, 1, 0], [1, 2, 1]]
    f2 = tmp_path / "t2.txt"
    f2.write_text("a\tb\tr1\n")
    v2 = Vocab()
    tri2 = _load_file(str(f2), v2, "htr")
    assert tri2.tolist() == [[0, 1, 0]]


def _write(p, rows):
    p.write_text("\n".join("\t".join(r) for r in rows) + "\n")


def test_grail_loader_semantics(tmp_path):
    # transductive files
    _write(tmp_path / "t_train.txt", [["a", "r1", "b"], ["b", "r2", "c"]])
    _write(tmp_path / "t_valid.txt", [["a", "r2", "c"]])
    _write(tmp_path / "t_test.txt", [["c", "r1", "a"]])
    # inductive files (new entities, same relations)
    _write(tmp_path / "i_train.txt", [["x", "r1", "y"], ["y", "r2", "z"]])
    _write(tmp_path / "i_valid.txt", [["x", "r2", "z"]])
    _write(tmp_path / "i_test.txt", [["z", "r1", "x"]])
    tf = [str(tmp_path / f"t_{s}.txt") for s in ("train", "valid", "test")]
    inf = [str(tmp_path / f"i_{s}.txt") for s in ("train", "valid", "test")]

    ds = _load_grail("g", tf, inf, merge_valid_test=False, use_inductive_valid=True)
    assert ds.train_graph.num_nodes == 3 and ds.test_graph.num_nodes == 3
    assert ds.num_relations == 2
    assert ds.valid_graph is ds.test_graph
    assert len(ds.valid) == 1 and len(ds.test) == 1
    assert ds.graph.num_edges == 4  # all transductive
    assert ds.inductive_graph.num_edges == 4

    ds2 = _load_grail("g", tf, inf, merge_valid_test=False, use_inductive_valid=False)
    assert ds2.valid_graph is ds2.train_graph
    assert len(ds2.valid) == 1  # transductive valid

    ds3 = _load_grail("g", tf, inf, merge_valid_test=True, use_inductive_valid=False)
    assert len(ds3.test) == 2  # inductive valid + test merged


def test_registry_has_full_catalog():
    for name in [
        "CoDExSmall", "CoDExMedium", "CoDExLarge", "FB15k237", "WN18RR",
        "YAGO310", "ConceptNet100k", "ATOMIC", "AristoV4", "DBpedia50k",
        "DBpedia100k", "WDsinger", "NELL23k", "FB15k237_10", "FB15k237_20",
        "FB15k237_50", "NELL995", "UUKG_NYC", "UUKG_CHI", "FB15k237Inductive",
        "WN18RRInductive", "NELLInductive", "ILPC2022SmallInductive",
        "ILPC2022LargeInductive", "FBIngram", "WKIngram", "NLIngram", "FBNELL",
        "Metafam", "WikiTopicsMT1", "WikiTopicsMT2", "WikiTopicsMT3",
        "WikiTopicsMT4", "HamaguchiBM", "JointDataset", "SynthKG",
        "SynthInductiveKG", "SynthJoint",
    ]:
        assert lookup(name) is not None


def test_run_full_cli_smoke(tmp_path):
    import run_full

    engine = run_full.main(
        ["-c", os.path.join(REPO, "config/synthetic/smoke.yaml"),
         "--outdir", str(tmp_path)]
    )
    assert engine.epoch == 1
    # produced a checkpoint and log
    files = os.listdir(engine.work_dir)
    assert any(f.endswith(".ckpt") for f in files)
    assert "log.txt" in files


def test_run_full_cli_multichip(tmp_path):
    """`parallel: {data, edge}` in the YAML builds the mesh, threads
    edge_axis into the model configs, and the task partitions its graphs —
    the full multi-chip flow driven purely from a config file."""
    import yaml

    import run_full

    with open(os.path.join(REPO, "config/synthetic/smoke.yaml")) as f:
        text = f.read().replace("{{ outdir }}", str(tmp_path))
    cfg = yaml.safe_load(text)
    cfg["parallel"] = {"data": 2, "edge": 4}
    cfg["rspmm_impl"] = "ring"
    path = os.path.join(str(tmp_path), "smoke_mc.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    engine = run_full.main(["-c", path])
    assert engine.mesh is not None
    assert dict(engine.mesh.shape) == {"data": 2, "edge": 4}
    # the task actually partitioned: ring inputs attached to the prop graph
    cfgm = engine.task.model_cfg
    assert cfgm.entity.edge_axis == "edge"
    # the tiny relation tower stays replicated unless parallel.relation_edge
    assert cfgm.relation.edge_axis == ""
    m = engine.evaluate("valid")
    assert 0 < m["mrr"] <= 1


def test_run_many_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import run_many

    cfg = os.path.join(REPO, "config/synthetic/smoke.yaml")
    # run_many re-renders the config per dataset spec; outdir var needed
    import sys as _sys

    argv = ["run_many", "-c", cfg, "-d", "SynthKG", "--finetune"]
    monkeypatch.setattr(_sys, "argv", argv)
    # smoke.yaml template var {{ outdir }}: provide through the context table
    orig_load = run_many.load_config

    def load_with_outdir(path, context=None):
        context = dict(context or {})
        context["outdir"] = str(tmp_path)
        return orig_load(path, context=context)

    monkeypatch.setattr(run_many, "load_config", load_with_outdir)
    run_many.main()
    csvs = [f for f in os.listdir(tmp_path) if f.startswith("ultra_results_")]
    assert csvs, "results CSV missing"
    text = (tmp_path / csvs[0]).read_text()
    assert "mrr" in text and "SynthKG" in text
