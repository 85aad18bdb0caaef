"""Archive download -> extract -> parse flows for the dataset catalog.

test_catalog_fixtures.py covers the file FORMATS by pre-populating the cache;
these tests cover the acquisition path that had never executed offline: the
tar/zip member strings and the download plumbing. Archives are authored with
the exact member layouts the reference encodes
(/root/reference/ultra/dataset.py:37-39 codex-{size}/{split}.txt,
:217-220 pykeen-ilpc2022-c5ea003/data/{size}/{f}.txt, :655 bare
train/valid/test members), and _download is monkeypatched to serve them, so
a wrong member path fails here instead of at first real use.
"""

import os
import tarfile
import zipfile

import pytest

from ultra_torchdrug_tpu.data import catalog
from ultra_torchdrug_tpu.utils.config import lookup


def _rows(*triples):
    return "".join("\t".join(t) + "\n" for t in triples)


def _serve(archive_path):
    """_download stand-in: 'fetch' any URL by copying the authored archive."""

    def download(url, dst):
        assert url.startswith("http"), url
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if not os.path.exists(dst):
            import shutil

            shutil.copy(archive_path, dst)
        return dst

    return download


def test_codex_tarball_member_layout(tmp_path, monkeypatch):
    """CoDEx ships as codex-{size}.tar.gz with members
    codex-{size}/{split}.txt (ref dataset.py:37-39): the loader must extract
    into the cache dir and read from the inner directory."""
    src = tmp_path / "src"
    os.makedirs(src)
    for split, rows in [
        ("train", _rows(("a", "r0", "b"), ("b", "r1", "c"))),
        ("valid", _rows(("a", "r0", "c"))),
        ("test", _rows(("d", "r1", "a"))),
    ]:
        with open(src / f"{split}.txt", "w") as f:
            f.write(rows)
    tar_path = tmp_path / "codex-s.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for split in ("train", "valid", "test"):
            tf.add(src / f"{split}.txt", arcname=f"codex-s/{split}.txt")

    cache = tmp_path / "cache"
    monkeypatch.setattr(catalog, "_download", _serve(str(tar_path)))
    ds = lookup("CoDExSmall")(path=str(cache))
    assert ds.num_entities == 4 and ds.num_relations == 2
    assert len(ds.train) == 2 and len(ds.valid) == 1 and len(ds.test) == 1
    # second build hits the extracted files, no download
    monkeypatch.setattr(catalog, "_download",
                        lambda url, dst: pytest.fail("re-downloaded"))
    ds2 = lookup("CoDExSmall")(path=str(cache))
    assert ds2.train.tolist() == ds.train.tolist()


def test_ilpc_zip_member_layout(tmp_path, monkeypatch):
    """ILPC 2022 ships one zip for both sizes with members
    pykeen-ilpc2022-c5ea003/data/{size}/{f}.txt (ref dataset.py:217-220)."""
    zip_path = tmp_path / "ilpc.zip"
    member = "pykeen-ilpc2022-c5ea003/data/small/{f}.txt"
    contents = {
        "train": _rows(("a", "r0", "b"), ("b", "r1", "c"), ("c", "r0", "a")),
        "inference": _rows(("x", "r0", "y"), ("y", "r1", "z")),
        "inference_validation": _rows(("x", "r0", "z")),
        "inference_test": _rows(("z", "r1", "x")),
    }
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f, data in contents.items():
            zf.writestr(member.format(f=f), data)

    cache = tmp_path / "cache"
    monkeypatch.setattr(catalog, "_download", _serve(str(zip_path)))
    ds = lookup("ILPC2022SmallInductive")(path=str(cache))
    # transductive graph: 3 entities / 2 relations; inference graph: x, y, z
    assert int(ds.train_graph.num_nodes) == 3
    assert int(ds.test_graph.num_nodes) == 3
    assert len(ds.valid) == 1 and len(ds.test) == 1


def test_aristo_zip_bare_members(tmp_path, monkeypatch):
    """AristoV4's zip carries extensionless members train/valid/test
    (ref dataset.py:655)."""
    zip_path = tmp_path / "aristo.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("train", _rows(("a", "r0", "b"), ("c", "r1", "a")))
        zf.writestr("valid", _rows(("b", "r0", "c")))
        zf.writestr("test", _rows(("a", "r1", "c")))

    cache = tmp_path / "cache"
    monkeypatch.setattr(catalog, "_download", _serve(str(zip_path)))
    ds = lookup("AristoV4")(path=str(cache))
    assert ds.num_entities == 3 and ds.num_relations == 2
    assert len(ds.train) == 2 and len(ds.valid) == 1 and len(ds.test) == 1


def test_grail_download_flow_urls(tmp_path, monkeypatch):
    """GraIL inductives fetch six per-split files from {dir} and {dir}_ind
    (ref dataset.py:335-370): verify the URL set requested and that the
    downloaded files land on the canonical cache names the fixture tests
    cover."""
    requested = []

    def fake_download(url, dst):
        requested.append(url)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = (_rows(("u1", "r0", "u2"), ("u2", "r1", "u3"))
                if "_ind" in url else
                _rows(("e1", "r0", "e2"), ("e2", "r1", "e3")))
        with open(dst, "w") as f:
            f.write(rows)
        return dst

    monkeypatch.setattr(catalog, "_download", fake_download)
    ds = lookup("FB15k237Inductive")(path=str(tmp_path), version="v2")
    dirs = {u.rsplit("/", 2)[-2] for u in requested}
    files = sorted(u.rsplit("/", 1)[-1] for u in requested)
    assert dirs == {"fb237_v2", "fb237_v2_ind"}
    assert files == ["test.txt"] * 2 + ["train.txt"] * 2 + ["valid.txt"] * 2
    assert int(ds.train_graph.num_nodes) == 3  # e1-e3
    assert int(ds.test_graph.num_nodes) == 3   # u1-u3
    assert ds.num_relations == 2               # shared relation vocab
