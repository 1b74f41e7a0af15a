"""Real-dataset loader round-trips on checked-in raw fixtures.

VERDICT r1 item 7: `_parse_planetoid` / `_parse_webkb`
(bench/datasets.py) were never exercised; these fixtures follow the exact
raw on-disk formats (see tests/data/make_fixtures.py) so the loaders run
their real logic, and the synthetic stand-in must trigger ONLY when raw
files are truly absent.  Point production runs at real data with
``--set benchmark.dataset_root=/path/to/datasets`` (a directory holding
<Name>/raw/... in the standard layouts).
"""

import os

import numpy as np
import pytest

from protgram_directgcn_tpu.bench.datasets import (
    _parse_planetoid,
    _parse_webkb,
    load_dataset,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _truth(name):
    with np.load(os.path.join(DATA, f"{name}_truth.npz")) as z:
        return {k: z[k] for k in z.files}


def test_parse_planetoid_roundtrip_cora_format():
    t = _truth("Cora")
    ds = _parse_planetoid(DATA, "Cora")
    assert ds is not None and not ds.synthetic
    np.testing.assert_allclose(ds.x, t["x"])  # test rows unshuffled correctly
    np.testing.assert_array_equal(ds.y, t["y"])
    got_edges = np.unique(ds.edge_index.T, axis=0)
    np.testing.assert_array_equal(got_edges, t["edges"])
    n_train = int(t["n_train"])
    assert ds.train_mask[:n_train].all() and not ds.train_mask[n_train:].any()
    test_mask = np.zeros(len(t["y"]), bool)
    test_mask[t["test_index"]] = True
    np.testing.assert_array_equal(ds.test_mask, test_mask)


def test_parse_planetoid_citeseer_isolated_test_nodes():
    """The CiteSeer branch extends tx over the gap: the isolated node gets
    zero features and its own row is not mixed into neighbours."""
    t = _truth("CiteSeer")
    ds = _parse_planetoid(DATA, "CiteSeer")
    assert ds is not None
    np.testing.assert_allclose(ds.x, t["x"])
    assert (ds.x[9] == 0).all()  # isolated node inside the test range
    np.testing.assert_array_equal(ds.y, t["y"])


def test_parse_webkb_roundtrip():
    t = _truth("Cornell")
    ds = _parse_webkb(DATA, "Cornell")
    assert ds is not None and not ds.synthetic
    np.testing.assert_allclose(ds.x, t["x"])
    np.testing.assert_array_equal(ds.y, t["y"])
    np.testing.assert_array_equal(np.unique(ds.edge_index.T, axis=0), t["edges"])


def test_load_dataset_prefers_real_files_over_synthetic():
    ds = load_dataset("Cora", root=DATA)
    assert not ds.synthetic
    assert ds.x.shape == (12, 6)


def test_load_dataset_falls_back_only_when_absent(tmp_path):
    ds = load_dataset("Cora", root=tmp_path)  # empty root: no raw files
    assert ds.synthetic
    ds2 = load_dataset("PubMed", root=tmp_path)
    assert ds2.synthetic


def test_parse_planetoid_pubmed_float_features():
    """PubMed branch: non-binary (TF-IDF-like) features round-trip exactly,
    contiguous sorted test range."""
    t = _truth("PubMed")
    ds = _parse_planetoid(DATA, "PubMed")
    assert ds is not None and not ds.synthetic
    np.testing.assert_allclose(ds.x, t["x"])
    assert not np.isin(ds.x[ds.x != 0], (0.0, 1.0)).all()  # really non-binary
    np.testing.assert_array_equal(ds.y, t["y"])
    np.testing.assert_array_equal(np.unique(ds.edge_index.T, axis=0), t["edges"])


@pytest.mark.parametrize("name", ["Texas", "Wisconsin"])
def test_parse_webkb_texas_wisconsin(name):
    """Remaining WebKB datasets; the Texas fixture carries a duplicate edge
    row the parser must dedupe."""
    t = _truth(name)
    ds = _parse_webkb(DATA, name)
    assert ds is not None and not ds.synthetic
    np.testing.assert_allclose(ds.x, t["x"])
    np.testing.assert_array_equal(ds.y, t["y"])
    np.testing.assert_array_equal(np.unique(ds.edge_index.T, axis=0), t["edges"])
    assert ds.edge_index.shape[1] == len(t["edges"])  # dupes collapsed


def test_fixtures_regenerate_deterministically(tmp_path):
    """The checked-in fixtures match their generator (provenance check)."""
    import subprocess
    import sys

    env = dict(os.environ)
    script = os.path.join(DATA, "make_fixtures.py")
    # Regenerate into a copy of the script placed in tmp_path.
    gen = tmp_path / "make_fixtures.py"
    gen.write_text(open(script).read())
    subprocess.run([sys.executable, str(gen)], check=True, env=env)
    with np.load(tmp_path / "Cora_truth.npz") as z_new, np.load(
        os.path.join(DATA, "Cora_truth.npz")
    ) as z_old:
        np.testing.assert_allclose(z_new["x"], z_old["x"])
        np.testing.assert_array_equal(z_new["edges"], z_old["edges"])


def test_fetch_datasets_validation_offline(tmp_path, monkeypatch, capsys):
    """tools/fetch_datasets validates already-present raws without egress:
    parse via the production loaders, shape table, recorded checksums, and
    checksum-mismatch detection on re-run."""
    import json
    import shutil

    from tools import fetch_datasets as fd

    root = tmp_path / "root"
    import pathlib
    fixtures = pathlib.Path(DATA)
    shutil.copytree(fixtures / "Cora", root / "Cora")
    truth = np.load(fixtures / "Cora_truth.npz", allow_pickle=True)
    n, f = truth["x"].shape
    c = int(truth["y"].max()) + 1
    monkeypatch.setitem(fd.EXPECTED_SHAPES, "Cora", (n, f, c))

    assert fd.fetch(str(root), ["Cora"], None) == 0
    checks = json.loads((root / "checksums.json").read_text())
    assert any(k.endswith("ind.cora.x") for k in checks)

    # Tamper with a raw file: the recorded checksums catch it on re-run.
    target = root / "Cora" / "raw" / "ind.cora.test.index"
    target.write_bytes(target.read_bytes() + b"\n9")
    assert fd.fetch(str(root), ["Cora"], None) >= 1
