"""tools/eval_metrics.py — the offline FID/IS/LPIPS CLI (the command-line
surface over evalkit; the reference ships these as import-only libraries,
libs/fid.py / libs/inception_score.py / libs/lpips/).

Runs with random network weights (--allow-random-weights): the numeric
ORACLES for the underlying implementations live in test_evalkit_oracle.py;
here we check the CLI plumbing end-to-end plus the metric identities that
hold for ANY weights (FID(X, X) == 0, LPIPS(x, x) == 0, IS >= 1).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.eval_metrics import main  # noqa: E402


@pytest.fixture(scope="module")
def image_sets(tmp_path_factory):
    root = tmp_path_factory.mktemp("sets")
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    b = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    pa, pb = str(root / "a.npy"), str(root / "b.npy")
    np.save(pa, a)
    np.save(pb, b)
    # a folder variant of set a (exercises the folder loader)
    from PIL import Image

    folder = root / "a_folder"
    folder.mkdir()
    for i in range(8):
        Image.fromarray(a[i]).save(str(folder / f"{i:03d}.png"))
    return pa, pb, str(folder), a


def test_fid_cli_self_is_zero(image_sets, capsys):
    pa, _, folder, _ = image_sets
    out = main(["fid", pa, folder, "--batch", "4",
                "--allow-random-weights"])
    # identical sets (npy vs the PNG folder of the same images):
    # identical stats -> FID 0 for any weights
    assert out["value"] == pytest.approx(0.0, abs=1e-2)
    assert out["n_a"] == out["n_b"] == 8
    assert not out["real_weights"]
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "fid" and "WARNING" in parsed


def test_fid_cli_distinct_sets_positive(image_sets):
    pa, pb, _, _ = image_sets
    out = main(["fid", pa, pb, "--batch", "4", "--allow-random-weights"])
    assert out["value"] > 0.0


def test_is_cli(image_sets):
    pa, _, _, _ = image_sets
    out = main(["is", pa, "--batch", "4", "--splits", "2",
                "--allow-random-weights"])
    assert out["metric"] == "inception_score"
    assert out["value"] >= 1.0 - 1e-5  # IS >= 1 by Jensen for any weights
    assert np.isfinite(out["std"])


def test_lpips_cli_self_is_zero(image_sets):
    pa, pb, _, _ = image_sets
    out = main(["lpips", pa, pa, "--batch", "4",
                "--allow-random-weights"])
    assert out["value"] == pytest.approx(0.0, abs=1e-6)
    out2 = main(["lpips", pa, pb, "--batch", "4",
                 "--allow-random-weights"])
    assert out2["value"] > 0.0


def test_stats_precompute_roundtrip(image_sets, tmp_path, monkeypatch):
    """`stats` saves {mu, sigma, n}; `fid` accepts the .pkl in place of a
    set (reference calc_inception.py __main__ + the .fid-cache reuse in
    libs/fid.py:217-244).  PRNGKey(0) random weights are deterministic
    across invocations, so stats(a) vs images(a) must still give FID 0."""
    pa, pb, folder, _ = image_sets
    pkl = str(tmp_path / "a_stats.pkl")
    out = main(["stats", pa, "--batch", "4", "--out", pkl,
                "--allow-random-weights"])
    assert out["n"] == 8 and os.path.isfile(pkl)
    out2 = main(["fid", pkl, folder, "--batch", "4",
                 "--allow-random-weights"])
    assert out2["value"] == pytest.approx(0.0, abs=1e-2)
    assert out2["n_a"] == 8
    # two precomputed sides never build the network -> no weights needed
    monkeypatch.delenv("SPGAN_TPU_INCEPTION", raising=False)
    out3 = main(["fid", pkl, pkl])
    assert out3["value"] == pytest.approx(0.0, abs=1e-6)
    assert out3["real_weights"]  # nothing random was involved


def test_missing_weights_is_loud(image_sets, monkeypatch):
    pa, pb, _, _ = image_sets
    monkeypatch.delenv("SPGAN_TPU_INCEPTION", raising=False)
    with pytest.raises(SystemExit, match="inception"):
        main(["fid", pa, pb])
    with pytest.raises(SystemExit, match="LPIPS"):
        main(["lpips", pa, pb])
