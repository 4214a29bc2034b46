"""Workflow utilities: increment_path, strip_optimizer, apply_classifier
(reference utils/general.py:1029-1120 surface)."""

import os
import pickle

import numpy as np

from adaptiveisp_tpu.obs.logging import increment_path


def test_increment_path(tmp_path):
    p = str(tmp_path / "exp")
    assert increment_path(p) == p                       # absent -> as-is
    os.makedirs(p)
    p2 = increment_path(p)
    assert p2 == p + "2"
    os.makedirs(p2)
    assert increment_path(p) == p + "3"
    assert increment_path(p, exist_ok=True) == p        # opt-out
    f = tmp_path / "r.csv"
    f.write_text("x")
    assert increment_path(str(f)) == str(tmp_path / "r2.csv")


def test_strip_optimizer(tmp_path):
    from adaptiveisp_tpu.detect.train_loop import (
        _load_initial_weights, strip_optimizer)

    params = {"l0": {"conv": {"kernel": np.ones((3, 3, 3, 8), np.float32)}}}
    ema = {"l0": {"conv": {"kernel": np.full((3, 3, 3, 8), 2.0,
                                             np.float32)}}}
    payload = {
        "epoch": 7, "best_fitness": 0.5, "fitness": 0.4,
        "model": {"params": params, "batch_stats": {}},
        "ema": ema, "updates": 123,
        "opt_state": {"mu": np.zeros(8)}, "step": 999,
        "spec_anchors": [[10, 13]], "nc": 2,
    }
    path = str(tmp_path / "last.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    out = strip_optimizer(path, str(tmp_path / "deploy.pkl"))
    with open(out, "rb") as f:
        stripped = pickle.load(f)
    assert stripped["epoch"] == -1
    for k in ("opt_state", "ema", "updates", "step"):
        assert k not in stripped
    # params swapped for the EMA
    np.testing.assert_array_equal(
        stripped["model"]["params"]["l0"]["conv"]["kernel"],
        ema["l0"]["conv"]["kernel"])
    # anchors/nc provenance survives; still loadable as --weights init
    assert stripped["spec_anchors"] == [[10, 13]]
    loaded = _load_initial_weights(out, None)
    assert float(np.asarray(
        loaded["params"]["l0"]["conv"]["kernel"]).mean()) == 2.0


def test_apply_classifier_filters_disagreements():
    from adaptiveisp_tpu.classify import apply_classifier

    im = np.zeros((64, 64, 3), np.float32)
    im[8:24, 8:24, 0] = 1.0     # red patch  -> class 0
    im[40:56, 40:56, 2] = 1.0   # blue patch -> class 2
    dets = [np.array([
        [8, 8, 24, 24, 0.9, 0],    # detector says red patch is class 0: keep
        [40, 40, 56, 56, 0.8, 1],  # says blue patch is class 1: drop
    ], np.float32)]

    def classify_fn(crops):
        # logits = per-channel mean -> argmax picks the dominant channel
        return crops.mean(axis=(1, 2))

    out = apply_classifier(dets, [im], classify_fn)
    assert out[0].shape == (1, 6)
    assert int(out[0][0, 5]) == 0
    # empty input stays empty
    out = apply_classifier([np.zeros((0, 6))], [im], classify_fn)
    assert out[0].shape == (0, 6)
