"""Detector-trainer resume (reference smart_resume, torch_utils.py:361-378)
and the resume-all recovery tool (reference utils/aws/resume.py)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from adaptiveisp_tpu.data.detector_dataset import DetectorDataset
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC
from adaptiveisp_tpu.detect.train_detector import DetTrainConfig
from adaptiveisp_tpu.detect.train_loop import (DetectorTrainer,
                                               load_detector_checkpoint)


@pytest.fixture(scope="module")
def shapes_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes_resume")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    from PIL import Image

    n, size = 8, 64
    for i in range(n):
        im = rng.rand(size, size, 3).astype(np.float32) * 0.15
        w, h = rng.randint(20, 40), rng.randint(20, 40)
        x0, y0 = rng.randint(0, size - w), rng.randint(0, size - h)
        im[y0:y0 + h, x0:x0 + w] = (1.0, 0.2, 0.2)
        Image.fromarray((im * 255).astype(np.uint8)).save(
            img_dir / f"im{i:03d}.png")
        (lbl_dir / f"im{i:03d}.txt").write_text(
            f"0 {(x0 + w / 2) / size:.6f} {(y0 + h / 2) / size:.6f} "
            f"{w / size:.6f} {h / size:.6f}\n")
    return str(img_dir)


def _trainer(shapes_dataset, save_dir=None, epochs=4):
    model, variables = create_detector(
        jax.random.PRNGKey(0), spec=YOLOV3_TINY_SPEC, nc=1, imgsz=64)
    spec = dict(YOLOV3_TINY_SPEC, nc=1)
    ds = DetectorDataset(shapes_dataset, img_size=64, batch_size=4,
                         augment=False, seed=0)
    cfg = DetTrainConfig(epochs=epochs, batch_size=4, lr0=0.01,
                         warmup_epochs=0.0, patience=50)
    return DetectorTrainer(model, variables, spec, ds, cfg=cfg,
                           save_dir=save_dir)


def _tree_allclose(a, b, atol=0.0):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), atol=atol)


def test_resume_restores_full_state(shapes_dataset, tmp_path):
    t1 = _trainer(shapes_dataset, save_dir=str(tmp_path))
    t1.fit(epochs=2)
    last = tmp_path / "last.pkl"
    assert last.exists()
    ckpt = load_detector_checkpoint(str(last))
    assert "opt_state" in ckpt and "step" in ckpt  # optimizer is persisted

    t2 = _trainer(shapes_dataset, save_dir=None)
    start = t2.resume(str(last))
    assert start == 2 and t2.start_epoch == 2
    assert t2.best_fitness == pytest.approx(t1.best_fitness)

    # params / EMA / optimizer / step restored exactly
    _tree_allclose(t2.state.params, t1.state.params)
    _tree_allclose(t2.state.ema.params, t1.state.ema.params)
    _tree_allclose(t2.state.opt_state, t1.state.opt_state)
    assert int(t2.state.step) == int(t1.state.step)

    # exact continuation: one identical step from both states matches
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    targets = jnp.zeros((4, 8, 5), jnp.float32).at[:, 0].set(
        jnp.asarray([0, 0.5, 0.5, 0.4, 0.4]))
    tmask = jnp.zeros((4, 8), bool).at[:, 0].set(True)
    s1, o1 = t1.step_fn(t1.state, images, targets, tmask)
    s2, o2 = t2.step_fn(t2.state, images, targets, tmask)
    assert float(o1["loss"]) == pytest.approx(float(o2["loss"]), abs=1e-6)
    _tree_allclose(s2.params, s1.params, atol=1e-6)


def test_resume_weights_only_fallback(shapes_dataset, tmp_path):
    """Old checkpoints without opt_state resume weights-only."""
    t1 = _trainer(shapes_dataset, save_dir=str(tmp_path))
    t1.fit(epochs=1)
    with open(tmp_path / "last.pkl", "rb") as f:
        ckpt = pickle.load(f)
    del ckpt["opt_state"], ckpt["step"]
    legacy = tmp_path / "legacy.pkl"
    with open(legacy, "wb") as f:
        pickle.dump(ckpt, f)

    t2 = _trainer(shapes_dataset)
    assert t2.resume(str(legacy)) == 1
    _tree_allclose(t2.state.params, t1.state.params)
    assert int(t2.state.step) == 0  # optimizer restarted


def test_resume_continues_epoch_numbering(shapes_dataset, tmp_path):
    t1 = _trainer(shapes_dataset, save_dir=str(tmp_path))
    t1.fit(epochs=2)
    t2 = _trainer(shapes_dataset, save_dir=str(tmp_path))
    t2.resume(str(tmp_path / "last.pkl"))
    hist = t2.fit(epochs=4)
    assert [h.epoch for h in hist] == [2, 3]


# --------------------------------------------------------------------- #
# resume_all tool


def _fake_run(root, name, epoch, epochs, data="imgs"):
    d = root / name
    d.mkdir(parents=True)
    with open(d / "last.pkl", "wb") as f:
        pickle.dump({"epoch": epoch, "model": {}, "best_fitness": 0.1}, f)
    with open(d / "opt.yaml", "w") as f:
        yaml.safe_dump({"data": data, "epochs": epochs, "imgsz": 64,
                        "batch_size": 4, "spec": "yolov3-tiny",
                        "save_dir": str(d), "plots": True,
                        "multi_scale": False, "seed": 0, "dp": 0,
                        "cache": "none"}, f)
    return d


def test_resume_all_finds_unfinished_runs(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.resume_all import find_resumable, resume_command

    _fake_run(tmp_path, "run_a", epoch=1, epochs=4)       # resumable
    _fake_run(tmp_path, "run_b", epoch=3, epochs=4)       # finished
    (tmp_path / "run_c").mkdir()                          # no ckpt at all

    found = list(find_resumable(tmp_path))
    assert len(found) == 1
    last, opt = found[0]
    assert "run_a" in str(last)

    cmd = resume_command(last, opt)
    joined = " ".join(cmd)
    assert "--resume" in joined and str(last) in joined
    assert "--data imgs" in joined and "--epochs 4" in joined
    assert "--plots" in joined and "--multi-scale" not in joined


def test_resume_all_dry_run(tmp_path, capsys):
    from tools.resume_all import main

    _fake_run(tmp_path, "run_a", epoch=0, epochs=3)
    cmds = main([str(tmp_path), "--dry-run"])
    assert len(cmds) == 1
    out = capsys.readouterr().out
    assert "--resume" in out
