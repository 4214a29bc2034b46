"""Validator save_txt / save_hybrid / single_cls modes and the study plot.

Reference surfaces: save_one_txt (val.py:50-56), the labels= hybrid NMS
path (val.py:218-219), single-class eval (val.py:245), plot_val_study
(utils/plots.py:226-268).
"""

import os

import numpy as np
import jax
import pytest

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.data.datasets import ISPDataset
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.eval.validator import run_validation
from adaptiveisp_tpu.policy.agent import create_agent_state

MINI_SPEC = {
    "nc": 8,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Bottleneck", [16]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [
        [-1, 1, "Conv", [32, 3, 2]],
        [[4, 5], 1, "Detect", ["nc", "anchors"]],
    ],
}
CFG = Config(replay_memory_size=8)


@pytest.fixture(scope="module")
def toy_val(tmp_path_factory):
    from PIL import Image

    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("valmodes")
    img_dir = root / "images"
    lab_dir = root / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(4):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i}.png")
        (lab_dir / f"{i}.txt").write_text(
            "3 0.5 0.5 0.25 0.25\n1 0.25 0.25 0.2 0.2\n")
    return str(img_dir)


@pytest.fixture(scope="module")
def stack(toy_val):
    ds = ISPDataset(toy_val, img_size=64, source="normalize",
                    train=False, cache_labels=False)
    agent, agent_vars = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=64, batch=1)
    yolo, yolo_vars = create_detector(
        jax.random.PRNGKey(1), spec=MINI_SPEC, imgsz=64)
    return ds, agent, agent_vars, yolo, yolo_vars


def _run(stack, tmp_path, **kw):
    ds, agent, agent_vars, yolo, yolo_vars = stack
    return run_validation(
        CFG, agent, agent_vars, yolo, yolo_vars, dataset=ds, steps=2,
        batch_size=1, max_images=2, yolo_spec=MINI_SPEC,
        save_dir=str(tmp_path / "val"), **kw)


def test_save_txt_and_conf(stack, tmp_path):
    res = _run(stack, tmp_path, save_txt=True, save_conf=True,
               conf_thres=0.1)
    label_dir = tmp_path / "val" / "labels"
    files = sorted(os.listdir(label_dir))
    assert len(files) == 2
    for f in files:
        txt = (label_dir / f).read_text().strip()
        if not txt:
            continue
        for line in txt.splitlines():
            vals = line.split()
            assert len(vals) == 6  # cls xc yc w h conf (save_conf)
            cls = int(vals[0])
            assert 0 <= cls < MINI_SPEC["nc"]
            conf = float(vals[5])
            assert 0.0 <= conf <= 1.0
    assert 0.0 <= res["map50"] <= 1.0


def test_save_hybrid_autolabelling(stack, tmp_path):
    # GT rows ride along as conf-1.0 candidates: even a RANDOM detector
    # "finds" every object, so mAP50 goes to ~1 — the reference's
    # documented hybrid-label inflation (val.py:381-382)
    base = _run(stack, tmp_path, conf_thres=0.001)
    hyb = _run(stack, tmp_path, save_hybrid=True, save_txt=True,
               conf_thres=0.001)
    assert hyb["map50"] > 0.95
    assert hyb["map50"] >= base["map50"]
    assert (tmp_path / "val" / "labels").exists()


def test_single_cls(stack, tmp_path):
    res = _run(stack, tmp_path, single_cls=True, save_txt=True,
               conf_thres=0.1)
    label_dir = tmp_path / "val" / "labels"
    for f in os.listdir(label_dir):
        for line in (label_dir / f).read_text().splitlines():
            assert line.split()[0] == "0"
    assert 0.0 <= res["map50"] <= 1.0


def test_plot_val_study(tmp_path):
    from adaptiveisp_tpu.obs.plots import plot_val_study

    rows = np.array([
        [0.5, 0.4, 0.45, 0.30, 0.0, 5.0, 0.0, 5.0],
        [0.6, 0.5, 0.55, 0.38, 0.0, 9.0, 0.0, 9.0],
        [0.62, 0.52, 0.56, 0.41, 0.0, 14.0, 0.0, 14.0],
    ])
    np.savetxt(tmp_path / "study_lod_agent.txt", rows, fmt="%10.4g")
    out = plot_val_study(str(tmp_path))
    assert os.path.exists(out)


def test_val_cli_flags_parse():
    from val_isp import parse_args

    a = parse_args(["--data", "lod", "--task", "study", "--save_hybrid",
                    "--single_cls", "--study_sizes", "64", "128"])
    assert a.task == "study" and a.study_sizes == [64, 128]
    assert a.save_hybrid and a.single_cls
