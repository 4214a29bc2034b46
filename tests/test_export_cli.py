"""Export CLI tests — the reference's ``yolov3/export.py`` CLI surface
(``--include`` format list, per-format isolation, validation), here
``export_cli.py`` over StableHLO + TF interchange formats.
"""

import os

import numpy as np
import pytest
import yaml

import export_cli

MICRO_SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58],
                [81, 82, 135, 169, 344, 319]],
    "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],
    "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
}


@pytest.fixture()
def spec_yaml(tmp_path):
    p = tmp_path / "micro.yaml"
    p.write_text(yaml.dump(MICRO_SPEC))
    return str(p)


def test_cli_stablehlo_and_variables(spec_yaml, tmp_path, capsys):
    out = str(tmp_path / "exp")
    rc = export_cli.main([
        "--model", "detector", "--spec", spec_yaml, "--imgsz", "64",
        "--include", "stablehlo", "variables", "--validate",
        "--out", out])
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "detector.stablehlo"))
    assert os.path.isfile(os.path.join(out, "detector.vars.pkl"))
    text = capsys.readouterr().out
    assert "export complete" in text
    assert "max|d|=0.00e+00" in text  # stablehlo round-trips bit-exactly


def test_cli_tf_formats(spec_yaml, tmp_path):
    pytest.importorskip("tensorflow")
    out = str(tmp_path / "exp")
    rc = export_cli.main([
        "--model", "detector", "--spec", spec_yaml, "--imgsz", "64",
        "--include", "saved_model", "pb", "tflite", "--validate",
        "--out", out])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "saved_model"))
    assert os.path.getsize(os.path.join(out, "detector.pb")) > 0
    assert os.path.getsize(os.path.join(out, "detector.tflite")) > 0


def test_cli_int8_with_calibration_images(spec_yaml, tmp_path):
    pytest.importorskip("tensorflow")
    # calibration images on disk (reference --int8 --data semantics)
    from PIL import Image

    calib = tmp_path / "calib"
    calib.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(
            (rng.rand(48, 80, 3) * 255).astype(np.uint8)).save(
            calib / f"im{i}.jpg")
    out = str(tmp_path / "exp")
    rc = export_cli.main([
        "--model", "detector", "--spec", spec_yaml, "--imgsz", "64",
        "--include", "tflite-int8", "--calib_images", str(calib),
        "--out", out])
    assert rc == 0
    assert os.path.getsize(os.path.join(out, "detector-int8.tflite")) > 0


def test_cli_adaptive_isp_stablehlo(tmp_path):
    out = str(tmp_path / "exp")
    rc = export_cli.main([
        "--model", "adaptive_isp", "--imgsz", "64", "--steps", "2",
        "--include", "stablehlo", "--validate", "--out", out])
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "adaptive_isp.stablehlo"))


def test_cli_per_format_isolation(spec_yaml, tmp_path, capsys):
    """int8 for a multi-input graph fails, but other formats still export
    (the reference isolates formats the same way, export.py:617-660)."""
    out = str(tmp_path / "exp")
    rc = export_cli.main([
        "--model", "adaptive_isp", "--imgsz", "64", "--steps", "2",
        "--include", "tflite-int8", "variables", "--out", out])
    assert rc == 1  # int8 on 3-input rollout graph is rejected...
    assert os.path.isfile(os.path.join(out, "adaptive_isp.vars.pkl"))  # ...but variables still exported
    text = capsys.readouterr().out
    assert "FAIL" in text and "export had failures" in text
