"""Segmentation trainer CLI (reference segment/train.py + segment/val.py)."""

import numpy as np
import pytest

from adaptiveisp_tpu.detect.segment import train_main


@pytest.fixture(scope="module")
def polygon_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("segcli")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.RandomState(7)
    n, size = 8, 64
    for i in range(n):
        im = rng.rand(size, size, 3).astype(np.float32) * 0.15
        w, h = rng.randint(20, 40), rng.randint(20, 40)
        x0 = rng.randint(2, size - w - 2)
        y0 = rng.randint(2, size - h - 2)
        im[y0:y0 + h, x0:x0 + w] = (0.9, 0.2, 0.2)
        Image.fromarray((im * 255).astype(np.uint8)).save(
            img_dir / f"s{i}.png")
        pts = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                        [x0, y0 + h]], np.float32) / size
        (lbl_dir / f"s{i}.txt").write_text(
            "0 " + " ".join(f"{v:.6f}" for v in pts.reshape(-1)) + "\n")
    return str(img_dir)


def _micro_spec_yaml(tmp_path):
    import yaml

    # proto = first detect level (/16) upsampled 2x -> /8 => mask_ratio 8
    spec = {
        "nc": 1,
        "anchors": [[10, 14, 23, 27, 37, 58],
                    [81, 82, 135, 169, 344, 319]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    p = tmp_path / "micro.yaml"
    p.write_text(yaml.dump(spec))
    return str(p)


def test_mask_ratio_mismatch_raises_clearly(polygon_dataset, tmp_path):
    """A wrong --mask-ratio fails with guidance, not a broadcast error."""
    with pytest.raises(ValueError, match="prototype resolution"):
        train_main([
            "--data", polygon_dataset,
            "--spec", _micro_spec_yaml(tmp_path), "--nm", "4",
            "--npr", "16", "--imgsz", "64", "--batch-size", "4",
            "--epochs", "1", "--mask-ratio", "4",
            "--save-dir", str(tmp_path / "bad"),
        ])


def test_segment_train_cli_end_to_end(polygon_dataset, tmp_path):
    save = tmp_path / "run"
    hist = train_main([
        "--data", polygon_dataset, "--val-data", polygon_dataset,
        "--spec", _micro_spec_yaml(tmp_path), "--nm", "4", "--npr", "16",
        "--imgsz", "64", "--batch-size", "4", "--epochs", "2",
        "--mask-ratio", "8", "--save-dir", str(save), "--hyp", "",
    ])
    assert len(hist) == 2
    assert np.isfinite([h.loss for h in hist]).all()
    assert (save / "best.pkl").exists() and (save / "last.pkl").exists()
    assert (save / "opt.yaml").exists() and (save / "hyp.yaml").exists()

    # resume picks up at epoch 2 with the optimizer restored
    hist2 = train_main([
        "--data", polygon_dataset,
        "--spec", _micro_spec_yaml(tmp_path), "--nm", "4", "--npr", "16",
        "--imgsz", "64", "--batch-size", "4", "--epochs", "3",
        "--mask-ratio", "8", "--save-dir", str(save),
        "--resume", str(save / "last.pkl"),
    ])
    assert [h.epoch for h in hist2] == [2]

    # standalone val (reference segment/val.py surface)
    metrics = train_main([
        "--data", polygon_dataset,
        "--spec", _micro_spec_yaml(tmp_path), "--nm", "4", "--npr", "16",
        "--imgsz", "64", "--batch-size", "4", "--mask-ratio", "8",
        "--validate-only", "--weights", str(save / "best.pkl"),
    ])
    assert set(metrics) >= {"box", "mask", "fitness"}
    assert 0.0 <= metrics["box"]["map50"] <= 1.0
