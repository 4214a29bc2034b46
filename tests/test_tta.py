"""Test-time augmentation (TTA) inference.

Oracles: torch F.interpolate/F.pad for scale_img, an independent NumPy
transcription of the published de-scale/clip formulas
(/root/reference/yolov3/models/yolo.py:225-252), and a structural
composition check that the full-scale pass of forward_augment equals the
plain decoded forward minus its clipped tail.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from adaptiveisp_tpu.detect.model import create_detector, decode_predictions
from adaptiveisp_tpu.detect.tta import (clip_augmented, descale_pred,
                                        forward_augment, scale_img)

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


def test_scale_img_torch_parity():
    rng = np.random.RandomState(0)
    for h, w, r, gs in [(64, 64, 0.83, 32), (96, 128, 0.67, 32),
                        (64, 96, 0.5, 16)]:
        x = rng.rand(2, h, w, 3).astype(np.float32)
        ours = np.asarray(scale_img(jnp.asarray(x), r, gs=gs))
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        s = (int(h * r), int(w * r))
        ti = F.interpolate(t, size=s, mode="bilinear", align_corners=False)
        ph, pw = (math.ceil(v * r / gs) * gs for v in (h, w))
        ti = F.pad(ti, [0, pw - s[1], 0, ph - s[0]], value=0.447)
        ref = ti.numpy().transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_scale_img_identity():
    x = jnp.ones((1, 32, 32, 3))
    assert scale_img(x, 1.0) is x


def test_descale_pred_formula():
    rng = np.random.RandomState(1)
    p = rng.rand(2, 17, 13).astype(np.float32) * 100
    h, w = 96, 128
    for flip, scale in [(None, 0.83), ("lr", 0.67), ("ud", 0.5)]:
        out = np.asarray(descale_pred(jnp.asarray(p), flip, scale, (h, w)))
        exp = p.copy()
        exp[..., :4] = p[..., :4] / scale
        if flip == "lr":
            exp[..., 0] = w - exp[..., 0]
        elif flip == "ud":
            exp[..., 1] = h - exp[..., 1]
        np.testing.assert_allclose(out, exp, rtol=1e-5)


@pytest.mark.parametrize("nl", [2, 3])
def test_clip_augmented_rows(nl):
    # synthetic per-scale tensors whose rows encode their own index
    g = sum(4 ** k for k in range(nl))
    us = [8, 6, 4]  # grid units per scale
    ys = [jnp.arange(u * g, dtype=jnp.float32)[None, :, None] for u in us]
    out = clip_augmented(ys, nl=nl)
    # full-scale pass drops its LAST u rows
    assert out[0].shape[1] == us[0] * g - us[0]
    np.testing.assert_array_equal(np.asarray(out[0][0, :, 0]),
                                  np.arange(us[0] * g - us[0]))
    # smallest-scale pass drops its FIRST u * 4**(nl-1) rows
    drop = us[-1] * 4 ** (nl - 1)
    assert out[-1].shape[1] == us[-1] * g - drop
    np.testing.assert_array_equal(np.asarray(out[-1][0, :, 0]),
                                  np.arange(drop, us[-1] * g))
    # middle scales untouched
    if nl == 3:
        assert out[1].shape[1] == us[1] * g


def test_forward_augment_scale1_slice():
    model, variables = create_detector(
        jax.random.PRNGKey(0), spec=MINI_SPEC, imgsz=64)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)

    def fwd_fn(xi):
        return model.apply(variables, xi, train=False)

    out = jax.jit(lambda im: forward_augment(fwd_fn, im, MINI_SPEC))(x)
    plain = decode_predictions(fwd_fn(x), MINI_SPEC)
    g = sum(4 ** k for k in range(len(MINI_SPEC["anchors"])))
    u = plain.shape[1] // g
    keep = plain.shape[1] - u
    np.testing.assert_allclose(np.asarray(out[:, :keep]),
                               np.asarray(plain[:, :keep]),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(out)).all()
    # three scales contributed: more candidates than a single pass
    assert out.shape[1] > plain.shape[1]
    assert out.shape[2] == plain.shape[2]


def test_validator_augment_smoke(tmp_path):
    from PIL import Image

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.data.datasets import ISPDataset
    from adaptiveisp_tpu.eval.validator import run_validation
    from adaptiveisp_tpu.policy.agent import create_agent_state

    rng = np.random.RandomState(3)
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i}.png")
        (lab_dir / f"{i}.txt").write_text("3 0.5 0.5 0.25 0.25\n")

    cfg = Config(replay_memory_size=8)
    ds = ISPDataset(str(img_dir), img_size=64, source="normalize",
                    train=False, cache_labels=False)
    agent, agent_vars = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=64, batch=1)
    yolo, yolo_vars = create_detector(
        jax.random.PRNGKey(1), spec=MINI_SPEC, imgsz=64)
    res = run_validation(
        cfg, agent, agent_vars, yolo, yolo_vars, dataset=ds, steps=2,
        batch_size=1, max_images=2, yolo_spec=MINI_SPEC, augment=True)
    assert "map50" in res and 0.0 <= res["map50"] <= 1.0
