"""Golden-value tests for the ISP filter library.

Each filter is checked against an independent NumPy implementation of the
published math (SURVEY.md §2.2 documents the exact formulas with reference
file:line).  The NumPy versions here are written from those formulas, not
from library code, and serve as the oracle for the jax ops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.ops import bank, filters as F
from adaptiveisp_tpu.ops.math import rgb2hsv, hsv2rgb

CFG = Config()
RNG = np.random.RandomState(0)


def rand_img(n=2, h=16, w=16):
    return RNG.rand(n, h, w, 3).astype(np.float32)


def np_tanh01(x):
    return np.tanh(x) * 0.5 + 0.5


def np_tanh_range(x, lo, hi, initial=None):
    bias = np.arctanh(2 * (initial - lo) / (hi - lo) - 1) if initial is not None else 0.0
    return np_tanh01(x + bias) * (hi - lo) + lo


def np_lum(img):
    return (0.27 * img[..., 0] + 0.67 * img[..., 1] + 0.06 * img[..., 2])[..., None]


# --------------------------------------------------------------------------- #
# Squash functions
# --------------------------------------------------------------------------- #
def test_squash_exposure():
    feat = RNG.randn(4, 1).astype(np.float32)
    got = np.asarray(F.squash_exposure(CFG, jnp.asarray(feat)))
    want = np_tanh_range(feat, -3.5, 3.5, initial=0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert np.all(np.abs(got) <= 3.5)


def test_squash_gamma():
    feat = RNG.randn(4, 1).astype(np.float32)
    got = np.asarray(F.squash_gamma(CFG, jnp.asarray(feat)))
    want = np.exp(np_tanh_range(feat, -np.log(3.0), np.log(3.0)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert np.all(got >= 1 / 3.0) and np.all(got <= 3.0)


def test_squash_improved_wb():
    feat = RNG.randn(4, 3).astype(np.float32)
    got = np.asarray(F.squash_improved_wb(CFG, jnp.asarray(feat)))
    masked = feat * np.array([[0.0, 1.0, 1.0]], np.float32)
    scale = np.exp(np_tanh_range(masked, -0.5, 0.5))
    lum = 1e-5 + 0.27 * scale[:, 0] + 0.67 * scale[:, 1] + 0.06 * scale[:, 2]
    want = scale / lum[:, None]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # R channel raw feature is pinned to zero -> tanh_range(-0.5,0.5)(0) = 0,
    # so the pre-normalisation red scale is exp(0) = 1
    assert np.allclose(scale[:, 0], 1.0, rtol=2e-4, atol=1e-6)


def test_squash_ccm_range():
    feat = RNG.randn(4, 9).astype(np.float32)
    got = np.asarray(F.squash_ccm(CFG, jnp.asarray(feat)))
    want = np_tanh_range(feat, -2.0, 2.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


# --------------------------------------------------------------------------- #
# Apply functions
# --------------------------------------------------------------------------- #
def test_apply_exposure():
    img = rand_img()
    p = np.array([[0.5], [-1.0]], np.float32)
    got = np.asarray(F.apply_exposure(CFG, jnp.asarray(img), jnp.asarray(p)))
    want = img * np.exp(p[:, None, None, :] * np.log(2.0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_apply_gamma():
    img = rand_img()
    p = np.array([[0.4], [2.0]], np.float32)
    got = np.asarray(F.apply_gamma(CFG, jnp.asarray(img), jnp.asarray(p)))
    want = np.clip(img, 0.001, None) ** p[:, None, None, :]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_apply_ccm_row_normalised():
    img = rand_img()
    raw = RNG.randn(2, 9).astype(np.float32)
    p = np_tanh_range(raw, -2.0, 2.0)
    got = np.asarray(F.apply_ccm(CFG, jnp.asarray(img), jnp.asarray(p)))
    ccm = p.reshape(2, 3, 3)
    ccm = ccm / ccm.sum(-1, keepdims=True)
    want = np.einsum("nhwc,nkc->nhwk", img, ccm)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # Identity CCM is a no-op
    eye = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (2, 1))
    out = np.asarray(F.apply_ccm(CFG, jnp.asarray(img), jnp.asarray(eye)))
    np.testing.assert_allclose(out, img, rtol=2e-4, atol=1e-6)


def test_apply_tone():
    img = rand_img()
    p = (0.5 + 1.5 * RNG.rand(2, 8)).astype(np.float32)
    got = np.asarray(F.apply_tone(CFG, jnp.asarray(img), jnp.asarray(p)))
    total = np.zeros_like(img)
    for i in range(8):
        total += np.clip(img - i / 8.0, 0, 1 / 8.0) * p[:, i][:, None, None, None]
    want = total * (8.0 / (p.sum(1) + 1e-30))[:, None, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_apply_color_curve():
    img = rand_img()
    p = (0.9 + 0.2 * RNG.rand(2, 8, 3)).astype(np.float32)
    got = np.asarray(F.apply_color(CFG, jnp.asarray(img), jnp.asarray(p)))
    total = np.zeros_like(img)
    for i in range(8):
        total += np.clip(img - i / 8.0, 0, 1 / 8.0) * p[:, i][:, None, None, :]
    want = total * (8.0 / (p.sum(1) + 1e-30))[:, None, None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_apply_contrast():
    img = rand_img()
    p = np.array([[0.7], [-0.3]], np.float32)
    got = np.asarray(F.apply_contrast(CFG, jnp.asarray(img), jnp.asarray(p)))
    lum = np.clip(np_lum(img), 0.0, 1.0)
    clum = -np.cos(np.pi * lum) * 0.5 + 0.5
    cimg = img / (lum + 1e-6) * clum
    pp = p[:, None, None, :]
    want = (1 - pp) * img + pp * cimg
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_apply_wnb():
    img = rand_img()
    p = np.array([[0.25], [1.0]], np.float32)
    got = np.asarray(F.apply_wnb(CFG, jnp.asarray(img), jnp.asarray(p)))
    lum = np_lum(img)
    pp = p[:, None, None, :]
    want = (1 - pp) * img + pp * lum
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # full strength -> grayscale
    full = np.asarray(F.apply_wnb(CFG, jnp.asarray(img), jnp.ones((2, 1), np.float32)))
    assert np.allclose(full[..., 0], full[..., 1], atol=1e-6)


def test_apply_improved_wb():
    img = rand_img()
    p = (0.8 + 0.4 * RNG.rand(2, 3)).astype(np.float32)
    got = np.asarray(F.apply_improved_wb(CFG, jnp.asarray(img), jnp.asarray(p)))
    np.testing.assert_allclose(got, img * p[:, None, None, :], rtol=2e-4, atol=1e-6)


# --------------------------------------------------------------------------- #
# HSV round-trip + saturation filter
# --------------------------------------------------------------------------- #
def test_hsv_roundtrip():
    img = rand_img(4, 8, 8)
    back = np.asarray(hsv2rgb(rgb2hsv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, rtol=1e-3, atol=2e-3)


def test_hsv_known_values():
    # Pure red, green, blue, gray
    img = np.array([[[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [0.5, 0.5, 0.5]]]],
                   np.float32)
    hsv = np.asarray(rgb2hsv(jnp.asarray(img)))
    np.testing.assert_allclose(hsv[0, 0, 0], [0.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[0, 0, 1], [2 / 6, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[0, 1, 0], [4 / 6, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[0, 1, 1], [0.0, 0.0, 0.5], atol=1e-6)


def test_apply_saturation_plus_zero_is_identity():
    img = rand_img()
    p = np.zeros((2, 1), np.float32)
    got = np.asarray(F.apply_saturation_plus(CFG, jnp.asarray(img), jnp.asarray(p)))
    np.testing.assert_allclose(got, np.clip(img, 0, 1), atol=1e-6)


def test_apply_saturation_plus_boosts_saturation():
    img = rand_img(1, 8, 8) * 0.5 + 0.25
    p = np.ones((1, 1), np.float32)
    out = np.asarray(F.apply_saturation_plus(CFG, jnp.asarray(img), jnp.asarray(p)))
    sat_in = np.asarray(rgb2hsv(jnp.asarray(img)))[..., 1]
    sat_out = np.asarray(rgb2hsv(jnp.asarray(out)))[..., 1]
    assert sat_out.mean() >= sat_in.mean() - 1e-4


# --------------------------------------------------------------------------- #
# Bank: registry, blend/switch equivalence, fixed pipeline
# --------------------------------------------------------------------------- #
def test_registry_matches_config_roster():
    specs = bank.filter_specs(CFG)
    assert [s.short_name for s in specs] == [
        "E", "G", "CCM", "Shr", "NLM", "T", "Ct", "S+", "BW", "W"]
    assert bank.param_counts(CFG) == (1, 1, 9, 1, 1, 8, 1, 1, 1, 3)


def test_blend_equals_switch():
    img = jnp.asarray(rand_img(1, 16, 16))
    params = [jnp.asarray(RNG.randn(1, s.n_params).astype(np.float32))
              for s in bank.filter_specs(CFG)]
    squashed = [s.squash(CFG, p) for s, p in zip(bank.filter_specs(CFG), params)]
    for k in [0, 2, 6, 9]:
        onehot = jnp.zeros((1, 10)).at[0, k].set(1.0)
        blended = bank.render_blend(CFG, img, squashed, onehot)
        switched = bank.render_switch(CFG, img, squashed, jnp.asarray(k))
        np.testing.assert_allclose(
            np.asarray(blended), np.asarray(switched), atol=1e-6)


def test_candidates_shape_and_range():
    img = jnp.asarray(rand_img(2, 16, 16) * 2.0)  # deliberately out of range
    specs = bank.filter_specs(CFG)
    squashed = [s.squash(CFG, jnp.asarray(RNG.randn(2, s.n_params).astype(np.float32)))
                for s in specs]
    cands = np.asarray(bank.render_candidates(CFG, img, squashed))
    assert cands.shape == (2, 10, 16, 16, 3)
    assert cands.min() >= 0.0 and cands.max() <= 1.0  # forward clips


def test_fixed_pipeline_runs():
    img = jnp.asarray(rand_img(1, 16, 16))
    stages = [
        ("exposure", jnp.asarray([[0.09012079]], jnp.float32)),
        ("improved_wb", jnp.asarray([[2.4052505, 1.2233436, 1.8800205]], jnp.float32)),
        ("gamma", jnp.asarray([[0.38566995]], jnp.float32)),
    ]
    out = bank.render_pipeline(CFG, img, stages)
    assert out.shape == img.shape
    # exposure with p=0.09 brightens ~2**0.09
    exp_only = np.asarray(bank.render_fixed(CFG, img, "exposure", stages[0][1]))
    np.testing.assert_allclose(
        exp_only, np.asarray(img) * 2 ** 0.09012079, rtol=2e-4, atol=1e-6)


def test_adaptive_avg_pool_torch_parity_any_size():
    """Non-divisible sizes use the exact torch bin arithmetic
    (reference Value uses nn.AdaptiveAvgPool2d on ANY input size)."""
    import torch

    from adaptiveisp_tpu.ops.math import adaptive_avg_pool

    rng = np.random.RandomState(5)
    for h, w in [(128, 128), (416, 416), (100, 130), (65, 64)]:
        x = rng.rand(2, h, w, 3).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), 64))
        ref = torch.nn.AdaptiveAvgPool2d((64, 64))(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_curve_filter_params_follow_curve_steps():
    """tone/color n_params derive from cfg.curve_steps (reference
    ToneFilter/ColorFilter); a custom value must not corrupt batches."""
    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.ops import bank

    cfg16 = Config(curve_steps=16)
    assert bank.get_spec(cfg16, "tone").n_params == 16
    assert bank.get_spec(cfg16, "color").n_params == 48
    # a squash at the resolved width keeps the batch dimension intact
    feats = jnp.zeros((4, 16))
    p = bank.get_spec(cfg16, "tone").squash(cfg16, feats)
    assert p.shape[0] == 4


def test_get_mask_none_params_renders_unmasked():
    """Fixed-parameter rendering never crashes under cfg.masking=True
    (the reference's Filter.run path is always unmasked)."""
    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.ops import bank
    from adaptiveisp_tpu.ops.masks import get_mask

    cfg = Config(masking=True)
    img = jnp.full((1, 8, 8, 3), 0.25)
    m = get_mask(cfg, img, None)
    np.testing.assert_allclose(np.asarray(m), 1.0)
    out = bank.render_fixed(cfg, img, "exposure",
                            jnp.asarray([[1.0]], jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_tone_v2_registry_row():
    """ToneFilterV2 (reference filters.py:365-402): identical curve math to
    ToneFilter — the reference delta is only ``process`` expanding a flat
    [N, steps] param itself.  The registry row must resolve and agree with
    tone exactly, and its n_params must follow cfg.curve_steps."""
    img = rand_img()
    feat = RNG.randn(2, 8).astype(np.float32)
    spec = bank.get_spec(CFG, "tone_v2")
    assert spec.n_params == 8
    p = spec.squash(CFG, jnp.asarray(feat))
    got = np.asarray(spec.apply(CFG, jnp.asarray(img), p))
    want = np.asarray(F.apply_tone(CFG, jnp.asarray(img),
                                   F.squash_tone(CFG, jnp.asarray(feat))))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    cfg16 = CFG.replace(curve_steps=16)
    assert bank.get_spec(cfg16, "tone_v2").n_params == 16

    # a config naming tone_v2 renders end to end through the blend path
    cfg = CFG.replace(filters=("exposure", "tone_v2"))
    pl = [jnp.asarray(RNG.randn(2, n).astype(np.float32))
          for n in bank.param_counts(cfg)]
    pl = [s.squash(cfg, p) for s, p in zip(bank.filter_specs(cfg), pl)]
    onehot = jnp.asarray(np.eye(2, dtype=np.float32))
    out = bank.render_blend(cfg, jnp.asarray(img), pl, onehot)
    assert out.shape == img.shape and np.isfinite(np.asarray(out)).all()
