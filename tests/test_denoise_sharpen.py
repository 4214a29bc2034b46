"""Golden tests for NLM denoise and sharpen kernels vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from adaptiveisp_tpu.ops import denoise as D
from adaptiveisp_tpu.ops import sharpen as S

RNG = np.random.RandomState(1)


# --------------------------------------------------------------------------- #
# NumPy oracle: circular-shift NLM (formulas per SURVEY.md §2.2 / denoise.py)
# --------------------------------------------------------------------------- #
def np_box_sum(x, win):
    r = win // 2
    out = np.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out += np.roll(x, (dy, dx), axis=(1, 2))
    return out


def np_nlm_gray(rgb, h, search=11, patch=5):
    r = search // 2
    img = np.clip(rgb, 0, 1)
    y = (0.299 * img[..., :1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:])
    hh = np.maximum(h, 0.0)[:, None, None, :] + 1e-8
    weights = np.zeros_like(y)
    out = np.zeros_like(rgb)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            srgb = np.roll(rgb, (dy, dx), axis=(1, 2))
            sy = np.roll(y, (dy, dx), axis=(1, 2))
            dist = np.sqrt(np.maximum(np_box_sum((y - sy) ** 2, patch), 0.0))
            w = np.exp(-dist / hh)
            out += srgb * w
            weights += w
    return np.clip(out / weights, 0.0, 1.0)


def test_box_sum_matches_numpy():
    x = RNG.rand(1, 12, 12, 1).astype(np.float32)
    got = np.asarray(D.box_sum(jnp.asarray(x), 5))
    np.testing.assert_allclose(got, np_box_sum(x, 5), rtol=1e-5, atol=1e-6)


def test_nlm_gray_matches_numpy():
    rgb = RNG.rand(2, 16, 16, 3).astype(np.float32)
    h = np.array([[0.5], [0.05]], np.float32)
    got = np.asarray(D.nlm_gray(jnp.asarray(rgb), jnp.asarray(h)))
    want = np_nlm_gray(rgb, h)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nlm_zero_strength_near_identity():
    # h -> 0 gives weight 1 only where distance == 0 (the identity shift and
    # any exact duplicates); on generic noise the output ~= input.
    rgb = RNG.rand(1, 16, 16, 3).astype(np.float32)
    h = np.zeros((1, 1), np.float32)
    got = np.asarray(D.nlm_gray(jnp.asarray(rgb), jnp.asarray(h)))
    np.testing.assert_allclose(got, np.clip(rgb, 0, 1), atol=1e-4)


def test_nlm_denoises():
    clean = np.ones((1, 32, 32, 3), np.float32) * 0.5
    noisy = np.clip(clean + RNG.randn(1, 32, 32, 3).astype(np.float32) * 0.1, 0, 1)
    out = np.asarray(D.nlm_gray(jnp.asarray(noisy), jnp.asarray([[1.0]], np.float32)))
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.5


# --------------------------------------------------------------------------- #
# Sharpen oracles
# --------------------------------------------------------------------------- #
def np_blur_keep_border(img):
    k = np.ones((3, 3), np.float32)
    k[1, 1] = 5.0
    k /= k.sum()
    n, h, w, c = img.shape
    out = img.copy()
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            patch = img[:, y - 1:y + 2, x - 1:x + 2, :]
            out[:, y, x, :] = np.einsum("nijc,ij->nc", patch, k)
    return out


def test_adjust_sharpness_matches_numpy():
    img = RNG.rand(2, 10, 10, 3).astype(np.float32)
    factor = np.array([0.5, 4.0], np.float32)[:, None, None, None]
    got = np.asarray(S.adjust_sharpness(jnp.asarray(img), jnp.asarray(factor)))
    blurred = np_blur_keep_border(img)
    want = np.clip(img * factor + blurred * (1 - factor), 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharpness_matches_numpy():
    img = RNG.rand(1, 10, 10, 3).astype(np.float32)
    factor = np.array([2.0], np.float32)[:, None, None, None]
    got = np.asarray(S.sharpness(jnp.asarray(img), jnp.asarray(factor)))
    blurred = np_blur_keep_border(img)
    want = np.clip(img + (img - blurred) * factor, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharpen_factor1_identity():
    img = RNG.rand(1, 8, 8, 3).astype(np.float32)
    got = np.asarray(S.adjust_sharpness(jnp.asarray(img), jnp.asarray(1.0)))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_gaussian_kernel_normalised():
    k = np.asarray(S.gaussian_kernel1d(5, jnp.asarray(1.3)))
    assert abs(k.sum() - 1.0) < 1e-6
    # matches exp(-0.5 x^2/s^2) on linspace(-2, 2, 5)
    x = np.linspace(-2, 2, 5)
    want = np.exp(-0.5 * (x / 1.3) ** 2)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-5)


def test_unsharp_mask_per_sample_params():
    img = RNG.rand(2, 12, 12, 3).astype(np.float32)
    sigma = np.array([1.0, 1.0], np.float32)
    amount = np.array([0.0, 2.0], np.float32)
    out = np.asarray(S.unsharp_mask(jnp.asarray(img), jnp.asarray(sigma),
                                    jnp.asarray(amount)))
    # amount 0 -> identity
    np.testing.assert_allclose(out[0], img[0], atol=1e-6)
    # amount 2 -> changed
    assert np.abs(out[1] - img[1]).max() > 1e-3


def test_nlm_image_gradient_finite():
    """The center offset's identically-zero patch distance must not NaN the
    image gradient (torch's relu backward selects 0; jax's
    sqrt(maximum(x,0)) chain propagated inf*0=NaN before the double-where
    guard).  Matters for any pipeline differentiated through chained
    filter applications (e.g. fixed-pipeline optimization with denoise)."""
    import jax

    from adaptiveisp_tpu.ops.denoise import nlm_gray, nlm_rgb

    rgb = jnp.asarray(RNG.rand(1, 16, 16, 3).astype(np.float32))
    h = jnp.asarray(np.array([[0.4]], np.float32))
    for fn in (nlm_gray, nlm_rgb):
        g_img, g_h = jax.grad(
            lambda r, hh: fn(r, hh).mean(), argnums=(0, 1))(rgb, h)
        assert np.isfinite(np.asarray(g_img)).all(), fn.__name__
        assert np.isfinite(np.asarray(g_h)).all(), fn.__name__
        assert np.abs(np.asarray(g_img)).max() > 0, fn.__name__


def test_depthwise_conv3x3_matches_lax_conv():
    """The slice-sum rewrite must equal the lax depthwise conv it replaced
    (the conv lowering was 48x slower on TPU; same dot either way)."""
    import jax

    from adaptiveisp_tpu.ops.math import depthwise_conv3x3

    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(2, 17, 23, 3).astype(np.float32))
    kernel = jnp.asarray(rng.rand(3, 3).astype(np.float32))
    for padding in ("VALID", "SAME"):
        got = depthwise_conv3x3(img, kernel, padding=padding)
        k = jnp.broadcast_to(kernel[:, :, None, None], (3, 3, 1, 3))
        ref = jax.lax.conv_general_dilated(
            img, k, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3,
            precision=jax.lax.Precision.HIGHEST)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


# --------------------------------------------------------------------------- #
# NonLocalMeansParam (reference denoise.py:122-181): unfold NLM, learnable h
# --------------------------------------------------------------------------- #
def np_nlm_param(rgb, h, ws):
    """NumPy oracle of the unfold variant: REFLECT boundary, distance
    aggregation over the full search window (the reference's second unfold
    reuses search_window_size, denoise.py:152), scalar h."""
    pad = (ws - 1) // 2
    n, hh_, ww_, _ = rgb.shape
    img = np.clip(rgb, 0, 1)
    y = (0.299 * img[..., :1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:])
    sp = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    y_pad = np.pad(y, sp, mode="reflect")
    rgb_pad = np.pad(rgb, sp, mode="reflect")
    hh = max(float(h), 0.0) + 1e-8
    num = np.zeros_like(rgb)
    den = np.zeros((n, hh_, ww_, 1), rgb.dtype)
    for dy in range(ws):
        for dx in range(ws):
            dis0 = (y - y_pad[:, dy:dy + hh_, dx:dx + ww_, :]) ** 2
            dis0p = np.pad(dis0, sp, mode="reflect")
            dis = np.zeros_like(dis0)
            for by in range(ws):
                for bx in range(ws):
                    dis += dis0p[:, by:by + hh_, bx:bx + ww_, :]
            w = np.exp(-np.sqrt(np.maximum(dis, 0.0)) / hh)
            num += w * rgb_pad[:, dy:dy + hh_, dx:dx + ww_, :]
            den += w
    return np.clip(num / den, 0.0, 1.0)


def test_nlm_param_matches_numpy():
    rgb = RNG.rand(2, 12, 12, 3).astype(np.float32)
    for h in (0.5, 0.05):
        got = np.asarray(D.nlm_param(jnp.asarray(rgb), jnp.asarray(h),
                                     search_window_size=5))
        want = np_nlm_param(rgb, h, 5)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_nlm_param_h_is_learnable():
    """h carries a finite, nonzero gradient (the reference makes it an
    nn.Parameter; here it is a traced argument an optimizer can own)."""
    import jax

    rgb = jnp.asarray(RNG.rand(1, 10, 10, 3).astype(np.float32))
    g = jax.grad(lambda hh: D.nlm_param(rgb, hh,
                                        search_window_size=5).mean())(
        jnp.asarray(0.3))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
