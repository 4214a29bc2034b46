"""Tests for the jitted sRGB -> RAW unprocess pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.raw import unprocess as U
from adaptiveisp_tpu.raw.bayer import mosaic, reconstruct_bayer

RNG = np.random.RandomState(2)


def test_random_ccm_rows_sum_to_one():
    ccm = np.asarray(U.random_ccm(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(ccm.sum(-1), np.ones(3), rtol=2e-4, atol=1e-6)


def test_random_gains_ranges():
    for seed in range(5):
        rgb, red, blue = U.random_gains(jax.random.PRNGKey(seed))
        assert 1.9 <= float(red) <= 2.4
        assert 1.5 <= float(blue) <= 1.9
        assert 0.5 <= float(rgb) <= 3.0  # 1/N(0.8, 0.1) overwhelmingly here


def test_inverse_smoothstep_inverts_smoothstep():
    # smoothstep(x) = 3x^2 - 2x^3; its inverse is the reference formula
    x = np.linspace(0.05, 0.95, 19).astype(np.float32)
    inv = np.asarray(U.inverse_smoothstep(jnp.asarray(x)))
    smooth = 3 * inv ** 2 - 2 * inv ** 3
    np.testing.assert_allclose(smooth, x, rtol=1e-4, atol=1e-5)


def test_gamma_expansion():
    x = np.asarray([0.0, 0.25, 1.0], dtype=np.float32)
    got = np.asarray(U.gamma_expansion(jnp.asarray(x)))
    want = np.maximum(x, 1e-8) ** 2.2
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_apply_ccm_matches_tensordot():
    img = RNG.rand(4, 4, 3).astype(np.float32)
    ccm = RNG.rand(3, 3).astype(np.float32)
    got = np.asarray(U.apply_ccm(jnp.asarray(img), jnp.asarray(ccm)))
    want = np.tensordot(img.reshape(-1, 3), ccm, [[-1], [-1]]).reshape(img.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_safe_invert_gains_white_pixels_protected():
    img = np.ones((4, 4, 3), np.float32)  # saturated white
    out = np.asarray(U.safe_invert_gains(
        jnp.asarray(img), jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(1.8)))
    # mask == 1 at white: gains = max(1, gains) -> channels not dimmed below 1
    assert out.min() >= 1.0 - 1e-6


def test_safe_invert_gains_dark_pixels_scaled():
    img = np.full((2, 2, 3), 0.2, np.float32)
    rgb_gain, red, blue = 1.0, 2.0, 1.6
    out = np.asarray(U.safe_invert_gains(
        jnp.asarray(img), jnp.asarray(rgb_gain), jnp.asarray(red), jnp.asarray(blue)))
    want = img * np.array([1 / red, 1.0, 1 / blue], np.float32)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-6)


def test_unprocess_deterministic_given_key():
    img = jnp.asarray(RNG.rand(8, 8, 3).astype(np.float32))
    key = jax.random.PRNGKey(42)
    out1, meta1 = U.unprocess_wo_mosaic(key, img)
    out2, meta2 = U.unprocess_wo_mosaic(key, img)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(meta1.cam2rgb), np.asarray(meta2.cam2rgb))


def test_unprocess_darkens_and_stays_in_range():
    img = jnp.asarray(RNG.rand(16, 16, 3).astype(np.float32))
    out, meta = U.unprocess_wo_mosaic(jax.random.PRNGKey(7), img)
    out = np.asarray(out)
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # unprocess produces darker linear RAW than display sRGB on average
    assert out.mean() < np.asarray(img).mean()


def test_unprocess_with_noise_and_brightness():
    img = jnp.asarray(RNG.rand(8, 8, 3).astype(np.float32))
    out, meta = U.unprocess_wo_mosaic(
        jax.random.PRNGKey(3), img, add_noise=True,
        brightness_range=(0.1, 0.3), noise_level=0.005)
    assert 0.1 <= float(meta.gain) <= 0.3
    assert abs(float(meta.shot_noise) - 0.005) < 1e-8
    assert float(meta.read_noise) > 0
    assert np.asarray(out).max() <= 1.0


def test_unprocess_batch_vmap():
    imgs = jnp.asarray(RNG.rand(4, 8, 8, 3).astype(np.float32))
    out, meta = U.unprocess_batch(jax.random.PRNGKey(0), imgs)
    assert out.shape == (4, 8, 8, 3)
    assert meta.cam2rgb.shape == (4, 3, 3)
    # per-image keys -> different metadata per image
    assert not np.allclose(np.asarray(meta.red_gain[0]), np.asarray(meta.red_gain[1]))


def test_unprocess_jits():
    img = jnp.asarray(RNG.rand(8, 8, 3).astype(np.float32))
    f = jax.jit(lambda k, im: U.unprocess_wo_mosaic(k, im)[0])
    out = f(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape


def test_mosaic_roundtrip():
    img = RNG.rand(8, 8, 3).astype(np.float32)
    planes = np.asarray(mosaic(jnp.asarray(img), "RGGB"))
    assert planes.shape == (4, 4, 4)
    np.testing.assert_array_equal(planes[..., 0], img[0::2, 0::2, 0])
    np.testing.assert_array_equal(planes[..., 3], img[1::2, 1::2, 2])
    bayer = np.asarray(reconstruct_bayer(jnp.asarray(planes), "rggb"))
    assert bayer.shape == (8, 8)
    np.testing.assert_array_equal(bayer[0::2, 0::2], planes[..., 0])


def test_unprocess_canon_uses_calibrated_matrix():
    img = jnp.asarray(RNG.rand(8, 8, 3).astype(np.float32))
    raw, meta = U.unprocess_canon(jax.random.PRNGKey(0), img)
    np.testing.assert_allclose(
        np.asarray(meta.cam2rgb), np.asarray(U.CALIBRATED_CAM2RGB))
    assert raw.shape == (4, 4, 4)  # RGBG planes
