"""sRGB -> synthetic RAW ("unprocess") pipeline, jitted and PRNG-keyed.

Re-designs /root/reference/isp/unprocess_np.py (NumPy, np.random global state)
as pure jax functions driven by explicit ``jax.random`` keys so RAW synthesis
jits alongside the ISP and vmaps over the batch on device.  Deterministic
per-image seeding for validation parity (reference dataset.py:83-86) is
achieved by deriving keys from filename hashes in the data layer.

Functions mirror the reference one-to-one:
  random_ccm            :5-35      convex combination of 4 XYZ->cam matrices
  random_gains          :43-51
  inverse_smoothstep    :53-56
  gamma_expansion       :58-61
  apply_ccm             :63-68
  safe_invert_gains     :70-80
  adjust_random_brightness :131-137
  noise models          :145-181
  unprocess_wo_mosaic   :248-292   (the training path)
  unprocess_wo_mosaic_v2:295-346
  unprocess / unprocess_canon (with Bayer mosaic) :184-245
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.raw.bayer import mosaic

XYZ2CAMS = jnp.array(
    [[[1.0234, -0.2969, -0.2266],
      [-0.5625, 1.6328, -0.0469],
      [-0.0703, 0.2188, 0.6406]],
     [[0.4913, -0.0541, -0.0202],
      [-0.613, 1.3513, 0.2906],
      [-0.1564, 0.2151, 0.7183]],
     [[0.838, -0.263, -0.0639],
      [-0.2887, 1.0725, 0.2496],
      [-0.0627, 0.1427, 0.5438]],
     [[0.6596, -0.2079, -0.0562],
      [-0.4782, 1.3016, 0.1933],
      [-0.097, 0.1581, 0.5181]]])

RGB2XYZ = jnp.array(
    [[0.4124564, 0.3575761, 0.1804375],
     [0.2126729, 0.7151522, 0.0721750],
     [0.0193339, 0.1191920, 0.9503041]])

# Calibrated Canon cam2rgb (reference unprocess_np.py:37-41)
CALIBRATED_CAM2RGB = jnp.array(
    [[2.04840695, -1.27161572, 0.22320878],
     [-0.22163155, 1.77694640, -0.55531485],
     [-0.00770995, -0.59257895, 1.60028890]], dtype=jnp.float32)


class RawMetadata(NamedTuple):
    cam2rgb: jnp.ndarray   # [3, 3]
    rgb_gain: jnp.ndarray  # scalar
    red_gain: jnp.ndarray  # scalar
    blue_gain: jnp.ndarray  # scalar
    gain: jnp.ndarray      # scalar brightness gain (1.0 if unused)
    shot_noise: jnp.ndarray
    read_noise: jnp.ndarray


def random_ccm(key):
    """Random RGB -> camera CCM (reference :5-35)."""
    weights = jax.random.uniform(
        key, (4, 1, 1), minval=1e-8, maxval=1e8, dtype=jnp.float32)
    xyz2cam = jnp.sum(XYZ2CAMS * weights, axis=0) / jnp.sum(weights, axis=0)
    rgb2cam = xyz2cam @ RGB2XYZ
    return rgb2cam / jnp.sum(rgb2cam, axis=-1, keepdims=True)


def random_gains(key):
    """Random brightening + white-balance gains (reference :43-51)."""
    k1, k2, k3 = jax.random.split(key, 3)
    rgb_gain = 1.0 / (0.8 + 0.1 * jax.random.normal(k1))
    red_gain = jax.random.uniform(k2, minval=1.9, maxval=2.4)
    blue_gain = jax.random.uniform(k3, minval=1.5, maxval=1.9)
    return rgb_gain, red_gain, blue_gain


def inverse_smoothstep(image):
    image = jnp.clip(image, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * image) / 3.0)


def gamma_expansion(image):
    return jnp.maximum(image, 1e-8) ** 2.2


def apply_ccm(image, ccm):
    """image: [..., 3], ccm: [3, 3]; out[..., k] = sum_c image[..., c]*ccm[k, c]."""
    return jnp.einsum("...c,kc->...k", image, ccm)


def safe_invert_gains(image, rgb_gain, red_gain, blue_gain):
    """Invert gains, masking near-white pixels (reference :70-80)."""
    gains = jnp.stack(
        [1.0 / red_gain, jnp.ones_like(red_gain), 1.0 / blue_gain]) / rgb_gain
    gray = jnp.mean(image, axis=-1, keepdims=True)
    inflection = 0.9
    mask = (jnp.maximum(gray - inflection, 0.0) / (1.0 - inflection)) ** 2.0
    safe_gains = jnp.maximum(mask + (1.0 - mask) * gains, gains)
    return image * safe_gains


def adjust_random_brightness(key, image, s_range=(0.1, 0.3)):
    if isinstance(s_range, (list, tuple)):
        lo, hi = s_range
        ratio = jax.random.uniform(key) * (hi - lo) + lo
    else:
        ratio = jnp.asarray(s_range, dtype=image.dtype)
    return image * ratio, ratio


def random_noise_levels_log(key, shot_noise=None):
    """Log-log linear noise model (reference :145-158)."""
    k1, k2 = jax.random.split(key)
    if shot_noise is None:
        log_shot = jax.random.uniform(
            k1, minval=jnp.log(0.0001), maxval=jnp.log(0.012))
        shot = jnp.exp(log_shot)
    else:
        shot = jnp.asarray(shot_noise)
        log_shot = jnp.log(shot)
    log_read = 2.18 * log_shot + 1.20 + 0.26 * jax.random.normal(k2)
    return shot, jnp.exp(log_read)


def random_noise_levels_linear(key, shot_noise=None):
    """Linear-domain noise model (reference :161-174)."""
    k1, k2 = jax.random.split(key)
    if shot_noise is None:
        shot = jax.random.uniform(k1, minval=0.0001, maxval=0.012)
    else:
        shot = jnp.asarray(shot_noise)
    log_shot = jnp.log(shot)
    log_read = 2.18 * log_shot + 1.20 + 0.26 * jax.random.normal(k2)
    return shot, jnp.exp(log_read)


def add_read_and_shot_noise(key, image, shot_noise=0.01, read_noise=0.005):
    variance = image * shot_noise + read_noise
    noise = jnp.sqrt(variance) * jax.random.normal(
        key, variance.shape, dtype=image.dtype)
    return image + noise


def unprocess_wo_mosaic(key, image, add_noise: bool = False,
                        brightness_range=None, noise_level=None,
                        use_linear: bool = False):
    """The training-path unprocess (reference :248-292).

    image: [..., 3] sRGB in [0, 1].  Returns (raw_rgb, RawMetadata).
    """
    k_ccm, k_gain, k_bri, k_nlvl, k_noise = jax.random.split(key, 5)
    rgb2cam = random_ccm(k_ccm)
    cam2rgb = jnp.linalg.inv(rgb2cam)
    rgb_gain, red_gain, blue_gain = random_gains(k_gain)

    image = image * 0.9  # fixed brightness scale (reference :255)
    image = inverse_smoothstep(image)
    image = gamma_expansion(image)
    image = apply_ccm(image, rgb2cam)
    image = safe_invert_gains(image, rgb_gain, red_gain, blue_gain)
    image = jnp.clip(image, 0.0, 1.0)

    gain = jnp.asarray(1.0, dtype=image.dtype)
    if brightness_range is not None:
        image, gain = adjust_random_brightness(k_bri, image, brightness_range)

    shot = jnp.asarray(0.0)
    read = jnp.asarray(0.0)
    if add_noise:
        if use_linear:
            shot, read = random_noise_levels_linear(k_nlvl, noise_level)
        else:
            shot, read = random_noise_levels_log(k_nlvl, noise_level)
        image = add_read_and_shot_noise(k_noise, image, shot, read)
        image = jnp.clip(image, 0.0, 1.0)

    meta = RawMetadata(cam2rgb, rgb_gain, red_gain, blue_gain, gain, shot, read)
    return image, meta


def unprocess_wo_mosaic_v2(key, image, add_noise: bool = False,
                           brightness_range=None, noise_level=None,
                           use_linear: bool = False):
    """Reordered variant (reference :295-346)."""
    k_ccm, k_gain, k_bri0, k_bri, k_nlvl, k_noise = jax.random.split(key, 6)
    rgb2cam = random_ccm(k_ccm)
    cam2rgb = jnp.linalg.inv(rgb2cam)
    rgb_gain, red_gain, blue_gain = random_gains(k_gain)

    image, _ = adjust_random_brightness(k_bri0, image, (0.5, 0.9))
    image = safe_invert_gains(image, rgb_gain, red_gain, blue_gain)
    image = gamma_expansion(image)
    image = inverse_smoothstep(image)
    image = apply_ccm(image, rgb2cam)
    image = jnp.clip(image, 0.0, 1.0)

    gain = jnp.asarray(1.0, dtype=image.dtype)
    if brightness_range is not None:
        image, gain = adjust_random_brightness(k_bri, image, brightness_range)

    shot = jnp.asarray(0.0)
    read = jnp.asarray(0.0)
    if add_noise:
        if use_linear:
            shot, read = random_noise_levels_linear(k_nlvl, noise_level)
        else:
            shot, read = random_noise_levels_log(k_nlvl, noise_level)
        image = add_read_and_shot_noise(k_noise, image, shot, read)
        image = jnp.clip(image, 0.0, 1.0)

    meta = RawMetadata(cam2rgb, rgb_gain, red_gain, blue_gain, gain, shot, read)
    return image, meta


def unprocess(key, image, pattern: str = "RGGB"):
    """Full unprocess with Bayer mosaic (reference :217-245)."""
    k_ccm, k_gain = jax.random.split(key)
    rgb2cam = random_ccm(k_ccm)
    cam2rgb = jnp.linalg.inv(rgb2cam)
    rgb_gain, red_gain, blue_gain = random_gains(k_gain)

    image = inverse_smoothstep(image)
    image = gamma_expansion(image)
    image = apply_ccm(image, rgb2cam)
    image = safe_invert_gains(image, rgb_gain, red_gain, blue_gain)
    image = jnp.clip(image, 0.0, 1.0)
    image = mosaic(image, pattern)

    meta = RawMetadata(cam2rgb, rgb_gain, red_gain, blue_gain,
                       jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0))
    return image, meta


def unprocess_canon(key, image):
    """Calibrated-Canon unprocess with RGBG mosaic (reference :184-214)."""
    cam2rgb = CALIBRATED_CAM2RGB
    rgb2cam = jnp.linalg.inv(cam2rgb)
    rgb_gain, red_gain, blue_gain = random_gains(key)

    image = inverse_smoothstep(image)
    image = gamma_expansion(image)
    image = apply_ccm(image, rgb2cam)
    image = safe_invert_gains(image, rgb_gain, red_gain, blue_gain)
    image = jnp.clip(image, 0.0, 1.0)
    image = mosaic(image, "RGBG")

    meta = RawMetadata(cam2rgb, rgb_gain, red_gain, blue_gain,
                       jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0))
    return image, meta


def unprocess_batch(key, images, add_noise: bool = False,
                    brightness_range=None, noise_level=None,
                    use_linear: bool = False):
    """vmap of unprocess_wo_mosaic over a batch with per-image keys."""
    keys = jax.random.split(key, images.shape[0])

    def one(k, im):
        return unprocess_wo_mosaic(
            k, im, add_noise=add_noise, brightness_range=brightness_range,
            noise_level=noise_level, use_linear=use_linear)

    return jax.vmap(one)(keys, images)
