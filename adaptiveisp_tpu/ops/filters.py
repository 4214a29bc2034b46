"""Differentiable ISP filters as pure functions over NHWC tensors.

Each filter is a pair of pure functions:

  squash_<name>(cfg, raw_features[N, n_params]) -> params   (the reference's
      ``filter_param_regressor``, /root/reference/isp/filters.py per class)
  apply_<name>(cfg, img[N, H, W, 3], params) -> img          (the reference's
      ``Filter.process``)

The full per-step op (the reference's ``Filter.forward`` with masking disabled,
filters.py:91-126) is ``clip(apply(img, squash(feat)), 0, 1)``; spatial masking
(filters.py:170-200) lives in :mod:`adaptiveisp_tpu.ops.masks` and is composed
by :mod:`adaptiveisp_tpu.ops.bank`.

This module is the correctness reference; fused Pallas kernels for the hot
paths live in :mod:`adaptiveisp_tpu.ops.pallas`.

Reference math, per filter (file:line in /root/reference/isp/filters.py):
  exposure         :215-232   img * 2**p,             p in [-3.5, 3.5]
  gamma            :235-250   clip(img,1e-3)**p,      p = exp(tanh_range(+-ln 3))
  improved_wb      :253-278   channel gains, R pinned, luminance-normalised
  color (curve)    :281-323   8-seg piecewise-linear per-channel curve
  tone             :326-362   8-seg piecewise-linear global curve
  contrast         :406-424   cosine luminance remap, lerp by tanh(p)
  wnb              :427-442   lerp toward luminance, sigmoid(p)
  saturation_plus  :536-568   HSV S-boost, blend by sigmoid(p)
  denoise (NLM)    :571-594   non-local means, strength sigmoid(p)
  sharpen          :621-641   3x3 centre-5 kernel sharpen, p in [0, 10]
  sharpen_usm      :597-618   Gaussian unsharp mask (sigma, amount)
  ccm              :694-723   row-normalised 3x3 colour matrix
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.ops.math import (
    hsv2rgb,
    lerp,
    rgb2hsv,
    rgb2lum,
    tanh_range,
)
from adaptiveisp_tpu.ops import denoise as _denoise
from adaptiveisp_tpu.ops import sharpen as _sharpen

LN2 = math.log(2.0)


# --------------------------------------------------------------------------- #
# Exposure
# --------------------------------------------------------------------------- #
def squash_exposure(cfg, feat):
    return tanh_range(-cfg.exposure_range, cfg.exposure_range, initial=0)(feat)


def apply_exposure(cfg, img, param):
    return img * jnp.exp(param[:, None, None, :] * LN2)


# --------------------------------------------------------------------------- #
# Gamma
# --------------------------------------------------------------------------- #
def squash_gamma(cfg, feat):
    log_g = math.log(cfg.gamma_range)
    return jnp.exp(tanh_range(-log_g, log_g)(feat))


def apply_gamma(cfg, img, param):
    return jnp.power(jnp.clip(img, 0.001), param[:, None, None, :])


# --------------------------------------------------------------------------- #
# Improved white balance
# --------------------------------------------------------------------------- #
def squash_improved_wb(cfg, feat):
    log_wb_range = 0.5
    mask = jnp.array([[0.0, 1.0, 1.0]], dtype=feat.dtype)
    feat = feat * mask
    scale = jnp.exp(tanh_range(-log_wb_range, log_wb_range)(feat))
    lum = 1e-5 + 0.27 * scale[:, 0] + 0.67 * scale[:, 1] + 0.06 * scale[:, 2]
    return scale * (1.0 / lum)[:, None]


def apply_improved_wb(cfg, img, param):
    return img * param[:, None, None, :]


# --------------------------------------------------------------------------- #
# Colour curve (defined in the reference but not in the default roster)
# --------------------------------------------------------------------------- #
def squash_color(cfg, feat):
    curve = feat.reshape(-1, cfg.curve_steps, 3)
    return tanh_range(*cfg.color_curve_range, initial=1)(curve)


def apply_color(cfg, img, param):
    # param: [N, steps, 3]
    steps = cfg.curve_steps
    curve_sum = jnp.sum(param, axis=1) + 1e-30  # [N, 3]
    total = jnp.zeros_like(img)
    for i in range(steps):
        seg = jnp.clip(img - i / steps, 0.0, 1.0 / steps)
        total = total + seg * param[:, i][:, None, None, :]
    return total * (steps / curve_sum)[:, None, None, :]


# --------------------------------------------------------------------------- #
# Tone curve
# --------------------------------------------------------------------------- #
def squash_tone(cfg, feat):
    curve = feat.reshape(-1, cfg.curve_steps)
    return tanh_range(*cfg.tone_curve_range)(curve)


def apply_tone(cfg, img, param):
    # param: [N, steps] global curve shared by all channels
    steps = cfg.curve_steps
    curve_sum = jnp.sum(param, axis=1) + 1e-30  # [N]
    total = jnp.zeros_like(img)
    for i in range(steps):
        seg = jnp.clip(img - i / steps, 0.0, 1.0 / steps)
        total = total + seg * param[:, i][:, None, None, None]
    return total * (steps / curve_sum)[:, None, None, None]


def squash_tone_v2(cfg, feat):
    return squash_tone(cfg, feat)


def apply_tone_v2(cfg, img, param):
    """ToneFilterV2 (reference filters.py:365-402).

    The reference V2 differs from ToneFilter only in ``process`` expanding a
    flat [N, steps] parameter itself (``param[:, :, None, None, None]``,
    filters.py:378) instead of requiring the regressor's pre-broadcast
    5-D curve — the curve math is identical.  This functional design always
    passes flat [N, steps] params, so V2 shares ToneFilter's apply; the
    registry row exists so configs naming ``tone_v2`` resolve.
    """
    return apply_tone(cfg, img, param)


# --------------------------------------------------------------------------- #
# Contrast
# --------------------------------------------------------------------------- #
def squash_contrast(cfg, feat):
    return jnp.tanh(feat)


def apply_contrast(cfg, img, param):
    lum = jnp.clip(rgb2lum(img), 0.0, 1.0)
    contrast_lum = -jnp.cos(math.pi * lum) * 0.5 + 0.5
    contrast_img = img / (lum + 1e-6) * contrast_lum
    return lerp(img, contrast_img, param[:, None, None, :])


# --------------------------------------------------------------------------- #
# Black & white (WNB)
# --------------------------------------------------------------------------- #
def squash_wnb(cfg, feat):
    return jnp.asarray(1.0) / (1.0 + jnp.exp(-feat))


def apply_wnb(cfg, img, param):
    lum = rgb2lum(img)
    return lerp(img, lum, param[:, None, None, :])


# --------------------------------------------------------------------------- #
# Saturation boost
# --------------------------------------------------------------------------- #
def squash_saturation_plus(cfg, feat):
    return jnp.asarray(1.0) / (1.0 + jnp.exp(-feat))


def apply_saturation_plus(cfg, img, param):
    img = jnp.clip(img, 0.0, 1.0)
    hsv = rgb2hsv(img)
    s, v = hsv[..., 1:2], hsv[..., 2:3]
    enhanced_s = s + (1 - s) * (0.5 - jnp.abs(0.5 - v)) * 0.8
    hsv1 = jnp.concatenate([hsv[..., 0:1], enhanced_s, hsv[..., 2:]], axis=-1)
    full_color = hsv2rgb(hsv1)
    p = param[:, None, None, :]
    return img * (1.0 - p) + full_color * p


# --------------------------------------------------------------------------- #
# NLM denoise
# --------------------------------------------------------------------------- #
def squash_denoise(cfg, feat):
    return jnp.asarray(1.0) / (1.0 + jnp.exp(-feat))


def apply_denoise(cfg, img, param, gate=None):
    img = jnp.clip(img, 0.0, 1.0)
    use_pallas = getattr(cfg, "use_pallas", True)
    return _denoise.nlm_gray_dispatch(img, param, use_pallas=use_pallas,
                                      gate=gate)


# --------------------------------------------------------------------------- #
# Sharpen (3x3 centre-5 kernel)
# --------------------------------------------------------------------------- #
def squash_sharpen(cfg, feat):
    return tanh_range(*cfg.sharpen_range)(feat)


def apply_sharpen(cfg, img, param):
    return _sharpen.adjust_sharpness(img, param[:, None, None, :])


def squash_sharpen_v2(cfg, feat):
    return tanh_range(*cfg.sharpen_range)(feat)


def apply_sharpen_v2(cfg, img, param):
    return _sharpen.sharpness(img, param[:, None, None, :])


# --------------------------------------------------------------------------- #
# Unsharp-mask sharpen (sigma, amount) — defined, not in default roster
# --------------------------------------------------------------------------- #
def squash_sharpen_usm(cfg, feat):
    return tanh_range(*cfg.usm_sharpen_range)(feat)


def apply_sharpen_usm(cfg, img, param):
    return _sharpen.unsharp_mask(
        img, param[:, 0], param[:, 1], kernel_size=5, clip=True)


# --------------------------------------------------------------------------- #
# Colour correction matrix
# --------------------------------------------------------------------------- #
def squash_ccm(cfg, feat):
    return tanh_range(*cfg.ccm_range)(feat)


def color_correction_matrix(img, ccm):
    """img: NHWC; ccm: [N, 3, 3]; out[..., k] = sum_c img[..., c] * ccm[k, c].

    Matches reference filters.py:666-672 (sum over the last ccm axis).
    """
    return jnp.einsum("nhwc,nkc->nhwk", img, ccm,
                      precision=jax.lax.Precision.HIGHEST)


def apply_ccm(cfg, img, param):
    ccm = param.reshape(-1, 3, 3)
    ccm = ccm / jnp.sum(ccm, axis=-1, keepdims=True)
    return color_correction_matrix(img, ccm)
