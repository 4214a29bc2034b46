"""Shared math primitives for the differentiable ISP op library.

Functional (no modules, no state), NHWC layout, float32 images in [0, 1].
Numerics match the reference activations/colour transforms:
  - tanh_range / tanh01: /root/reference/isp/filters.py:21-34
  - rgb2lum (0.27/0.67/0.06): /root/reference/isp/filters.py:12-14
  - luminance_709-ish (0.299/0.587/0.114): /root/reference/isp/denoise.py:11-17
  - rgb<->hsv: /root/reference/isp/filters.py:445-533
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp


def lerp(a, b, l):
    return (1 - l) * a + l * b


def tanh01(x):
    return jnp.tanh(x) * 0.5 + 0.5


def tanh_range(left: float, right: float, initial: float | None = None):
    """Squash an unbounded feature into (left, right).

    When ``initial`` is given, a constant bias shifts the activation so that a
    zero input maps to ``initial`` (reference filters.py:25-34).
    """
    if initial is not None:
        bias = math.atanh(2.0 * (initial - left) / (right - left) - 1.0)
    else:
        bias = 0.0

    def activation(x):
        return tanh01(x + bias) * (right - left) + left

    return activation


def rgb2lum(img):
    """Perceptual luminance used by the filter stack (NHWC -> NHW1)."""
    lum = 0.27 * img[..., 0] + 0.67 * img[..., 1] + 0.06 * img[..., 2]
    return lum[..., None]


def rgb_to_luminance(img):
    """BT.601 luminance used by the NLM denoiser (NHWC -> NHW1).

    Input is clipped to [0, 1] first (reference denoise.py:14).
    """
    img = jnp.clip(img, 0.0, 1.0)
    lum = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return lum[..., None]


def rgb2hsv(img):
    """RGB -> HSV over NHWC, range [0, 1).

    The reference (filters.py:445-478) writes hue with masked assignment in
    the order b-max, g-max, r-max, then zeroes min==max; later writes win, so
    the priority (highest first) is: min==max, r==max, g==max, b==max.
    Reproduced here with a jnp.where chain (last-applied where wins).
    """
    eps = 1e-8
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    rng = maxc - minc + eps

    hue = jnp.zeros_like(maxc)
    hue = jnp.where(b == maxc, 4.0 + (r - g) / rng, hue)
    hue = jnp.where(g == maxc, 2.0 + (b - r) / rng, hue)
    hue = jnp.where(r == maxc, ((g - b) / rng) % 6.0, hue)
    hue = jnp.where(minc == maxc, 0.0, hue)
    hue = hue / 6.0

    sat = (maxc - minc) / (maxc + eps)
    sat = jnp.where(maxc == 0, 0.0, sat)

    return jnp.stack([hue, sat, maxc], axis=-1)


def hsv2rgb(hsv):
    """HSV -> RGB over NHWC (reference filters.py:481-533)."""
    h = hsv[..., 0] % 1.0
    s = jnp.clip(hsv[..., 1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2], 0.0, 1.0)

    hi = jnp.floor(h * 6.0)
    f = h * 6.0 - hi
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)

    def pick(c0, c1, c2, c3, c4, c5):
        out = jnp.zeros_like(h)
        out = jnp.where(hi == 0, c0, out)
        out = jnp.where(hi == 1, c1, out)
        out = jnp.where(hi == 2, c2, out)
        out = jnp.where(hi == 3, c3, out)
        out = jnp.where(hi == 4, c4, out)
        out = jnp.where(hi == 5, c5, out)
        return out

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def _adaptive_bins(size: int, out: int):
    """torch AdaptiveAvgPool bin boundaries: bin i = [floor(i*size/out),
    ceil((i+1)*size/out))."""
    import math as _math

    lo = [(i * size) // out for i in range(out)]
    hi = [_math.ceil((i + 1) * size / out) for i in range(out)]
    return lo, hi


def adaptive_avg_pool(img, out_hw: int):
    """torch AdaptiveAvgPool2d equivalent for NHWC.

    Divisible sizes use the fast reshape-mean; any other size uses the
    exact torch bin arithmetic via a cumulative sum + static boundary
    gathers (the reference Value net accepts arbitrary image sizes through
    nn.AdaptiveAvgPool2d, value.py)."""
    n, h, w, c = img.shape
    if h % out_hw == 0 and w % out_hw == 0:
        kh, kw = h // out_hw, w // out_hw
        x = img.reshape(n, out_hw, kh, out_hw, kw, c)
        return x.mean(axis=(2, 4))

    def pool_axis(x, axis, size):
        cs = jnp.cumsum(x, axis=axis)
        cs = jnp.concatenate(
            [jnp.zeros_like(jnp.take(cs, jnp.asarray([0]), axis=axis)), cs],
            axis=axis)
        lo, hi = _adaptive_bins(size, out_hw)
        sums = (jnp.take(cs, jnp.asarray(hi), axis=axis)
                - jnp.take(cs, jnp.asarray(lo), axis=axis))
        counts = jnp.asarray([b - a for a, b in zip(lo, hi)], x.dtype)
        shape = [1] * x.ndim
        shape[axis] = out_hw
        return sums / counts.reshape(shape)

    return pool_axis(pool_axis(img, 1, h), 2, w)


def depthwise_conv3x3(img, kernel, padding="VALID"):
    """Depthwise 3x3 conv over NHWC with a shared [3,3] kernel per channel.

    Computed as 9 shifted slice-multiply-adds instead of
    ``lax.conv_general_dilated``: a depthwise conv can't use the MXU, and
    XLA's fallback lowering measured 4.5 ms fwd for batch 8 @ 512px on
    v5e; the slice-sum fuses into a single VPU pass over the image
    (~bandwidth-bound).  Numerically the same dot, accumulated in f32.

    Tap weights are read with ``kernel[i, j]`` at trace time; a device
    array there would make each read an eager op (~20-40 s each through
    the tunneled TPU remote-compile), so the kernel is forced to a host
    numpy constant.
    """
    kernel = np.asarray(kernel)
    if padding == "SAME":
        img = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, hp, wp, c = img.shape
    h, w = hp - 2, wp - 2
    out = jnp.zeros((n, h, w, c), img.dtype)
    for i in range(3):
        for j in range(3):
            out = out + kernel[i, j] * img[:, i:i + h, j:j + w, :]
    return out
