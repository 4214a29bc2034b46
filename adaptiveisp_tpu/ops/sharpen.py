"""Sharpening kernels (3x3 centre-5 sharpen + Gaussian unsharp mask).

Reference math: /root/reference/isp/sharpen.py
  - adjust_sharpness / sharpness (:105-182): depthwise VALID 3x3 conv with
    kernel ones(3,3) with centre 5, normalised by 13; the 1-pixel border keeps
    the original image (the reference pads a ones-mask and selects).
  - unsharp_mask (:84-102): reflect-padded depthwise Gaussian blur with
    per-sample sigma, out = img + (img - blur) * amount.

All NHWC, float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.ops.math import depthwise_conv3x3

# ones(3,3) with centre 5, sum-normalised (reference sharpen.py:119-121).
# numpy, NOT jnp: constants computed on concrete arrays inside a trace
# execute EAGERLY on the default device — through the tunneled TPU
# remote-compile each unique eager op costs ~20-40 s, and this module's
# jnp constants (kernel gathers + border arithmetic) alone made the agent
# take ~6 min to trace.  numpy keeps them trace-time constants.
_SHARPEN_KERNEL = np.array(
    [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], np.float32) / 13.0


def _blur_keep_border(img):
    """VALID 3x3 blur; border pixels keep the original image value."""
    inner = depthwise_conv3x3(img, _SHARPEN_KERNEL, padding="VALID")
    blurred = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, h, w, c = img.shape
    row = np.arange(h)[None, :, None, None]
    col = np.arange(w)[None, None, :, None]
    border = (row == 0) | (row == h - 1) | (col == 0) | (col == w - 1)
    return jnp.where(border, img, blurred)


def adjust_sharpness(img, factor):
    """out = img * factor + blurred * (1 - factor), clipped to [0, 1].

    factor broadcastable to [N, 1, 1, 1] (reference sharpen.py:105-142).
    """
    blurred = _blur_keep_border(img)
    out = img * factor + blurred * (1.0 - factor)
    return jnp.clip(out, 0.0, 1.0)


def sharpness(img, factor):
    """out = img + (img - blurred) * factor (reference sharpen.py:145-182)."""
    blurred = _blur_keep_border(img)
    out = img + (img - blurred) * factor
    return jnp.clip(out, 0.0, 1.0)


def gaussian_kernel1d(kernel_size: int, sigma):
    """Normalised 1-D Gaussian (reference sharpen.py:15-22)."""
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size).astype(np.float32)
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / jnp.sum(pdf)


def gaussian_blur(img, kernel_size: int, sigma):
    """Reflect-padded depthwise Gaussian blur; sigma is a scalar per call.

    Matches reference gaussian_blur_torch (sharpen.py:63-81).
    img: [N, H, W, C].
    """
    assert kernel_size % 2 == 1, "slice-sum blur needs an odd kernel"
    k1 = gaussian_kernel1d(kernel_size, sigma)
    k2 = jnp.outer(k1, k1)
    pad = kernel_size // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # shifted slice-multiply-adds instead of a depthwise conv: depthwise
    # can't use the MXU and XLA's fallback lowering is ~20x slower than
    # this single fused VPU pass (see ops/math.depthwise_conv3x3)
    n, hp, wp, c = x.shape
    h, w = hp - 2 * pad, wp - 2 * pad
    out = jnp.zeros((n, h, w, c), img.dtype)
    for i in range(kernel_size):
        for j in range(kernel_size):
            out = out + k2[i, j] * x[:, i:i + h, j:j + w, :]
    return out


def unsharp_mask(img, sigma, amount, kernel_size: int = 5, clip: bool = True):
    """Gaussian unsharp mask with per-sample sigma/amount.

    img: [N, H, W, C]; sigma, amount: [N] (reference sharpen.py:84-102 loops
    per batch element; here it is a vmap).
    """

    def one(im, sg, am):
        blurred = gaussian_blur(im[None], kernel_size, sg)[0]
        return im + (im - blurred) * am

    out = jax.vmap(one)(img, sigma, amount)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out
