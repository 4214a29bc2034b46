"""Quadratic scene-luminance spatial masks for filters.

Disabled by default (``cfg.masking = False``, reference config.py:40) but part
of the reference API surface (filters.py:161-200).  The reference torch code
broadcasts grid terms of shape [N,H,W,1] against a luminance of shape
[N,1,H,W]; since masking is never enabled, that latent shape bug is not
behaviour to preserve — here everything is coherent NHWC ([N,H,W,1] mask).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.ops.math import rgb2lum, tanh_range

FILTER_INPUT_RANGE = 5.0
NUM_MASK_PARAMETERS = 6


def mask_grid(h: int, w: int, dtype=jnp.float32):
    """Centered coordinate grid normalised by the shorter edge
    (reference filters.py:179-187).  Built in numpy — the grid is a pure
    constant, and concrete-array arithmetic inside a trace would execute
    eagerly on the default device (expensive through the tunneled TPU)."""
    shorter = min(h, w)
    i = (np.arange(h, dtype=np.float64) + (shorter - h) / 2.0) / shorter - 0.5
    j = (np.arange(w, dtype=np.float64) + (shorter - w) / 2.0) / shorter - 0.5
    gy = jnp.asarray(np.broadcast_to(i[:, None], (h, w)), dtype)
    gx = jnp.asarray(np.broadcast_to(j[None, :], (h, w)), dtype)
    return gy, gx


def get_mask(cfg, img, mask_parameters=None):
    """Spatial strength mask in [minimum_strength, 1] (filters.py:170-200).

    img: [N, H, W, 3]; mask_parameters: [N, 6] raw (pre-squash) or None.
    Returns [N, H, W, 1] (or a broadcastable ones scalar when masking is off).
    """
    if not cfg.masking or mask_parameters is None:
        # fixed-parameter rendering has no mask head — render unmasked
        # (the reference's Filter.run path never masks, filters.py:128-139)
        return jnp.asarray(np.ones((1, 1, 1, 1)), dtype=img.dtype)
    mp = tanh_range(-FILTER_INPUT_RANGE, FILTER_INPUT_RANGE, initial=0)(
        mask_parameters)
    n, h, w, _ = img.shape
    gy, gx = mask_grid(h, w, img.dtype)

    # A*y + B*x + C*(lum - 0.5) + D*2
    inp = (
        gy[None, :, :, None] * mp[:, 0, None, None, None]
        + gx[None, :, :, None] * mp[:, 1, None, None, None]
        + mp[:, 2, None, None, None] * (rgb2lum(img) - 0.5)
        + mp[:, 3, None, None, None] * 2.0
    )
    inp = inp * (cfg.maximum_sharpness * mp[:, 4, None, None, None]
                 / FILTER_INPUT_RANGE)
    mask = jnp.asarray(1.0) / (1.0 + jnp.exp(-inp))
    strength = mp[:, 5, None, None, None] / FILTER_INPUT_RANGE * 0.5 + 0.5
    return (mask * strength * (1.0 - cfg.minimum_strength)
            + cfg.minimum_strength)
