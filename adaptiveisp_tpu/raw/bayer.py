"""Bayer mosaic utilities (reference /root/reference/isp/unprocess_np.py:82-128)."""

from __future__ import annotations

import jax.numpy as jnp

BAYER_INDICES = {
    # (x0, y0) for each of the four sub-planes, reference :100-109
    "gbrg": ((0, 1), (1, 1), (0, 0), (1, 0)),
    "rggb": ((0, 0), (1, 0), (0, 1), (1, 1)),
    "bggr": ((1, 1), (0, 1), (1, 0), (0, 0)),
    "grbg": ((1, 0), (0, 0), (1, 1), (0, 1)),
    "rgbg": ((0, 0), (1, 0), (1, 1), (0, 1)),
}


def mosaic(image, pattern: str = "RGGB"):
    """Extract Bayer planes from an [..., H, W, 3] RGB image -> [..., H/2, W/2, 4].

    Reference unprocess_np.py:82-98.
    """
    red = image[..., 0::2, 0::2, 0]
    green_red = image[..., 0::2, 1::2, 1]
    green_blue = image[..., 1::2, 0::2, 1]
    blue = image[..., 1::2, 1::2, 2]
    p = pattern.upper()
    if p == "RGGB":
        out = jnp.stack((red, green_red, green_blue, blue), axis=-1)
    elif p == "RGBG":  # Canon 5D Mark IV layout
        out = jnp.stack((red, green_red, blue, green_blue), axis=-1)
    else:
        raise ValueError(f"Unsupported Bayer pattern: {p}")
    return out


def reconstruct_bayer(raw, bayer_pattern: str):
    """Rebuild a [H, W] Bayer array from [H/2, W/2, 4] planes
    (reference unprocess_np.py:111-128)."""
    idx = BAYER_INDICES[bayer_pattern.lower()]
    h2, w2 = raw.shape[0], raw.shape[1]
    bayer = jnp.zeros((2 * h2, 2 * w2), dtype=raw.dtype)
    for (x0, y0), plane in zip(idx, [raw[..., i] for i in range(4)]):
        bayer = bayer.at[y0::2, x0::2].set(plane)
    return bayer
