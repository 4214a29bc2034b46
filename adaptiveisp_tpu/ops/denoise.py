"""Non-local-means denoising, XLA edition.

The reference implements NLM as a Python loop of 121 ``torch.roll`` shifts with
a 25-shift box sum inside (/root/reference/isp/denoise.py:93-119) — circular
(wrap-around) boundary semantics.  Here the box sum is a separable pair of
roll-accumulations and the search loop is unrolled under jit so XLA fuses the
per-offset elementwise chain; the speed-of-light single-pass version is the
Pallas kernel in :mod:`adaptiveisp_tpu.ops.pallas.nlm`.

All tensors are NHWC float in [0, 1]; ``h`` (filter strength) is [N, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

from adaptiveisp_tpu.ops.math import rgb_to_luminance

EPS = 1e-8


def box_sum(x, window_size: int):
    """Circular box sum over the H, W axes of an NHWC tensor.

    Separable equivalent of the reference ``BoxFilter(reduction='sum')``
    (denoise.py:46-65), which accumulates ``torch.roll`` shifts.
    """
    r = window_size // 2
    # Sum over rows then columns; roll is circular like torch.roll.
    row = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        row = row + jnp.roll(x, dy, axis=1)
    out = jnp.zeros_like(x)
    for dx in range(-r, r + 1):
        out = out + jnp.roll(row, dx, axis=2)
    return out


def box_mean(x, window_size: int):
    return box_sum(x, window_size) / float(window_size * window_size)


def nlm_gray(rgb, h, search_window_size: int = 11, patch_size: int = 5):
    """Gray-guided non-local means (reference NonLocalMeansGray, :93-119).

    rgb: [N, H, W, 3]; h: [N, 1] strength.  Distances are computed on
    luminance; weights ``exp(-sqrt(relu(boxsum((y - y')^2))) / (relu(h)+eps))``.
    """
    r = search_window_size // 2
    y = rgb_to_luminance(rgb)  # [N, H, W, 1]
    hh = jnp.maximum(h, 0.0)[:, None, None, :] + EPS  # [N,1,1,1]

    weights = jnp.zeros_like(y)
    denoised = jnp.zeros_like(rgb)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            shifted_rgb = jnp.roll(rgb, (dy, dx), axis=(1, 2))
            shifted_y = jnp.roll(y, (dy, dx), axis=(1, 2))
            dist = _safe_sqrt(box_sum((y - shifted_y) ** 2, patch_size))
            w = jnp.exp(-dist / hh)
            denoised = denoised + shifted_rgb * w
            weights = weights + w
    return jnp.clip(denoised / weights, 0.0, 1.0)


def _safe_sqrt(x):
    """sqrt with torch-relu-backward semantics: zero gradient at x <= 0.

    torch's relu backward SELECTS 0 (sqrt's inf cotangent never
    multiplies in), but jax's sqrt(maximum(x, 0)) propagates inf * 0 =
    NaN at the identically-zero center offset — the double-where keeps
    forward values identical and the x<=0 branch's gradient exactly 0."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def nlm_gray_dispatch(rgb, h, use_pallas: bool = True, gate=None):
    """Pick the Pallas single-pass kernel on TPU when the shape qualifies
    (lane dim multiple of 128, sublane-tileable height), else the XLA path.

    gate: optional [N]/[N, 1] blend weights — images whose gate is exactly
    0 return zeros (their one-hot blend contribution is zero regardless,
    reference agent.py:154).  On the Pallas path the kernel skips their
    121-offset accumulation entirely; the XLA path masks the output so both
    paths agree value-for-value.
    """
    import jax

    n, height, width, _ = rgb.shape
    if (use_pallas and jax.default_backend() == "tpu"
            and width % 128 == 0 and height % 8 == 0):
        from adaptiveisp_tpu.ops.pallas.nlm import nlm_gray_pallas

        return nlm_gray_pallas(rgb, h, gate=gate)
    out = nlm_gray(rgb, h)
    if gate is not None:
        import jax.lax

        on = jax.lax.stop_gradient(
            jnp.asarray(gate, rgb.dtype).reshape(n, 1, 1, 1)) != 0
        out = jnp.where(on, out, 0.0)
    return out


def _box_sum_reflect(x, window_size: int):
    """Box sum over H, W with REFLECT boundary (the unfold variant's
    semantics, reference denoise.py:150-153: the per-offset squared
    differences are reflect-padded before the window aggregation).

    Separable: pad once, then ws row-slices + ws column-slices."""
    pad = (window_size - 1) // 2
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    row = xp[:, 0:h, :, :]
    for i in range(1, window_size):
        row = row + xp[:, i:i + h, :, :]
    out = row[:, :, 0:w, :]
    for j in range(1, window_size):
        out = out + row[:, :, j:j + w, :]
    return out


def nlm_param(rgb, h, search_window_size: int = 21):
    """Learnable-strength unfold NLM (reference NonLocalMeansParam,
    denoise.py:122-181).

    Differences from :func:`nlm_gray`, matching the reference variant:
      * boundary handling is REFLECT (``F.pad(..., mode='reflect')`` +
        ``unfold``), not circular roll;
      * the distance aggregation window is the full *search* window
        (the reference's second ``unfold`` uses ``search_window_size``,
        denoise.py:152 — its ``patch_size`` ``box_sum`` is constructed but
        unused in ``forward``);
      * ``h`` is a single learnable scalar (an ``nn.Parameter`` there; a
        traced scalar/[1] argument here so optax can own it).

    rgb: [N, H, W, 3]; h: scalar or [1].  Returns [N, H, W, 3] in [0, 1].
    """
    ws = search_window_size
    pad = (ws - 1) // 2
    n, height, width, _ = rgb.shape
    y = rgb_to_luminance(rgb)  # [N, H, W, 1]
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    y_pad = jnp.pad(y, pads, mode="reflect")
    rgb_pad = jnp.pad(rgb, pads, mode="reflect")
    hh = jnp.maximum(jnp.reshape(h, ()), 0.0) + EPS

    # per-offset squared luminance differences, stacked on channels so the
    # reflect box sum runs ONCE over all K = ws*ws offsets
    dis0 = jnp.concatenate(
        [(y - y_pad[:, dy:dy + height, dx:dx + width, :]) ** 2
         for dy in range(ws) for dx in range(ws)], axis=-1)  # [N,H,W,K]
    dist = _safe_sqrt(_box_sum_reflect(dis0, ws))
    weights = jnp.exp(-dist / hh)  # [N, H, W, K]

    denoised = jnp.zeros_like(rgb)
    k = 0
    for dy in range(ws):
        for dx in range(ws):
            denoised = denoised + (
                weights[..., k:k + 1]
                * rgb_pad[:, dy:dy + height, dx:dx + width, :])
            k += 1
    return jnp.clip(denoised / jnp.sum(weights, axis=-1, keepdims=True),
                    0.0, 1.0)


def nlm_rgb(rgb, h, search_window_size: int = 21, patch_size: int = 7):
    """RGB-distance non-local means (reference NonLocalMeans, :68-90)."""
    r = search_window_size // 2
    hh = jnp.maximum(h, 0.0)[:, None, None, :] + EPS

    weights = jnp.zeros_like(rgb)
    denoised = jnp.zeros_like(rgb)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            shifted = jnp.roll(rgb, (dy, dx), axis=(1, 2))
            dist = _safe_sqrt(box_sum((rgb - shifted) ** 2, patch_size))
            w = jnp.exp(-dist / hh)
            denoised = denoised + shifted * w
            weights = weights + w
    return jnp.clip(denoised / weights, 0.0, 1.0)
