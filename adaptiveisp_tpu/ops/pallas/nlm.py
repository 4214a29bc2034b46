"""Single-pass Pallas NLM denoise kernel.

The reference NLM is a python loop of 121 shifted elementwise chains over
HBM-resident tensors (/root/reference/isp/denoise.py:93-119) — every offset
re-reads the image.  SURVEY §2.6 calls this the single biggest fusion win.
This kernel streams each image row-tile into VMEM once (with a 7-row halo for
the 11x11 search window + 5x5 patch sum) and performs the full 121-offset
accumulation on-chip: one HBM read + one write per pixel instead of ~3000.

Semantics match :func:`adaptiveisp_tpu.ops.denoise.nlm_gray` bit-for-bit in
structure: circular boundary handling (host-side row halo padding + in-kernel
lane rolls), luminance distances, `exp(-sqrt(relu(boxsum)) / (relu(h)+eps))`
weights.

Layout: channels-leading [N, 3, H, W] inside the op (W in lanes, H in
sublanes); the public wrapper takes/returns NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
SEARCH_R = 5   # 11x11 search window
PATCH_R = 2    # 5x5 patch box sum
HALO = SEARCH_R + PATCH_R  # 7
WIN_EXTRA = 2 * HALO + 2   # window rows = tile + 16, sublane-aligned (8 | 16)


def _prologue(h_ref, ext_ref, y_ref):
    """Shared kernel prologue: clamp strength, build the luminance plane."""
    hh = jnp.maximum(h_ref[pl.program_id(0), 0], 0.0) + EPS
    rc = jnp.clip(ext_ref[0], 0.0, 1.0)
    y_ref[...] = 0.299 * rc[0] + 0.587 * rc[1] + 0.114 * rc[2]
    return hh


def _box5(row, width: int):
    """Horizontal 5-tap box sum via lane rolls (circular)."""
    return (pltpu.roll(row, width - 2, axis=1)
            + pltpu.roll(row, width - 1, axis=1)
            + row + pltpu.roll(row, 1, axis=1)
            + pltpu.roll(row, 2, axis=1))


def _epilogue(out_ref, acc_ref):
    """Shared normalize + clip stores."""
    inv = 1.0 / acc_ref[0]
    out_ref[0, 0] = jnp.clip(acc_ref[1] * inv, 0.0, 1.0)
    out_ref[0, 1] = jnp.clip(acc_ref[2] * inv, 0.0, 1.0)
    out_ref[0, 2] = jnp.clip(acc_ref[3] * inv, 0.0, 1.0)


def _nlm_kernel(h_ref, ext_ref, out_ref, y_ref, acc_ref, *, tile: int,
                width: int):
    """One (image, row-tile) grid step.

    h_ref: [N, 1] SMEM strengths (whole array; indexed by grid position);
    ext_ref: [1, 3, tile+WIN_EXTRA, W] VMEM (halo included, circularly padded
    on host); out_ref: [1, 3, tile, W] VMEM.
    Scratch: y_ref [tile+2*HALO+2, W] luminance; acc_ref [4, tile, W]
    (w, r, g, b) accumulators.  VMEM-resident accumulators keep the 121-way
    unrolled loop's live ranges to one iteration (a pure-SSA accumulation
    spilled ~145MB of registers).
    """
    hh = _prologue(h_ref, ext_ref, y_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # Fully unrolled 121-offset accumulation.  Mosaic hoists the shifted
    # loads, so live values scale with tile size — tile=8 keeps the scoped
    # VMEM (spill) usage inside the 16M budget (see _pick_tile).
    for dy in range(-SEARCH_R, SEARCH_R + 1):
        yc = y_ref[HALO - PATCH_R:HALO + tile + PATCH_R]
        ys_rows = y_ref[HALO - PATCH_R - dy:HALO + tile + PATCH_R - dy]
        for dx in range(-SEARCH_R, SEARCH_R + 1):
            ys = pltpu.roll(ys_rows, dx % width, axis=1)
            d2 = (yc - ys) ** 2  # [tile+4, W]
            row = (d2[0:tile] + d2[1:tile + 1] + d2[2:tile + 2]
                   + d2[3:tile + 3] + d2[4:tile + 4])  # [tile, W]
            w = jnp.exp(-jnp.sqrt(jnp.maximum(_box5(row, width), 0.0)) / hh)
            acc_ref[0] += w
            for c in range(3):
                acc_ref[1 + c] += w * pltpu.roll(
                    ext_ref[0, c, HALO - dy:HALO + tile - dy, :],
                    dx % width, axis=1)

    _epilogue(out_ref, acc_ref)


def _nlm_kernel_sym(h_ref, ext_ref, out_ref, y_ref, acc_ref, *, tile: int,
                    width: int):
    """Symmetry-halved variant of :func:`_nlm_kernel`.

    NLM weights satisfy w_{-d}(p) = (S_{-d} w_d)(p) — the weight of the
    mirrored offset is the shifted weight of the offset itself (substitute
    q -> q+d in the patch distance).  Computing w_d once on tile+dy rows
    therefore serves BOTH d and -d, halving the distance/sqrt/exp work
    (the kernel's dominant cost): 60 computed offsets + the center instead
    of 121.  Identical math, different summation order (~1e-6 vs the
    reference chain).
    """
    hh = _prologue(h_ref, ext_ref, y_ref)

    # center offset: w == exp(0) == 1
    acc_ref[0] = jnp.ones_like(acc_ref[0])
    for c in range(3):
        acc_ref[1 + c] = ext_ref[0, c, HALO:HALO + tile, :]

    # half set: dy in 1..R (all dx) plus dy == 0, dx in 1..R
    offsets = ([(0, dx) for dx in range(1, SEARCH_R + 1)]
               + [(dy, dx) for dy in range(1, SEARCH_R + 1)
                  for dx in range(-SEARCH_R, SEARCH_R + 1)])
    for dy, dx in offsets:
        # w_d needed on rows [0, tile+dy): the forward term reads rows
        # [0, tile), the mirrored term w_{-d}(p) = w_d(p+d) rows
        # [dy, tile+dy)
        n_w = tile + dy
        lo = HALO - PATCH_R                # first d2 row = -2
        n_d2 = n_w + 2 * PATCH_R
        yc = y_ref[lo:lo + n_d2]
        ys = pltpu.roll(y_ref[lo - dy:lo - dy + n_d2], dx % width, axis=1)
        d2 = (yc - ys) ** 2                # rows [-2, tile+dy+2)
        row = (d2[0:n_w] + d2[1:n_w + 1] + d2[2:n_w + 2]
               + d2[3:n_w + 3] + d2[4:n_w + 4])  # w rows [0, tile+dy)
        w = jnp.exp(-jnp.sqrt(jnp.maximum(_box5(row, width), 0.0)) / hh)

        wf = w[0:tile]                               # w_d at p
        wb = pltpu.roll(w[dy:dy + tile], (-dx) % width,
                        axis=1)                      # w_{-d} at p
        acc_ref[0] += wf + wb
        for c in range(3):
            acc_ref[1 + c] += (
                wf * pltpu.roll(ext_ref[0, c, HALO - dy:HALO + tile - dy, :],
                                dx % width, axis=1)
                + wb * pltpu.roll(
                    ext_ref[0, c, HALO + dy:HALO + tile + dy, :],
                    (-dx) % width, axis=1))

    _epilogue(out_ref, acc_ref)


def _pick_tile(h: int) -> int:
    # Mosaic hoists the 121-way unrolled shifted loads, so scoped VMEM grows
    # with tile size (~35M at tile 32, needs the raised vmem_limit below);
    # tile 32 measured fastest (2.65 ms vs 4.69 at tile 8 for 4x512x512 —
    # less halo re-reading), tile 64 exceeds the 128M budget.
    for t in (32, 16, 8, 64, 128):
        if h % t == 0:
            return t
    return h


def nlm_gray_pallas(rgb, h, sym: bool = False):
    """Gray-guided NLM, Pallas single-pass edition (differentiable).

    rgb: [N, H, W, 3] float32 in [0,1]; h: [N, 1].  Returns NHWC.
    Forward runs the fused kernel; the backward pass recomputes through the
    XLA reference implementation (custom_vjp), so training still
    differentiates exactly while inference/eval gets the single-pass speed.
    sym selects the symmetry-halved kernel (equal speed on v5e; see
    _nlm_forward).  Two separately-decorated custom_vjp entries rather
    than a nondiff_argnums flag: a defaulted nondiff positional mis-binds
    the vjp arguments when the caller omits it.
    """
    return _nlm_pallas_sym(rgb, h) if sym else _nlm_pallas_base(rgb, h)


def _nlm_vjp_bwd(residuals, g):
    from adaptiveisp_tpu.ops.denoise import nlm_gray

    rgb, h = residuals
    _, vjp = jax.vjp(nlm_gray, rgb, h)
    return vjp(g)


@jax.custom_vjp
def _nlm_pallas_base(rgb, h):
    return _nlm_forward(rgb, h, sym=False)


_nlm_pallas_base.defvjp(
    lambda rgb, h: (_nlm_forward(rgb, h, sym=False), (rgb, h)),
    _nlm_vjp_bwd)


@jax.custom_vjp
def _nlm_pallas_sym(rgb, h):
    return _nlm_forward(rgb, h, sym=True)


_nlm_pallas_sym.defvjp(
    lambda rgb, h: (_nlm_forward(rgb, h, sym=True), (rgb, h)),
    _nlm_vjp_bwd)


def nlm_gray_pallas_interpret(rgb, h, sym: bool = False):
    """Interpreter-mode entry for CPU tests."""
    return _nlm_forward(rgb, h, interpret=True, sym=sym)


@functools.partial(jax.jit, static_argnames=("interpret", "sym"))
def _nlm_forward(rgb, h, interpret: bool = False, sym: bool = False):
    # sym=True halves the distance/sqrt/exp work via weight symmetry but
    # measured EQUAL on v5e (2.54 vs 2.51 ms at 4x512x512): the kernel is
    # bound by lane rolls / sublane-shifted copies, not the transcendental
    # math, and the mirrored accumulation adds rolls back.  Kept for
    # hardware where exp is the bottleneck.
    n, height, width, _ = rgb.shape
    tile = _pick_tile(height)

    x = jnp.transpose(rgb, (0, 3, 1, 2))  # [N, 3, H, W]
    # circular row halo on host: rows [-HALO, H+HALO)
    ext = jnp.concatenate(
        [x[:, :, -HALO:, :], x, x[:, :, :HALO, :]], axis=2)

    grid = (n, height // tile)
    kernel = functools.partial(_nlm_kernel_sym if sym else _nlm_kernel,
                               tile=tile, width=width)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, tile + WIN_EXTRA, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile, width),
                               lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, height, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + WIN_EXTRA, width), jnp.float32),
            pltpu.VMEM((4, tile, width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h.astype(jnp.float32), _overlap_rows(ext, tile, height))
    return jnp.transpose(out, (0, 2, 3, 1))


def _overlap_rows(ext, tile: int, height: int):
    """Materialise overlapping row windows so a plain BlockSpec can index
    them: [N, 3, H+2*HALO, W] -> [N, 3, (H//tile) * (tile+2*HALO), W] where
    window t occupies rows [t*(tile+2*HALO), (t+1)*(tile+2*HALO)).
    """
    num = height // tile
    # 2 alignment rows beyond the halo so window height = tile+16 (8-aligned)
    ext = jnp.concatenate([ext, ext[:, :, -2:, :]], axis=2)
    wins = [ext[:, :, t * tile:t * tile + tile + WIN_EXTRA, :]
            for t in range(num)]
    return jnp.concatenate(wins, axis=2)
