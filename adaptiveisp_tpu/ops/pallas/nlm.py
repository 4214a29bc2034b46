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


def _prologue(ext_ref, y_ref):
    """Shared kernel prologue: build the luminance plane."""
    rc = jnp.clip(ext_ref[0], 0.0, 1.0)
    y_ref[...] = 0.299 * rc[0] + 0.587 * rc[1] + 0.114 * rc[2]


# Per-image gating: ``gate_ref`` is an [N, 1] SMEM plane; images whose gate
# is exactly 0 write zero outputs and skip the 121-offset accumulation
# entirely.  In the training blend every candidate is multiplied by a hard
# one-hot weight (reference agent.py:154), so ~(K-1)/K of the batch pays the
# NLM cost for a contribution that is exactly zero — the gate skips that
# work while remaining correct for ARBITRARY blend weights (zero weight ⇒
# zero contribution; nonzero weight ⇒ full kernel, identical arithmetic).
# Measured on v5e (tools/bench_gated_nlm.py, 8x512x512 fwd+bwd): all-on
# 23.6 ms → 3.4 ms with a 1/8-selected gate (6.96×); outputs and grads of
# the selected image bitwise equal, gated-off grads exactly zero.


def _box5(row, width: int):
    """Horizontal 5-tap box sum via lane rolls (circular)."""
    return (pltpu.roll(row, width - 2, axis=1)
            + pltpu.roll(row, width - 1, axis=1)
            + row + pltpu.roll(row, 1, axis=1)
            + pltpu.roll(row, 2, axis=1))


def _epilogue(out_ref, wsum_ref, acc_ref):
    """Shared normalize stores: UNCLIPPED ratio + the weight sum (the
    final clip lives outside the kernel so the custom backward can reuse
    jax's own clip vjp semantics)."""
    inv = 1.0 / acc_ref[0]
    out_ref[0, 0] = acc_ref[1] * inv
    out_ref[0, 1] = acc_ref[2] * inv
    out_ref[0, 2] = acc_ref[3] * inv
    wsum_ref[0, 0] = acc_ref[0]


def _nlm_kernel(h_ref, gate_ref, ext_ref, out_ref, wsum_ref, y_ref, acc_ref,
                *, tile: int, width: int):
    """One (image, row-tile) grid step.

    h_ref: [N, 1] SMEM strengths (whole array; indexed by grid position);
    gate_ref: [N, 1] SMEM blend gates (0 ⇒ skip, see gating note above);
    ext_ref: [1, 3, tile+WIN_EXTRA, W] VMEM (halo included, circularly padded
    on host); out_ref: [1, 3, tile, W] VMEM.
    Scratch: y_ref [tile+2*HALO+2, W] luminance; acc_ref [4, tile, W]
    (w, r, g, b) accumulators.  VMEM-resident accumulators keep the 121-way
    unrolled loop's live ranges to one iteration (a pure-SSA accumulation
    spilled ~145MB of registers).
    """
    # program_id reads stay OUTSIDE the pl.when branches (no lowering rule
    # for program_id inside the branch in interpret mode)
    hh = jnp.maximum(h_ref[pl.program_id(0), 0], 0.0) + EPS
    g = gate_ref[pl.program_id(0), 0]

    @pl.when(g == 0.0)
    def _skip():
        out_ref[...] = jnp.zeros_like(out_ref)
        wsum_ref[...] = jnp.zeros_like(wsum_ref)

    @pl.when(g != 0.0)
    def _run():
        _prologue(ext_ref, y_ref)

        acc_ref[...] = jnp.zeros_like(acc_ref)

        # Fully unrolled 121-offset accumulation.  Mosaic hoists the shifted
        # loads, so live values scale with tile size — tile=8 keeps the
        # scoped VMEM (spill) usage inside the 16M budget (see _pick_tile).
        for dy in range(-SEARCH_R, SEARCH_R + 1):
            yc = y_ref[HALO - PATCH_R:HALO + tile + PATCH_R]
            ys_rows = y_ref[HALO - PATCH_R - dy:HALO + tile + PATCH_R - dy]
            for dx in range(-SEARCH_R, SEARCH_R + 1):
                ys = pltpu.roll(ys_rows, dx % width, axis=1)
                d2 = (yc - ys) ** 2  # [tile+4, W]
                row = (d2[0:tile] + d2[1:tile + 1] + d2[2:tile + 2]
                       + d2[3:tile + 3] + d2[4:tile + 4])  # [tile, W]
                w = jnp.exp(
                    -jnp.sqrt(jnp.maximum(_box5(row, width), 0.0)) / hh)
                acc_ref[0] += w
                for c in range(3):
                    acc_ref[1 + c] += w * pltpu.roll(
                        ext_ref[0, c, HALO - dy:HALO + tile - dy, :],
                        dx % width, axis=1)

        _epilogue(out_ref, wsum_ref, acc_ref)


def _nlm_kernel_sym(h_ref, gate_ref, ext_ref, out_ref, wsum_ref, y_ref,
                    acc_ref, *, tile: int, width: int):
    """Symmetry-halved variant of :func:`_nlm_kernel`.

    NLM weights satisfy w_{-d}(p) = (S_{-d} w_d)(p) — the weight of the
    mirrored offset is the shifted weight of the offset itself (substitute
    q -> q+d in the patch distance).  Computing w_d once on tile+dy rows
    therefore serves BOTH d and -d, halving the distance/sqrt/exp work
    (the kernel's dominant cost): 60 computed offsets + the center instead
    of 121.  Identical math, different summation order (~1e-6 vs the
    reference chain).
    """
    hh = jnp.maximum(h_ref[pl.program_id(0), 0], 0.0) + EPS
    g = gate_ref[pl.program_id(0), 0]

    @pl.when(g == 0.0)
    def _skip():
        out_ref[...] = jnp.zeros_like(out_ref)
        wsum_ref[...] = jnp.zeros_like(wsum_ref)

    @pl.when(g != 0.0)
    def _run():
        _prologue(ext_ref, y_ref)

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
            ys = pltpu.roll(y_ref[lo - dy:lo - dy + n_d2], dx % width,
                            axis=1)
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
                    wf * pltpu.roll(
                        ext_ref[0, c, HALO - dy:HALO + tile - dy, :],
                        dx % width, axis=1)
                    + wb * pltpu.roll(
                        ext_ref[0, c, HALO + dy:HALO + tile + dy, :],
                        (-dx) % width, axis=1))

        _epilogue(out_ref, wsum_ref, acc_ref)


def _pick_tile(h: int) -> int:
    # Mosaic hoists the 121-way unrolled shifted loads, so scoped VMEM grows
    # with tile size (~35M at tile 32, needs the raised vmem_limit below);
    # tile 32 measured fastest (2.65 ms vs 4.69 at tile 8 for 4x512x512 —
    # less halo re-reading), tile 64 exceeds the 128M budget.
    for t in (32, 16, 8, 64, 128):
        if h % t == 0:
            return t
    return h


def nlm_gray_pallas(rgb, h, gate=None, sym: bool = False):
    """Gray-guided NLM, Pallas single-pass edition (differentiable).

    rgb: [N, H, W, 3] float32 in [0,1]; h: [N, 1].  Returns NHWC.
    Forward AND backward are fused Pallas kernels (the backward recomputes
    the per-offset weights on-chip; residuals are just the forward's U and
    weight-sum planes).  The XLA-recompute backward it replaces cost ~79 ms
    at batch 8 @ 512px vs ~6 ms forward — it dominated the RL train step.

    gate: optional [N] or [N, 1] blend weights; images whose gate is
    exactly 0 skip the kernel and return zeros (their blend contribution is
    zero regardless, reference agent.py:154) — in the training blend this
    cuts the NLM cost to the ~1/K of the batch that actually selected it.
    None means all-on.

    sym selects the symmetry-halved forward (equal speed on v5e; see
    _nlm_forward).  Two separately-decorated custom_vjp entries rather
    than a nondiff_argnums flag: a defaulted nondiff positional mis-binds
    the vjp arguments when the caller omits it.
    """
    gate = _canon_gate(gate, rgb.shape[0])
    return (_nlm_pallas_sym(rgb, h, gate) if sym
            else _nlm_pallas_base(rgb, h, gate))


def _canon_gate(gate, n):
    if gate is None:
        return jnp.ones((n, 1), jnp.float32)
    gate = jnp.asarray(gate, jnp.float32)
    # stop_gradient: the gate is a selection constant (a sampled one-hot
    # column); it must not open a differentiation path of its own
    return jax.lax.stop_gradient(gate.reshape(n, 1))


def _nlm_vjp_fwd(rgb, h, gate, sym):
    u, wsum = _nlm_forward_uw(rgb, h, gate, sym=sym)
    return jnp.clip(u, 0.0, 1.0), (rgb, h, gate, u, wsum)


def _nlm_vjp_bwd(residuals, g):
    """Fused Pallas backward; jax's own vjps wrap the clip and the h-relu
    so tie-gradient semantics match the XLA autodiff exactly."""
    rgb, h, gate, u, wsum = residuals
    _, clip_vjp = jax.vjp(lambda x: jnp.clip(x, 0.0, 1.0), u)
    v = clip_vjp(g)[0]
    drgb, dhh = _nlm_backward(rgb, h, gate, v, u, wsum)
    _, relu_vjp = jax.vjp(lambda x: jnp.maximum(x, 0.0), h)
    return drgb, relu_vjp(dhh)[0], jnp.zeros_like(gate)


@jax.custom_vjp
def _nlm_pallas_base(rgb, h, gate):
    return _nlm_forward(rgb, h, gate, sym=False)


_nlm_pallas_base.defvjp(lambda rgb, h, gate: _nlm_vjp_fwd(rgb, h, gate,
                                                          False),
                        _nlm_vjp_bwd)


@jax.custom_vjp
def _nlm_pallas_sym(rgb, h, gate):
    return _nlm_forward(rgb, h, gate, sym=True)


_nlm_pallas_sym.defvjp(lambda rgb, h, gate: _nlm_vjp_fwd(rgb, h, gate, True),
                       _nlm_vjp_bwd)


def nlm_gray_pallas_interpret(rgb, h, gate=None, sym: bool = False):
    """Interpreter-mode entry for CPU tests."""
    gate = _canon_gate(gate, rgb.shape[0])
    return _nlm_forward(rgb, h, gate, interpret=True, sym=sym)


@functools.partial(jax.jit, static_argnames=("interpret", "sym"))
def _nlm_forward(rgb, h, gate, interpret: bool = False, sym: bool = False):
    u, _ = _nlm_forward_uw(rgb, h, gate, interpret=interpret, sym=sym)
    return jnp.clip(u, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("interpret", "sym"))
def _nlm_forward_uw(rgb, h, gate, interpret: bool = False,
                    sym: bool = False):
    """Forward returning (UNCLIPPED ratio, weight sum) — the backward's
    residuals.  sym=True halves the distance/sqrt/exp work via weight
    symmetry but measured EQUAL on v5e (2.54 vs 2.51 ms at 4x512x512): the
    kernel is bound by lane rolls / sublane-shifted copies, not the
    transcendental math.  Kept for hardware where exp is the bottleneck."""
    n, height, width, _ = rgb.shape
    tile = _pick_tile(height)

    x = jnp.transpose(rgb, (0, 3, 1, 2))  # [N, 3, H, W]
    # circular row halo on host: rows [-HALO, H+HALO)
    ext = jnp.concatenate(
        [x[:, :, -HALO:, :], x, x[:, :, :HALO, :]], axis=2)

    grid = (n, height // tile)
    kernel = functools.partial(_nlm_kernel_sym if sym else _nlm_kernel,
                               tile=tile, width=width)
    out, wsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, tile + WIN_EXTRA, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, tile, width), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, width), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3, height, width), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, height, width), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + WIN_EXTRA, width), jnp.float32),
            pltpu.VMEM((4, tile, width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h.astype(jnp.float32), gate, _overlap_rows(ext, tile, height))
    return (jnp.transpose(out, (0, 2, 3, 1)),
            jnp.transpose(wsum, (0, 2, 3, 1)))


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


# --------------------------------------------------------------------------- #
# Fused Pallas BACKWARD
# --------------------------------------------------------------------------- #
# The XLA-recompute backward materialized ~121 full-size intermediates in
# HBM (~79 ms at batch 8 @ 512px vs 6 ms forward).  This kernel recomputes
# each offset's weight chain in VMEM and accumulates all four adjoint
# paths on-chip:
#   U = O / W,  O = sum_d w_d * S_d(rgb),  W = sum_d w_d,
#   w_d = exp(-sqrt_safe(box5x5((y - S_d y)^2)) / hh),  y = lum(clip(rgb))
# with cotangent v (already through the output-clip vjp):
#   a_c = v_c / W                       (dL/dO_c)
#   q   = -(sum_c v_c U_c) / W          (dL/dW)
#   dL/drgb_c += S_{-d}(w_d * a_c)                       [direct intensity]
#   g_w = sum_c a_c * S_d(rgb_c) + q                     (dL/dw_d)
#   dL/dhh += sum g_w * w_d * s_d / hh^2                 [strength]
#   db = where(b > 0, -0.5 * g_w * w / (hh * s), 0)      (dL/db, safe-sqrt)
#   dd2 = box5x5(db)        (the box sum is self-adjoint)
#   dL/dy += 2 (y - S_d y) * dd2  -  S_{-d}(2 (y - S_d y) * dd2)
# and finally dL/drgb_c += lum_c * clipmask(rgb_c) * dL/dy.
# Cross-tile adjoint flow is handled by GATHERING: each tile recomputes
# the per-offset chain for 7 neighbor rows on each side (db rows
# [-7, tile+7)), so no tile ever scatters into another tile's output.

HALO_BY = 16   # ext/y halo for the backward (needs >= 14; 16 aligns)
HALO_BC = 8    # cotangent/U/W halo (needs >= 7; 8 aligns)


def _clip_mask(x):
    """vjp mask of clip(x, 0, 1) with jax's tie semantics (0.5 at exact
    bounds, from minimum/maximum's split gradient)."""
    inside = ((x > 0.0) & (x < 1.0)).astype(x.dtype)
    tie = ((x == 0.0) | (x == 1.0)).astype(x.dtype)
    return inside + 0.5 * tie


def _nlm_bwd_kernel(h_ref, gate_ref, ext_ref, v_ref, u_ref, wsum_ref,
                    drgb_ref, dh_ref, y_ref, aq_ref, acc_ref, *,
                    tile: int, width: int):
    i, t = pl.program_id(0), pl.program_id(1)
    hh = jnp.maximum(h_ref[i, 0], 0.0) + EPS
    g = gate_ref[i, 0]

    @pl.when(g == 0.0)
    def _skip():
        # gated-off images contributed 0 to the blend: their cotangent is
        # exactly zero AND the forward stored wsum == 0 (1/wsum would be
        # inf) — write zero grads and skip the chain recompute
        drgb_ref[...] = jnp.zeros_like(drgb_ref)
        dh_ref[i, t] = 0.0

    @pl.when(g != 0.0)
    def _run():
        rc = jnp.clip(ext_ref[0], 0.0, 1.0)
        y_ref[...] = 0.299 * rc[0] + 0.587 * rc[1] + 0.114 * rc[2]

        inv_w = 1.0 / wsum_ref[0, 0]
        for c in range(3):
            aq_ref[c] = v_ref[0, c] * inv_w
        aq_ref[3] = -(v_ref[0, 0] * u_ref[0, 0] + v_ref[0, 1] * u_ref[0, 1]
                      + v_ref[0, 2] * u_ref[0, 2]) * inv_w

        acc_ref[...] = jnp.zeros_like(acc_ref)

        nb = tile + 14          # chain rows [-7, tile+7)
        nd2 = nb + 4            # d2 rows [-9, tile+9)
        for dy in range(-SEARCH_R, SEARCH_R + 1):
            yc = y_ref[HALO_BY - 9:HALO_BY - 9 + nd2]
            ys_rows = y_ref[HALO_BY - 9 - dy:HALO_BY - 9 - dy + nd2]
            for dx in range(-SEARCH_R, SEARCH_R + 1):
                ys = pltpu.roll(ys_rows, dx % width, axis=1)
                diff = yc - ys
                d2 = diff * diff                       # rows [-9, tile+9)
                row = (d2[0:nb] + d2[1:nb + 1] + d2[2:nb + 2]
                       + d2[3:nb + 3] + d2[4:nb + 4])  # rows [-7, tile+7)
                b = _box5(row, width)
                pos = b > 0.0
                s = jnp.sqrt(jnp.where(pos, b, 1.0))
                w = jnp.exp(-jnp.where(pos, s, 0.0) / hh)

                g_w = aq_ref[3, HALO_BC - 7:HALO_BC + tile + 7]
                for c in range(3):
                    srgb = pltpu.roll(
                        ext_ref[0, c,
                                HALO_BY - 7 - dy:HALO_BY + tile + 7 - dy],
                        dx % width, axis=1)
                    g_w = g_w + aq_ref[
                        c, HALO_BC - 7:HALO_BC + tile + 7] * srgb

                gww = g_w * w
                acc_ref[4] += (gww * jnp.where(pos, s, 0.0))[7:7 + tile]

                db = jnp.where(pos, -0.5 * gww / (hh * s), 0.0)
                dd2r = (db[0:tile + 10] + db[1:tile + 11] + db[2:tile + 12]
                        + db[3:tile + 13] + db[4:tile + 14])
                dd2 = _box5(dd2r, width)               # rows [-5, tile+5)
                z1 = 2.0 * diff[4:4 + tile + 10] * dd2
                acc_ref[3] += z1[5:5 + tile]
                acc_ref[3] -= pltpu.roll(z1[5 + dy:5 + dy + tile],
                                         (-dx) % width, axis=1)

                for c in range(3):
                    wa = w * aq_ref[c, HALO_BC - 7:HALO_BC + tile + 7]
                    acc_ref[c] += pltpu.roll(wa[7 + dy:7 + dy + tile],
                                             (-dx) % width, axis=1)

        lum = (0.299, 0.587, 0.114)
        for c in range(3):
            x = ext_ref[0, c, HALO_BY:HALO_BY + tile]
            drgb_ref[0, c] = acc_ref[c] + lum[c] * _clip_mask(x) * acc_ref[3]
        # whole [n, ntiles] partial-sum table rides along as one SMEM block
        # (per-grid-step (1,1) blocks fail the mosaic block-shape rule)
        dh_ref[i, t] = jnp.sum(acc_ref[4]) / (hh * hh)


def _overlap_rows_g(padded, tile: int, height: int, halo: int):
    """Generic overlapping-window materialisation: padded [N, C, H+2*halo,
    W] -> windows of (tile + 2*halo) rows per tile, concatenated."""
    num = height // tile
    win = tile + 2 * halo
    return jnp.concatenate(
        [padded[:, :, t * tile:t * tile + win, :] for t in range(num)],
        axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nlm_backward(rgb, h, gate, v, u, wsum, interpret: bool = False):
    """Pallas backward: returns (dL/drgb NHWC, dL/dhh [N, 1])."""
    n, height, width, _ = rgb.shape
    # tile 32 measured 21.7 vs 29.7 ms fwd+bwd for 8x512x512 on v5e (less
    # halo re-reading, same as the forward's tile sweep); grads bitwise
    # equal to tile 16.  Scoped-VMEM stays inside the raised limit below.
    tile = min(_pick_tile(height), 32)

    def nchw_pad(x, halo):
        t = jnp.transpose(x, (0, 3, 1, 2))
        return jnp.concatenate(
            [t[:, :, -halo:, :], t, t[:, :, :halo, :]], axis=2)

    ext = _overlap_rows_g(nchw_pad(rgb, HALO_BY), tile, height, HALO_BY)
    vw = _overlap_rows_g(nchw_pad(v, HALO_BC), tile, height, HALO_BC)
    uw = _overlap_rows_g(nchw_pad(u, HALO_BC), tile, height, HALO_BC)
    ww = _overlap_rows_g(nchw_pad(wsum, HALO_BC), tile, height, HALO_BC)

    ntiles = height // tile
    grid = (n, ntiles)
    kernel = functools.partial(_nlm_bwd_kernel, tile=tile, width=width)
    drgb, dhp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, tile + 2 * HALO_BY, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile + 2 * HALO_BC, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile + 2 * HALO_BC, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile + 2 * HALO_BC, width),
                         lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, tile, width), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ntiles), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3, height, width), jnp.float32),
            jax.ShapeDtypeStruct((n, ntiles), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO_BY, width), jnp.float32),
            pltpu.VMEM((4, tile + 2 * HALO_BC, width), jnp.float32),
            pltpu.VMEM((5, tile, width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h.astype(jnp.float32), gate, ext, vw, uw, ww)
    return (jnp.transpose(drgb, (0, 2, 3, 1)),
            jnp.sum(dhp, axis=1, keepdims=True))
