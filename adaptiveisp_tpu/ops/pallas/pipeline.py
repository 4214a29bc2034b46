"""Fused scripted-ISP-pipeline Pallas kernel.

``bank.render_pipeline`` chains K filters as separate XLA ops: each stage
reads and writes the full image in HBM (2K passes).  This kernel applies the
whole static chain to a VMEM row tile in one pass — one HBM read + one write
regardless of chain length.  Everything the per-stage jnp ops compute is
replicated exactly (``Filter.run`` semantics, /root/reference/isp/filters.py:
128-139: no inter-stage clipping; only ops with internal clips clip).

Supported stages: every pointwise filter (exposure, gamma, improved_wb, ccm,
tone, color, contrast, wnb, saturation_plus) plus the 3x3 sharpen (row halo,
border-keep VALID-conv semantics, sharpen.py:105-142).  NLM is its own
kernel (:mod:`adaptiveisp_tpu.ops.pallas.nlm`); the dispatcher splits
pipelines at NLM/unsupported stages.

Params are squashed per stage and concatenated per sample into an SMEM
vector, so one compiled kernel serves any parameter values.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN2 = math.log(2.0)
HALO_ALLOC = 4  # rows each side; supports up to 4 sharpen stages, 8-aligned

POINTWISE = {
    "exposure", "gamma", "improved_wb", "ccm", "tone", "color", "contrast",
    "wnb", "saturation_plus",
}
FUSABLE = POINTWISE | {"sharpen", "sharpen_v2"}


def _lum(r, g, b):
    return 0.27 * r + 0.67 * g + 0.06 * b


def _apply_pointwise(name, r, g, b, p):
    """One pointwise stage on channel planes; p is the squashed param slice."""
    if name == "exposure":
        s = jnp.exp(p[0] * LN2)
        return r * s, g * s, b * s
    if name == "gamma":
        gam = p[0]
        f = lambda x: jnp.exp(gam * jnp.log(jnp.maximum(x, 0.001)))
        return f(r), f(g), f(b)
    if name == "improved_wb":
        return r * p[0], g * p[1], b * p[2]
    if name == "ccm":
        rows = [(p[3 * k], p[3 * k + 1], p[3 * k + 2]) for k in range(3)]
        sums = [rk[0] + rk[1] + rk[2] for rk in rows]
        m = [[rows[k][c] / sums[k] for c in range(3)] for k in range(3)]
        return (r * m[0][0] + g * m[0][1] + b * m[0][2],
                r * m[1][0] + g * m[1][1] + b * m[1][2],
                r * m[2][0] + g * m[2][1] + b * m[2][2])
    if name == "tone":
        curve = p
        scale = 8.0 / (sum(curve[i] for i in range(8)) + 1e-30)

        def tone1(x):
            total = jnp.zeros_like(x)
            for i in range(8):
                total = total + jnp.clip(x - i / 8.0, 0.0, 1.0 / 8.0) * curve[i]
            return total * scale

        return tone1(r), tone1(g), tone1(b)
    if name == "color":
        sums = [sum(p[i * 3 + c] for i in range(8)) + 1e-30 for c in range(3)]

        def curve1(x, c):
            total = jnp.zeros_like(x)
            for i in range(8):
                total = total + jnp.clip(x - i / 8.0, 0.0, 1.0 / 8.0) * p[i * 3 + c]
            return total * (8.0 / sums[c])

        return curve1(r, 0), curve1(g, 1), curve1(b, 2)
    if name == "contrast":
        lum = jnp.clip(_lum(r, g, b), 0.0, 1.0)
        clum = -jnp.cos(math.pi * lum) * 0.5 + 0.5
        ratio = clum / (lum + 1e-6)
        t = p[0]
        return ((1 - t) * r + t * r * ratio,
                (1 - t) * g + t * g * ratio,
                (1 - t) * b + t * b * ratio)
    if name == "wnb":
        lum = _lum(r, g, b)
        t = p[0]
        return ((1 - t) * r + t * lum, (1 - t) * g + t * lum,
                (1 - t) * b + t * lum)
    if name == "saturation_plus":
        rc = jnp.clip(r, 0.0, 1.0)
        gc = jnp.clip(g, 0.0, 1.0)
        bc = jnp.clip(b, 0.0, 1.0)
        eps = 1e-8
        maxc = jnp.maximum(rc, jnp.maximum(gc, bc))
        minc = jnp.minimum(rc, jnp.minimum(gc, bc))
        rng = maxc - minc + eps
        hue = jnp.zeros_like(maxc)
        hue = jnp.where(bc == maxc, 4.0 + (rc - gc) / rng, hue)
        hue = jnp.where(gc == maxc, 2.0 + (bc - rc) / rng, hue)
        hue = jnp.where(rc == maxc, ((gc - bc) / rng) % 6.0, hue)
        hue = jnp.where(minc == maxc, 0.0, hue)
        h = hue / 6.0
        s = jnp.where(maxc == 0, 0.0, (maxc - minc) / (maxc + eps))
        v = maxc
        s2 = s + (1 - s) * (0.5 - jnp.abs(0.5 - v)) * 0.8
        h6 = (h % 1.0) * 6.0
        hi = jnp.floor(h6)
        f = h6 - hi
        s2 = jnp.clip(s2, 0.0, 1.0)
        vv = jnp.clip(v, 0.0, 1.0)
        pp = vv * (1.0 - s2)
        qq = vv * (1.0 - f * s2)
        tt = vv * (1.0 - (1.0 - f) * s2)

        def pick(c0, c1, c2, c3, c4, c5):
            out = jnp.zeros_like(h6)
            for k, c in enumerate((c0, c1, c2, c3, c4, c5)):
                out = jnp.where(hi == k, c, out)
            return out

        fr = pick(vv, qq, pp, pp, tt, vv)
        fg = pick(tt, vv, vv, qq, pp, pp)
        fb = pick(pp, pp, tt, vv, vv, qq)
        t = p[0]
        return (rc * (1 - t) + fr * t, gc * (1 - t) + fg * t,
                bc * (1 - t) + fb * t)
    raise ValueError(f"unsupported pointwise stage {name}")


def _sharpen_plane(x, width, row0_global, img_h, v2: bool, factor):
    """3x3 centre-5 blur + border-keep on one plane [rows, W] -> [rows-2, W].

    row0_global: global image row of the OUTPUT's first row.
    """
    rows = x.shape[0] - 2
    k_edge, k_mid = 1.0 / 13.0, 5.0 / 13.0
    up, mid, dn = x[0:rows], x[1:rows + 1], x[2:rows + 2]

    def lroll(a, s):
        return pltpu.roll(a, s % width, axis=1)

    blurred = (k_edge * (lroll(up, 1) + up + lroll(up, -1)
                         + lroll(mid, 1) + lroll(mid, -1)
                         + lroll(dn, 1) + dn + lroll(dn, -1))
               + k_mid * mid)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) + row0_global
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    border = ((grow <= 0) | (grow >= img_h - 1)
              | (gcol == 0) | (gcol == width - 1))
    blurred = jnp.where(border, mid, blurred)
    if v2:
        out = mid + (mid - blurred) * factor
    else:
        out = mid * factor + blurred * (1.0 - factor)
    return jnp.clip(out, 0.0, 1.0)


def _pipeline_kernel(params_ref, ext_ref, out_ref, *, names, offsets,
                     tile: int, width: int, img_h: int, halo: int):
    n_i = pl.program_id(0)
    t_i = pl.program_id(1)

    ext = ext_ref[0]  # [3, tile + 2*halo(+pad), W]
    r, g, b = ext[0], ext[1], ext[2]
    lead = halo  # context rows before output row 0

    for name, off in zip(names, offsets):
        p = tuple(params_ref[n_i, j] for j in range(off[0], off[1]))
        if name in ("sharpen", "sharpen_v2"):
            # drop trailing alignment rows so each sharpen consumes exactly
            # one row from each side
            keep = lead + tile + lead  # symmetric context
            row0 = t_i * tile - (lead - 1)
            r = _sharpen_plane(r[:keep], width, row0, img_h,
                               name == "sharpen_v2", p[0])
            g = _sharpen_plane(g[:keep], width, row0, img_h,
                               name == "sharpen_v2", p[0])
            b = _sharpen_plane(b[:keep], width, row0, img_h,
                               name == "sharpen_v2", p[0])
            lead -= 1
        else:
            r, g, b = _apply_pointwise(name, r, g, b, p)

    out_ref[0, 0] = r[lead:lead + tile]
    out_ref[0, 1] = g[lead:lead + tile]
    out_ref[0, 2] = b[lead:lead + tile]


def _plan(stage_names: Sequence[str]):
    from adaptiveisp_tpu.ops.bank import REGISTRY

    offsets = []
    total = 0
    for name in stage_names:
        n = REGISTRY[name].n_params
        offsets.append((total, total + n))
        total += n
    return offsets, max(total, 1)


@functools.partial(jax.jit,
                   static_argnames=("names", "interpret", "img_shape"))
def _run_fused(params, ext, names, img_shape, interpret: bool):
    n, height, width = img_shape
    names = list(names)
    n_sharpen = sum(nm in ("sharpen", "sharpen_v2") for nm in names)
    halo = HALO_ALLOC if n_sharpen else 0
    tile = _pick_tile(height)
    win = tile + 2 * halo
    offsets, _ = _plan(names)

    kernel = functools.partial(
        _pipeline_kernel, names=tuple(names), offsets=tuple(offsets),
        tile=tile, width=width, img_h=height, halo=halo)
    out = pl.pallas_call(
        kernel,
        grid=(n, height // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, win, width), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile, width), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, height, width), jnp.float32),
        interpret=interpret,
    )(params, ext)
    return jnp.transpose(out, (0, 2, 3, 1))


def render_pipeline_fused(cfg, img, stages: Sequence[Tuple[str, jnp.ndarray]],
                          interpret: bool = False):
    """Single-pass fused render of a static (name, squashed-params) chain.

    img: [N, H, W, 3] float32; each stage's params broadcastable to
    [N, n_params].  Exact ``bank.render_pipeline`` chain semantics.
    """
    n, height, width, _ = img.shape
    names = tuple(s[0] for s in stages)
    assert all(nm in FUSABLE for nm in names), names
    n_sharpen = sum(nm in ("sharpen", "sharpen_v2") for nm in names)
    assert n_sharpen <= HALO_ALLOC, "too many sharpen stages to fuse"

    offsets, total = _plan(names)
    if stages:
        parts = []
        for i, (_, p) in enumerate(stages):
            p = jnp.asarray(p, jnp.float32).reshape(
                (p.shape[0] if hasattr(p, "shape") and p.ndim else 1, -1))
            parts.append(jnp.broadcast_to(
                p, (n, offsets[i][1] - offsets[i][0])))
        params = jnp.concatenate(parts, axis=1)
    else:
        params = jnp.zeros((n, 1), jnp.float32)

    x = jnp.transpose(img, (0, 3, 1, 2))  # [N, 3, H, W]
    tile = _pick_tile(height)
    if n_sharpen:
        halo = HALO_ALLOC
        top = jnp.repeat(x[:, :, :1, :], halo, 2)
        bot = jnp.repeat(x[:, :, -1:, :], halo, 2)
        ext = jnp.concatenate([top, x, bot], axis=2)
        win = tile + 2 * halo
        num = height // tile
        wins = [ext[:, :, t * tile:t * tile + win, :] for t in range(num)]
        ext = jnp.concatenate(wins, axis=2)
    else:
        ext = x
    return _run_fused(params, ext, names, (n, height, width), interpret)


def _pick_tile(h: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if h % t == 0:
            return t
    return h


def fused_run(cfg, img, stages):
    """Differentiable fused run: forward = the Pallas kernel, backward =
    vjp through the stage-by-stage XLA chain (exact same math)."""
    names = tuple(s[0] for s in stages)
    params = tuple(jnp.asarray(s[1], jnp.float32) for s in stages)

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def run(img, params):
        return render_pipeline_fused(
            cfg, img, list(zip(names, params)))

    def run_fwd(img, params):
        return run(img, params), (img, params)

    def run_bwd(res, g):
        from adaptiveisp_tpu.ops import bank

        img, params = res

        def chain(img, params):
            out = img
            for name, p in zip(names, params):
                out = bank.render_fixed(cfg, out, name, p)
            return out

        _, vjp = jax.vjp(chain, img, params)
        return vjp(g)

    run.defvjp(run_fwd, run_bwd)
    return run(img, params)
