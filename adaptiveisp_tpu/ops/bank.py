"""Filter registry and batched render paths.

The reference models each ISP op as an ``nn.Module`` subclass carrying its own
parameter-prediction head (/root/reference/isp/filters.py:37-212).  Here the op
library is a static registry of pure functions; the prediction heads belong to
the policy network (:mod:`adaptiveisp_tpu.policy.agent`), keeping the op layer
stateless and trivially jit/vmap-able.

Render paths:
  * ``render_candidates`` — all K candidates stacked (reference
    agent.py:103-116 semantics; used for parity tests and training blends).
  * ``render_blend``      — one-hot weighted sum of candidates (reference
    agent.py:154).  Gradients flow only through the selected branch because
    the one-hot is a constant, exactly as in the reference.
  * ``render_switch``     — computes only the selected branch via
    ``lax.switch``; mathematically identical to the blend (the selection never
    depends on the filtered outputs, only on the selector features), and ~K x
    cheaper when a whole (sub)batch shares one action — the batch-1 adaptive
    inference path (reference val_adaptiveisp.py:291-309).
  * ``render_fixed`` / ``render_pipeline`` — fixed-parameter rendering, the
    reference ``Filter.run`` (filters.py:128-139) and the scripted 5-stage
    pipelines used for baselines.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.ops import filters as F
from adaptiveisp_tpu.ops import masks as M
from adaptiveisp_tpu.ops.math import lerp


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    name: str
    short_name: str
    n_params: int
    squash: Callable  # (cfg, raw_feat[N, n_params]) -> params
    apply: Callable   # (cfg, img_nhwc, params) -> img_nhwc
    # gate-capable: apply accepts gate=[N] blend weights and may skip
    # images whose weight is exactly 0 (their blend contribution is zero).
    # Only worth plumbing for ops whose kernel cost dominates a render —
    # NLM denoise is ~10x every other filter (reference config.py:24).
    gated: bool = False


def _spec(name, short, n, squash, apply, gated=False):
    return FilterSpec(name, short, n, squash, apply, gated)


# Registry of every op the reference defines (filters.py:215-723), including
# the ones outside the default roster (color, sharpen_usm, sharpen_v2, tone_v2).
REGISTRY = {
    "exposure": _spec("exposure", "E", 1, F.squash_exposure, F.apply_exposure),
    "gamma": _spec("gamma", "G", 1, F.squash_gamma, F.apply_gamma),
    "ccm": _spec("ccm", "CCM", 9, F.squash_ccm, F.apply_ccm),
    "sharpen": _spec("sharpen", "Shr", 1, F.squash_sharpen, F.apply_sharpen),
    "sharpen_v2": _spec("sharpen_v2", "Shr", 1, F.squash_sharpen_v2,
                        F.apply_sharpen_v2),
    "sharpen_usm": _spec("sharpen_usm", "USM", 2, F.squash_sharpen_usm,
                         F.apply_sharpen_usm),
    "denoise": _spec("denoise", "NLM", 1, F.squash_denoise, F.apply_denoise,
                     gated=True),
    "tone": _spec("tone", "T", 8, F.squash_tone, F.apply_tone),
    "tone_v2": _spec("tone_v2", "T", 8, F.squash_tone_v2, F.apply_tone_v2),
    "contrast": _spec("contrast", "Ct", 1, F.squash_contrast,
                      F.apply_contrast),
    "saturation_plus": _spec("saturation_plus", "S+", 1,
                             F.squash_saturation_plus, F.apply_saturation_plus),
    "wnb": _spec("wnb", "BW", 1, F.squash_wnb, F.apply_wnb),
    "improved_wb": _spec("improved_wb", "W", 3, F.squash_improved_wb,
                         F.apply_improved_wb),
    "color": _spec("color", "C", 24, F.squash_color, F.apply_color),
}


def filter_specs(cfg) -> Tuple[FilterSpec, ...]:
    return tuple(_resolve(cfg, REGISTRY[name]) for name in cfg.filters)


# the curve filters' parameter counts follow cfg.curve_steps (reference
# ToneFilter/ColorFilter derive them from cfg; the registry's 8/24 are the
# DEFAULT curve_steps=8 values) — resolve them per-config so a custom
# curve_steps can't silently corrupt the policy head/squash reshape
_CFG_PARAMS = {"tone": lambda cfg: cfg.curve_steps,
               "tone_v2": lambda cfg: cfg.curve_steps,
               "color": lambda cfg: 3 * cfg.curve_steps}


def _resolve(cfg, spec: FilterSpec) -> FilterSpec:
    fn = _CFG_PARAMS.get(spec.name)
    if fn is None:
        return spec
    n = fn(cfg)
    return spec if n == spec.n_params else dataclasses.replace(
        spec, n_params=n)


def get_spec(cfg, name: str) -> FilterSpec:
    """Config-resolved registry lookup (curve filters' n_params follow
    cfg.curve_steps)."""
    return _resolve(cfg, REGISTRY[name])


def short_names(cfg) -> Tuple[str, ...]:
    return tuple(s.short_name for s in filter_specs(cfg))


def param_counts(cfg) -> Tuple[int, ...]:
    return tuple(s.n_params for s in filter_specs(cfg))


def param_offsets(cfg) -> Tuple[Tuple[int, int], ...]:
    """(start, end) slices of each filter's params in the concatenated
    per-step parameter vector."""
    out, total = [], 0
    for n in param_counts(cfg):
        out.append((total, total + n))
        total += n
    return tuple(out)


def apply_one(cfg, spec: FilterSpec, img, params, mask_params=None,
              gate=None):
    """One full filter step: masked lerp + clip (reference filters.py:91-126).

    gate: optional [N] blend weights forwarded to gate-capable ops
    (spec.gated) so they can skip images whose blend weight is exactly 0.
    The returned value for a gated-off image is NOT the filtered image —
    callers must multiply by the same weights (render_blend does)."""
    mask = M.get_mask(cfg, img, mask_params)
    if spec.gated and gate is not None:
        filtered = spec.apply(cfg, img, params, gate=gate)
    else:
        filtered = spec.apply(cfg, img, params)
    out = lerp(img, filtered, mask)
    return jnp.clip(out, 0.0, 1.0)


def render_candidates(cfg, img, params_list: Sequence, mask_params_list=None):
    """All K filtered candidates, stacked on axis 1 -> [N, K, H, W, 3]."""
    specs = filter_specs(cfg)
    outs = []
    for k, spec in enumerate(specs):
        mp = None if mask_params_list is None else mask_params_list[k]
        outs.append(apply_one(cfg, spec, img, params_list[k], mp))
    return jnp.stack(outs, axis=1)


def render_blend(cfg, img, params_list: Sequence, onehot,
                 mask_params_list=None):
    """One-hot blend of all candidates (reference agent.py:154).

    onehot: [N, K] float.  Returns [N, H, W, 3].

    Gate-capable ops (NLM denoise) receive their blend-weight column as a
    per-image gate: images whose weight is exactly 0 skip the kernel, since
    their contribution is ``0 * cand``.  Exact for arbitrary weights — in
    training the weights are a sampled hard one-hot, so only ~1/K of the
    batch pays the NLM cost instead of all of it.
    """
    specs = filter_specs(cfg)
    out = jnp.zeros_like(img)
    for k, spec in enumerate(specs):
        mp = None if mask_params_list is None else mask_params_list[k]
        gate = onehot[:, k] if spec.gated else None
        cand = apply_one(cfg, spec, img, params_list[k], mp, gate=gate)
        out = out + cand * onehot[:, k, None, None, None]
    return out


def render_switch(cfg, img, params_list: Sequence, selected_id,
                  mask_params_list=None):
    """Render only the selected filter via lax.switch.

    ``selected_id`` is a scalar action shared by the whole batch (the batch-1
    inference case, or a forced ``--pipeline`` step).  Exact equivalent of the
    blend because selection is independent of the filter outputs.
    """
    specs = filter_specs(cfg)

    branches = []
    for k, (spec, p) in enumerate(zip(specs, params_list)):
        mp = None if mask_params_list is None else mask_params_list[k]
        branches.append(
            (lambda spec=spec, p=p, mp=mp:
             (lambda im: apply_one(cfg, spec, im, p, mp)))())
    return jax.lax.switch(selected_id, branches, img)


def render_fixed(cfg, img, name: str, params):
    """Fixed-parameter render, reference ``Filter.run`` (filters.py:128-139).

    With masking disabled this is ``process`` without the final clip, matching
    the reference (``run`` does not clip; ``forward`` does).
    """
    spec = get_spec(cfg, name)
    mask = M.get_mask(cfg, img, None)
    return lerp(img, spec.apply(cfg, img, params), mask)


def render_pipeline(cfg, img, stages: Sequence[Tuple[str, jnp.ndarray]],
                    allow_fused: bool = True):
    """Sequential scripted ISP pipeline of (filter_name, params) stages.

    On TPU (with ``cfg.use_pallas``) maximal runs of fusable stages execute
    as ONE Pallas kernel — one HBM read+write for the whole run instead of
    2 per stage (~6x on the 5-stage benchmark pipeline); NLM and other
    non-fusable stages split the runs.  Gradients route through the
    stage-by-stage XLA chain via custom_vjp, so the fused path is safe to
    differentiate.
    """
    use_fused = (allow_fused and getattr(cfg, "use_pallas", True)
                 and not cfg.masking
                 and jax.default_backend() == "tpu"
                 and img.shape[2] % 128 == 0 and img.shape[1] % 8 == 0)
    if not use_fused:
        for name, params in stages:
            img = render_fixed(cfg, img, name, params)
        return img

    from adaptiveisp_tpu.ops.pallas.pipeline import FUSABLE, fused_run

    run: list = []
    for name, params in stages:
        if name in FUSABLE:
            run.append((name, params))
            continue
        if run:
            img = fused_run(cfg, img, run)
            run = []
        img = render_fixed(cfg, img, name, params)
    if run:
        img = fused_run(cfg, img, run)
    return img


def make_sharded_render(cfg, mesh, names: Sequence[str]):
    """Spatially-sharded scripted render over a (data x spatial) mesh.

    The sp axis of the driver's dp/tp/pp/sp taxonomy, applied where it is
    native to this workload: a high-resolution frame's ROWS are spread over
    the 'spatial' mesh axis (batch over 'data'), so one 4K/8K render rides
    every chip's HBM bandwidth instead of one.  The stage chain stays the
    ordinary XLA path (allow_fused=False): GSPMD partitions it and inserts
    the halo exchanges the windowed stages (sharpen blurs, NLM shifts) need
    at shard boundaries — results are bitwise identical to the
    single-device render (tests/test_spatial_sharding.py).

    Returns a jitted ``fn(img_nhwc, params_list) -> img_nhwc`` with image
    in/out sharded [data, spatial, -, -] and params replicated.
    """
    import jax

    from adaptiveisp_tpu.train import mesh as mesh_lib

    names = tuple(names)
    sh = mesh_lib.spatial_image_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def fn(img, params_list):
        return render_pipeline(cfg, img, list(zip(names, params_list)),
                               allow_fused=False)

    return jax.jit(fn, in_shardings=(sh, rep), out_shardings=sh)
