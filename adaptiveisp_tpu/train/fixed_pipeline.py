"""Optimize a FIXED (non-adaptive) ISP pipeline against detection loss.

The reference's headline comparison is AdaptiveISP (71.4 mAP) vs a fixed
optimized pipeline (70.1 mAP, /root/reference/README.md:9) — but it ships no
tool to produce that baseline.  This module does: gradient descent on the
raw (pre-squash) parameters of a fixed filter chain, minimizing the frozen
detector's loss over a dataset.  The whole chain is differentiable (the
fused Pallas path routes its backward through the XLA stage chain).

    params = optimize_fixed_pipeline(cfg, stages=("exposure", "improved_wb",
        "ccm", "gamma", "sharpen"), yolo=..., yolo_vars=..., batches=...)
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaptiveisp_tpu.detect.loss import LossHyp, per_image_loss_batch
from adaptiveisp_tpu.ops import bank


def init_raw_params(cfg, stage_names: Sequence[str], key=None) -> Dict:
    """Zero-initialised raw features per stage (squash(0) = each filter's
    neutral-ish midpoint).

    CCM is the exception: zero features squash to the all-zero matrix whose
    row sums vanish in the row normalisation (reference filters.py:705-707
    divides by the row sum with no epsilon -> NaN; the reference never hits
    this because network features are never exactly zero).  Start CCM at
    the raw preimage of the identity matrix instead."""
    out = {}
    for i, name in enumerate(stage_names):
        n = bank.REGISTRY[name].n_params
        if name == "ccm":
            lo, hi = cfg.ccm_range
            target = np.eye(3, dtype=np.float64).reshape(1, 9)
            feat = np.arctanh(2.0 * (target - lo) / (hi - lo) - 1.0)
            out[f"{i}_{name}"] = jnp.asarray(feat, jnp.float32)
        else:
            out[f"{i}_{name}"] = jnp.zeros((1, n), jnp.float32)
    return out


def render_with_raw_params(cfg, img, stage_names: Sequence[str], raw: Dict):
    """Squash each stage's raw params and run the (fused) pipeline."""
    stages = []
    for i, name in enumerate(stage_names):
        spec = bank.REGISTRY[name]
        stages.append((name, spec.squash(cfg, raw[f"{i}_{name}"])))
    return bank.render_pipeline(cfg, img, stages)


def make_fixed_pipeline_step(cfg, stage_names: Sequence[str], yolo,
                             anchors_grid, hyp: LossHyp, tx,
                             grad_mask: Dict = None):
    """One jitted optimization step over the pipeline's raw params.

    grad_mask (same keys as the raw params, values 0/1) freezes stages —
    the curriculum phase of optimize_fixed_pipeline uses it to fit the
    luminance stages before unfreezing the color/spatial ones."""

    def loss_fn(raw, yolo_vars, images, targets, tmask):
        rendered = render_with_raw_params(cfg, images, stage_names, raw)
        preds = yolo.apply(yolo_vars, rendered, train=False)
        losses, _ = per_image_loss_batch(preds, targets, tmask,
                                         anchors_grid, hyp)
        return losses.mean()

    def step(raw, opt_state, yolo_vars, images, targets, tmask):
        loss, grads = jax.value_and_grad(loss_fn)(
            raw, yolo_vars, images, targets, tmask)
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, grad_mask)
        updates, opt_state = tx.update(grads, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        return raw, opt_state, loss

    return jax.jit(step)


# stages whose parameters act on global luminance — safe first-phase
# targets for the curriculum (the color/spatial stages have degenerate
# descent directions from a dark start: jointly optimizing all five from
# neutral reliably collapses the render to black, round-3 measurement)
LUMINANCE_STAGES = ("exposure", "gamma", "tone", "contrast")


def optimize_fixed_pipeline(cfg, stage_names: Sequence[str], yolo, yolo_vars,
                            anchors_grid, batches: Iterable,
                            hyp: LossHyp = None, lr: float = 3e-2,
                            steps: int = 200, log_every: int = 50,
                            verbose: bool = True, curriculum: bool = True):
    """batches: iterable of (images, targets, tmask) device-ready tuples.

    curriculum=True (default) fits the luminance stages alone for the
    first third of the budget, then unfreezes everything — without it, a
    dark (e.g. unprocessed-RAW) input collapses into an all-black local
    minimum when color stages are free from step 0.

    Returns (squashed_stages, raw_params, loss_history).
    """
    hyp = hyp or LossHyp()
    # disallow fused forward here: we differentiate every step, and the
    # custom_vjp recompute would double the work
    cfg = cfg.replace(use_pallas=False) if hasattr(cfg, "replace") else cfg
    # cosine lr decay keeps the late phase from walking out of the basin
    # (a fixed lr measurably diverged after phase 2 under tiny numeric
    # perturbations); best-iterate restore below makes the returned
    # pipeline robust to any residual late-run wander
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1),
                                                alpha=0.1))
    raw = init_raw_params(cfg, stage_names)
    opt_state = tx.init(raw)
    step_full = make_fixed_pipeline_step(cfg, stage_names, yolo,
                                         anchors_grid, hyp, tx)
    phase1_steps = 0
    step_phase1 = None
    lum = [n in LUMINANCE_STAGES for n in stage_names]
    if curriculum and any(lum) and not all(lum):
        mask = {f"{i}_{n}": jnp.float32(1.0 if n in LUMINANCE_STAGES
                                        else 0.0)
                for i, n in enumerate(stage_names)}
        step_phase1 = make_fixed_pipeline_step(
            cfg, stage_names, yolo, anchors_grid, hyp, tx, grad_mask=mask)
        phase1_steps = steps // 3

    history: List[float] = []
    best_loss, best_raw = float("inf"), raw
    it = 0
    batch_iter = iter(batches)
    cache = []
    while it < steps:
        try:
            batch = next(batch_iter)
            cache.append(batch)
        except StopIteration:
            batch_iter = iter(cache)
            batch = next(batch_iter)
        images, targets, tmask = batch
        step = step_phase1 if it < phase1_steps else step_full
        prev_raw = raw
        raw, opt_state, loss = step(raw, opt_state, yolo_vars, images,
                                    targets, tmask)
        loss = float(loss)  # loss of prev_raw (pre-update iterate)
        history.append(loss)
        if loss < best_loss:
            best_loss, best_raw = loss, prev_raw
        if verbose and it % log_every == 0:
            phase = "lum" if it < phase1_steps else "all"
            print(f"[fixed-pipeline {it} {phase}] detect loss "
                  f"{history[-1]:.4f}", flush=True)
        it += 1

    # best-iterate restore: the returned pipeline is the lowest-loss raw
    # seen, not the final iterate (late-run divergence cannot destroy a
    # good baseline)
    raw = best_raw
    squashed = []
    for i, name in enumerate(stage_names):
        spec = bank.REGISTRY[name]
        squashed.append((name, spec.squash(cfg, raw[f"{i}_{name}"])))
    return squashed, raw, history
