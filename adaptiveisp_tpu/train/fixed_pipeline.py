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
        n = bank.get_spec(cfg, name).n_params
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
        spec = bank.get_spec(cfg, name)
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

    return jax.jit(step), jax.jit(loss_fn)


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
    raw = init_raw_params(cfg, stage_names)
    phase1_steps = 0
    step_phase1 = None
    lum = [n in LUMINANCE_STAGES for n in stage_names]
    two_phase = curriculum and any(lum) and not all(lum)
    if two_phase:
        phase1_steps = steps // 3
    # phase 2 runs a GENTLER, decaying optimizer with fresh Adam state:
    # instrumented runs show the all-stage phase converging (val mAP 0.73
    # mid-run) and then blowing up under the constant phase-1 lr (smoothed
    # loss 0.34 -> 1.02, render collapse) — the 5-stage objective has a
    # collapse basin right next to the optimum
    tx1 = optax.adam(lr)
    tx2 = optax.adam(optax.cosine_decay_schedule(
        lr / 3.0, max(steps - phase1_steps, 1), alpha=0.1))
    tx_full = tx2 if two_phase else tx1
    opt_state = tx1.init(raw)
    step_full, eval_loss = make_fixed_pipeline_step(
        cfg, stage_names, yolo, anchors_grid, hyp, tx_full)
    if two_phase:
        mask = {f"{i}_{n}": jnp.float32(1.0 if n in LUMINANCE_STAGES
                                        else 0.0)
                for i, n in enumerate(stage_names)}
        step_phase1, _ = make_fixed_pipeline_step(
            cfg, stage_names, yolo, anchors_grid, hyp, tx1, grad_mask=mask)

    # best-iterate tracking on a SMOOTHED objective: every eval_every
    # steps, score the current params over several cached batches and keep
    # the best-scoring params.  (Per-batch training losses are too noisy to
    # rank iterates — min over them picks a lucky batch, not good params —
    # and this 5-stage objective is nonconvex with a collapse basin, so the
    # final iterate isn't trustworthy either.)
    eval_every = max(1, log_every // 5)
    best_loss, best_raw = float("inf"), raw

    def smoothed(raw_now, cache):
        take = cache[:8]
        return float(np.mean([float(eval_loss(raw_now, yolo_vars, *b))
                              for b in take]))

    history: List[float] = []
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
        if two_phase and it == phase1_steps:
            opt_state = tx_full.init(raw)  # fresh moments for phase 2
        step = step_phase1 if it < phase1_steps else step_full
        raw, opt_state, loss = step(raw, opt_state, yolo_vars, images,
                                    targets, tmask)
        history.append(float(loss))
        if it % eval_every == 0 or it == steps - 1:
            ev = smoothed(raw, cache)
            if ev < best_loss:
                best_loss, best_raw = ev, raw
        if verbose and it % log_every == 0:
            phase = "lum" if it < phase1_steps else "all"
            print(f"[fixed-pipeline {it} {phase}] detect loss "
                  f"{history[-1]:.4f} (best smoothed {best_loss:.4f})",
                  flush=True)
        it += 1

    # best-iterate restore: the returned pipeline is the best SMOOTHED-loss
    # params seen — late-run divergence or collapse cannot destroy a good
    # baseline
    raw = best_raw
    squashed = []
    for i, name in enumerate(stage_names):
        spec = bank.get_spec(cfg, name)
        squashed.append((name, spec.squash(cfg, raw[f"{i}_{name}"])))
    return squashed, raw, history
