"""Adaptive ISP rollout as an on-device lax.scan.

The reference rolls out up to `steps` agent applications with a python loop
and a data-dependent `break` on the stop flag
(/root/reference/yolov3/val_adaptiveisp.py:291-309, train.py:400-413).  On TPU
that becomes a fixed-length `lax.scan` with a stop mask: once a sample's
stopped bit is set, its image/state stop updating — bitwise identical results
without leaving the device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.policy.states import STATE_STOPPED_DIM


class RolloutResult(NamedTuple):
    image: jnp.ndarray          # [N, H, W, 3] final retouched image
    states: jnp.ndarray         # [N, S] final states
    high_res: Optional[jnp.ndarray]
    selected: jnp.ndarray       # [steps, N] chosen filter ids (-1 once stopped)
    pdfs: jnp.ndarray           # [steps, N, K]
    images_per_step: Optional[jnp.ndarray]  # [steps, N, H, W, 3] if recorded
    params: Optional[jnp.ndarray] = None    # [steps, N, sum(n_params)]


def jit_rollout(agent, steps: int, record_steps: bool = False,
                render: str = "blend", early_exit: bool = True):
    """jit wrapper with static step count/render mode.

    The returned fn takes an optional [steps] int32 pipeline array (entries
    -1 = agent's choice) so forced pipelines recompile nothing.

    early_exit: once EVERY sample in the batch has its stopped bit set, the
    remaining scan steps skip the agent forward entirely via a scalar
    lax.cond — the on-device analog of the reference's per-image ``break``
    (val_adaptiveisp.py:307-309).  Image/state/selected/params outputs are
    bit-identical (a stopped step emits sel=-1 and keeps image/state frozen
    anyway); only `pdfs` differs on fully-stopped steps (zeros instead of
    the frozen-state pdf, which nothing consumes).  This is
    free latency for batch-1 eval whenever the agent stops before step 5,
    and costs no host round-trip.
    """
    from adaptiveisp_tpu.ops.bank import param_offsets

    n_filters = agent.cfg.n_filters
    n_params_total = param_offsets(agent.cfg)[-1][1]
    # recorded rollouts feed artifact dumps (per-step pdf decision bars,
    # trainer.validate_trajectories) that DO read post-stop pdfs — keep
    # full fidelity there
    early_exit = early_exit and not record_steps

    def fn(variables, image, noises, states, pipeline_arr):
        n = image.shape[0]
        stopped0 = jnp.zeros((n,), jnp.float32)

        def step_active(carry, z, forced):
            img, st, stop = carry
            out, new_states, _, _, _, info = agent.apply(
                variables, img, z, st, 1.0, train=False,
                selected_filter_id=forced, render=render)
            keep = stop[:, None, None, None] > 0
            img_new = jnp.where(keep, img, out)
            st_new = jnp.where(stop[:, None] > 0, st, new_states)
            sel = jnp.where(stop > 0, -1, info["selected_filter"])
            new_stop = jnp.maximum(stop, st_new[:, STATE_STOPPED_DIM])
            params = jnp.concatenate(
                [p.reshape(p.shape[0], -1) for p in info["filter_params"]],
                axis=-1)
            return (img_new, st_new, new_stop), (sel, info["pdf"], params)

        def step_stopped(carry):
            img, st, stop = carry
            return carry, (jnp.full((n,), -1, jnp.int32),
                           jnp.zeros((n, n_filters), img.dtype),
                           jnp.zeros((n, n_params_total), img.dtype))

        def body(carry, inp):
            z, forced = inp
            if early_exit:
                new_carry, (sel, pdf, params) = jax.lax.cond(
                    jnp.all(carry[2] > 0),
                    lambda c, _z, _f: step_stopped(c),
                    step_active, carry, z, forced)
            else:
                new_carry, (sel, pdf, params) = step_active(carry, z, forced)
            ys = (sel, pdf, params,
                  new_carry[0] if record_steps else None)
            return new_carry, ys

        (img, st, _), (sels, pdfs, params, imgs) = jax.lax.scan(
            body, (image, states, stopped0), (noises, pipeline_arr))
        return RolloutResult(img, st, None, sels, pdfs, imgs, params)

    return jax.jit(fn)


def no_pipeline(steps: int):
    return jnp.full((steps,), -1, jnp.int32)
