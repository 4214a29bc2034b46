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


def adaptive_rollout(agent, variables, image, noises, states,
                     steps: int, pipeline=None, high_res=None,
                     record_steps: bool = False,
                     render: str = "blend") -> RolloutResult:
    """Run `steps` policy applications with stop masking.

    noises: [steps, N, z_dim]; pipeline: optional length-`steps` tuple of
    fixed filter ids (the reference ``--pipeline`` override,
    val_adaptiveisp.py:292) — entries of None mean 'let the agent choose'.
    """
    n = image.shape[0]
    stopped0 = jnp.zeros((n,), jnp.float32)

    if pipeline is not None:
        pipe_arr = jnp.asarray(
            [(-1 if p is None else int(p)) for p in pipeline], jnp.int32)
    else:
        pipe_arr = jnp.full((steps,), -1, jnp.int32)

    def body(carry, inp):
        img, st, hr, stop = carry
        z, forced = inp
        # forced >= 0 overrides the whole batch's action; -1 = agent's choice
        out, new_states, _, _, hr_out, info = agent.apply(
            variables, img, z, st, 1.0, train=False, high_res=hr,
            selected_filter_id=forced, render=render)

        keep = stop[:, None, None, None] > 0
        img_new = jnp.where(keep, img, out)
        st_new = jnp.where(stop[:, None] > 0, st, new_states)
        hr_new = None
        if hr is not None:
            hr_new = jnp.where(keep, hr, hr_out)
        sel = jnp.where(stop > 0, -1, info["selected_filter"])
        new_stop = jnp.maximum(stop, st_new[:, STATE_STOPPED_DIM])
        ys = (sel, info["pdf"], img_new if record_steps else None)
        return (img_new, st_new, hr_new, new_stop), ys

    carry0 = (image, states, high_res, stopped0)
    (img, st, hr, _), (sels, pdfs, imgs) = jax.lax.scan(
        body, carry0, (noises, pipe_arr))
    return RolloutResult(img, st, hr, sels, pdfs, imgs)


def jit_rollout(agent, steps: int, record_steps: bool = False,
                render: str = "blend"):
    """jit wrapper with static step count/render mode.

    The returned fn takes an optional [steps] int32 pipeline array (entries
    -1 = agent's choice) so forced pipelines recompile nothing.
    """

    def fn(variables, image, noises, states, pipeline_arr):
        n = image.shape[0]
        stopped0 = jnp.zeros((n,), jnp.float32)

        def body(carry, inp):
            img, st, stop = carry
            z, forced = inp
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
            ys = (sel, info["pdf"], params,
                  img_new if record_steps else None)
            return (img_new, st_new, new_stop), ys

        (img, st, _), (sels, pdfs, params, imgs) = jax.lax.scan(
            body, (image, states, stopped0), (noises, pipeline_arr))
        return RolloutResult(img, st, None, sels, pdfs, imgs, params)

    return jax.jit(fn)


def no_pipeline(steps: int):
    return jnp.full((steps,), -1, jnp.int32)
