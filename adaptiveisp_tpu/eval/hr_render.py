"""High-resolution qualitative rollout.

Counterpart of the reference DynamicISP.val (/root/reference/train.py:489-611):
filter parameters are predicted on the 512-letterboxed proxy and applied to
the full-resolution frame (agent high_res path, agent.py:103-121), dumping
per-step images and a trajectory strip per input.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.data.datasets import ISPDataset
from adaptiveisp_tpu.obs.logging import save_img
from adaptiveisp_tpu.policy.agent import create_agent_state
from adaptiveisp_tpu.policy.states import (
    STATE_STOPPED_DIM, get_initial_states, get_noise)
from adaptiveisp_tpu.train import checkpoint as ckpt_lib


def run_hr_validation(cfg, tcfg, data, model_weights: Optional[str],
                      save_dir: str, steps: int = 5, yolo_variables=None,
                      max_images: int = -1, spatial_shard: int = 1):
    """``spatial_shard > 1`` spreads each full-resolution frame's ROWS over
    that many devices (sp axis, train/mesh.make_mesh_2d): the policy still
    reads the 512px proxy, but the big-frame filter application rides every
    chip's HBM.  Sharding propagates through the agent's high_res path;
    GSPMD inserts the halo exchanges for the windowed filters."""
    image_dir = os.path.join(save_dir, "val-images")
    for i in range(steps):
        os.makedirs(os.path.join(image_dir, f"step-{i}"), exist_ok=True)
    os.makedirs(os.path.join(image_dir, "all-step"), exist_ok=True)

    agent, variables = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=tcfg.imgsz, batch=1)
    if model_weights:
        if os.path.isdir(model_weights):
            from adaptiveisp_tpu.train.optim import make_optimizer
            from adaptiveisp_tpu.train.step import init_train_state
            from adaptiveisp_tpu.policy.value import create_value_state

            value, value_vars = create_value_state(
                cfg, jax.random.PRNGKey(1), image_size=tcfg.imgsz, batch=1)
            tx = make_optimizer(tcfg.lr, 100)
            template = init_train_state(variables, value_vars, tx, tx)
            state = ckpt_lib.restore(model_weights,
                                     jax.device_get(template))
            variables = {"params": state.agent_params,
                         "batch_stats": state.agent_stats}
        else:
            payload = ckpt_lib.load_weights_only(model_weights)
            variables = payload["agent_model"]

    ds = ISPDataset(data["val"], img_size=tcfg.imgsz,
                    source=data.get("source", "normalize"),
                    high_res=True, train=False)
    rng = np.random.RandomState(0)
    n_total = len(ds) if max_images < 0 else min(max_images, len(ds))

    hr_sharding = None
    if spatial_shard > 1:
        from adaptiveisp_tpu.train.mesh import (
            make_mesh_2d, spatial_image_sharding)

        hr_sharding = spatial_image_sharding(make_mesh_2d(1, spatial_shard))

    for i in range(n_total):
        rec = ds[i]
        img = jnp.asarray(rec["im"][None])
        # high-res frames vary in shape -> pad even dims for filters
        hr_np = rec["im_hr"]
        hr = jnp.asarray(hr_np[None])
        if hr_sharding is not None:
            hr = jax.device_put(hr, hr_sharding)
        states = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
        traj = [np.asarray(img[0])]
        fname = os.path.split(rec["path"])[1]
        for s in range(steps):
            z = jnp.asarray(get_noise(rng, 1, cfg.z_dim, cfg.z_type))
            img, states, _, _, hr, info = agent.apply(
                variables, img, z, states, 1.0, train=False, high_res=hr)
            traj.append(np.asarray(img[0]))
            save_img(np.asarray(hr[0]),
                     os.path.join(image_dir, f"step-{s}", fname))
            if float(states[0, STATE_STOPPED_DIM]) > 0:
                break
        strip = np.concatenate(
            [_thumb(t, 64) for t in traj], axis=1)
        save_img(strip, os.path.join(image_dir, "all-step", fname))
    return image_dir


def _thumb(img: np.ndarray, size: int) -> np.ndarray:
    from adaptiveisp_tpu.data.letterbox import resize_bilinear

    return resize_bilinear(img, size, size)
