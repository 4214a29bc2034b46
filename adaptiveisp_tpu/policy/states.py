"""RL state-vector layout and helpers.

State layout (reference /root/reference/util.py:8-18):
    0: has-reward flag   (STATE_REWARD_DIM)
    1: stopped flag      (STATE_STOPPED_DIM)
    2: step counter      (STATE_STEP_DIM)
    3..: per-filter usage bits (STATE_DROPOUT_BEGIN)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STATE_REWARD_DIM = 0
STATE_STOPPED_DIM = 1
STATE_STEP_DIM = 2
STATE_DROPOUT_BEGIN = 3


def get_initial_states(batch_size: int, num_state_dim: int) -> np.ndarray:
    """All-zero initial states (reference replay_memory.py:27-35)."""
    return np.zeros((batch_size, num_state_dim), dtype=np.float32)


def get_noise(rng: np.random.RandomState, batch_size: int, z_dim: int,
              z_type: str = "uniform") -> np.ndarray:
    """Host-side selection/zed noise (reference replay_memory.py:18-24)."""
    if z_type == "normal":
        return rng.normal(0, 1, (batch_size, z_dim)).astype(np.float32)
    if z_type == "uniform":
        return rng.uniform(0, 1, (batch_size, z_dim)).astype(np.float32)
    raise ValueError(f"Unknown noise type: {z_type}")


def get_noise_jax(key, batch_size: int, z_dim: int, z_type: str = "uniform"):
    """On-device noise for fully-jitted rollouts."""
    if z_type == "normal":
        return jax.random.normal(key, (batch_size, z_dim), dtype=jnp.float32)
    if z_type == "uniform":
        return jax.random.uniform(key, (batch_size, z_dim), dtype=jnp.float32)
    raise ValueError(f"Unknown noise type: {z_type}")


def enrich_image_input(cfg, img, states):
    """Broadcast the state vector into extra image channels (NHWC).

    Reference util.py:58-63 (NCHW there; NHWC here).
    img: [N, H, W, C]; states: [N, S] -> [N, H, W, C+S].
    """
    if not cfg.img_include_states:
        return img
    n, h, w, _ = img.shape
    s = jnp.broadcast_to(states[:, None, None, :], (n, h, w, states.shape[-1]))
    return jnp.concatenate([img, s.astype(img.dtype)], axis=-1)


def pdf_sample(pdf, uniform_noise):
    """Inverse-CDF categorical sampling with external uniform noise.

    Reference agent.py:12-16: exclusive cdf; index = #(cdf < u) - 1.
    pdf: [N, K]; uniform_noise: [N, 1] -> [N] int32.
    """
    pdf = pdf / (jnp.sum(pdf, axis=1, keepdims=True) + 1e-36)
    cdf = jnp.cumsum(pdf, axis=1) - pdf
    return jnp.sum((cdf < uniform_noise).astype(jnp.int32), axis=1) - 1
