"""The critic: V(s) over (image, RL state).

Flax re-design of the reference Value network (/root/reference/value.py:48-99):
downsample to 64x64, compute hand-crafted scalar features (mean luminance,
luminance variance, mean saturation), concatenate them with the RL state,
broadcast everything as constant image channels, then run the shared conv
trunk (no dropout) and an MLP head to a scalar.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from adaptiveisp_tpu.ops.math import adaptive_avg_pool
from adaptiveisp_tpu.policy.nets import FeatureExtractor, MLPHead


class Value(nn.Module):
    cfg: Any
    feature_size: int = 64

    @nn.compact
    def __call__(self, images, states=None, train: bool = False):
        cfg = self.cfg
        images = adaptive_avg_pool(images, self.feature_size)

        # Scalar scene statistics (reference value.py:64-75)
        lum = (images[..., 0] * 0.27 + images[..., 1] * 0.67
               + images[..., 2] * 0.06 + 1e-5)[..., None]  # [N, H, W, 1]
        luminance = jnp.mean(lum, axis=(1, 2, 3))
        # torch.var is unbiased (ddof=1) by default
        contrast = jnp.var(lum, axis=(1, 2, 3), ddof=1)
        clipped = jnp.clip(images, 0.0, 1.0)
        i_max = jnp.max(clipped, axis=-1)
        i_min = jnp.min(clipped, axis=-1)
        sat = (i_max - i_min) / (
            jnp.minimum(i_max + i_min, 2.0 - i_max - i_min) + 1e-2)
        saturation = jnp.mean(sat, axis=(1, 2))

        state_feature = jnp.stack([luminance, contrast, saturation], axis=1)
        if states is None:
            states = state_feature
        else:
            states = jnp.concatenate([states, state_feature], axis=1)

        # Broadcast as constant channels (reference value.py:89-91)
        n, h, w, _ = images.shape
        state_channels = jnp.broadcast_to(
            states[:, None, None, :], (n, h, w, states.shape[-1]))
        x = jnp.concatenate([images, state_channels.astype(images.dtype)],
                            axis=-1)

        feature = FeatureExtractor(
            mid_channels=cfg.base_channels,
            output_dim=cfg.feature_extractor_dims,
            dropout_prob=0.0,
            name="feature_extractor")(x, train=train)
        return MLPHead(hidden=cfg.fc1_size, out_dim=1, name="head")(feature)


def create_value_state(cfg, key, feature_size: int = 64,
                       image_size: int = 512, batch: int = 1):
    model = Value(cfg=cfg, feature_size=feature_size)
    images = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    states = jnp.zeros((batch, cfg.num_state_dim), jnp.float32)
    variables = model.init({"params": key}, images, states, train=False)
    return model, variables
