"""Shared CNN trunk for the policy and value networks.

Re-design of the reference FeatureExtractor (agent.py:26-60, value.py:6-44):
a stride-2 conv ladder from 64x64 down to 4x4, BatchNorm + LeakyReLU(0.2),
flattened to ``output_dim`` features.  NHWC layout, flax.linen.

Channel schedule for a 64x64 input with mid_channels=32, output_dim=4096:
64 -> 32 (32ch) -> 16 (64ch) -> 8 (128ch) -> 4 (256ch), 4*4*256 = 4096.
"""

from __future__ import annotations

import flax.linen as nn

MIN_FEATURE_MAP_SIZE = 4


class FeatureExtractor(nn.Module):
    """Stride-2 conv ladder -> flat feature vector.

    dropout_prob > 0 adds the policy trunk's dropout (reference agent.py:54);
    the value trunk uses dropout_prob = 0 (reference value.py:6-44).
    """

    mid_channels: int = 32
    output_dim: int = 4096
    dropout_prob: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output_dim % (MIN_FEATURE_MAP_SIZE ** 2) == 0
        size = x.shape[1]
        channels = self.mid_channels

        def block(x, ch):
            x = nn.Conv(ch, kernel_size=(4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            return nn.leaky_relu(x, negative_slope=0.2)

        x = block(x, channels)
        size //= 2
        while size > MIN_FEATURE_MAP_SIZE:
            if size == MIN_FEATURE_MAP_SIZE * 2:
                channels = self.output_dim // (MIN_FEATURE_MAP_SIZE ** 2)
            else:
                channels *= 2
            assert size % 2 == 0
            size //= 2
            x = block(x, channels)

        x = x.reshape((x.shape[0], -1))
        if self.dropout_prob > 0:
            x = nn.Dropout(rate=self.dropout_prob,
                           deterministic=not train)(x)
        return x


class MLPHead(nn.Module):
    """fc1 -> LeakyReLU(0.2) -> fc_out (the reference's per-filter and
    selector heads, filters.py:48-55 / agent.py:81-83)."""

    hidden: int = 128
    out_dim: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(self.out_dim)(x)


class FilterHead(nn.Module):
    """Shared fc1 trunk with separate filter-param and mask-param outputs
    (reference filters.py:48-73)."""

    hidden: int = 128
    n_filter_params: int = 1
    n_mask_params: int = 6

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        filt = nn.Dense(self.n_filter_params, name="fc_filter")(h)
        mask = nn.Dense(self.n_mask_params, name="fc_mask")(h)
        return filt, mask
