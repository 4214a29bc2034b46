"""Flax layer zoo for the YOLO detector.

Counterparts of the reference layer zoo (/root/reference/yolov3/models/common.py:45-130):
Conv (conv + BN + SiLU), Bottleneck (1x1 -> 3x3 with shortcut).  NHWC layout;
BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 -> flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def autopad(k: int) -> int:
    return k // 2


class ConvBNAct(nn.Module):
    """conv(bias=False) -> BN -> SiLU (reference common.py:45-59).

    `dtype` is the computation dtype: bfloat16 rides the MXU natively on TPU
    (params stay float32); None keeps float32 everywhere.
    """

    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k)
        x = nn.Conv(self.c2, kernel_size=(self.k, self.k),
                    strides=(self.s, self.s), padding=((p, p), (p, p)),
                    use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 expand, optional residual (reference common.py:110-121)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train=train)
        y = ConvBNAct(self.c2, 3, 1, dtype=self.dtype,
                      name="cv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


def upsample_nearest_2x(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def max_pool(x, k: int, s: int):
    # torch nn.MaxPool2d(k, s) default padding=0 -> VALID; the tiny spec's
    # ZeroPad row supplies the asymmetric pad before the stride-1 pool.
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s),
                       padding="VALID")
