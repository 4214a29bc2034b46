"""Flax layer zoo for the YOLO detector.

Counterparts of the reference layer zoo (/root/reference/yolov3/models/common.py:45-313):
Conv (conv + BN + SiLU), Bottleneck, BottleneckCSP, C3, SPP, SPPF, Focus.
NHWC layout; BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 ->
flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from adaptiveisp_tpu.detect.activations import apply_activation


def autopad(k: int) -> int:
    return k // 2


class ConvBNAct(nn.Module):
    """conv(bias=False) -> BN -> act (reference common.py:45-59).

    `dtype` is the computation dtype: bfloat16 rides the MXU natively on TPU
    (params stay float32); None keeps float32 everywhere.  `p` overrides the
    k//2 autopad (the v5 6x6-stem Conv passes an explicit padding).
    `act`: True = SiLU (the reference Conv default), False = identity, or an
    activation name from detect/activations.py (the reference's
    `Conv.default_act` rebinding via the spec-level `activation:` key).
    """

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = None
    p: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k) if self.p is None else self.p
        x = nn.Conv(self.c2, kernel_size=(self.k, self.k),
                    strides=(self.s, self.s), padding=((p, p), (p, p)),
                    use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        return apply_activation(self.act, x, train=train)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 expand, optional residual (reference common.py:110-121)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        y = ConvBNAct(self.c2, 3, 1, act=self.act, dtype=self.dtype,
                      name="cv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference common.py:156-167):
    two parallel 1x1 branches, n bottlenecks (e=1.0) on one of them,
    concat, 1x1 fuse."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        for r in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, act=self.act,
                           dtype=self.dtype, name=f"m{r}")(a, train=train)
        b = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv2")(x, train=train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBNAct(self.c2, 1, 1, act=self.act, dtype=self.dtype,
                         name="cv3")(y, train=train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference common.py:123-139): conv branch +
    raw-conv branch, concat -> BN -> SiLU -> 1x1."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        for r in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, act=self.act,
                           dtype=self.dtype, name=f"m{r}")(a, train=train)
        a = nn.Conv(c_, (1, 1), use_bias=False, name="cv3",
                    dtype=self.dtype)(a)
        b = nn.Conv(c_, (1, 1), use_bias=False, name="cv2",
                    dtype=self.dtype)(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(y)
        y = nn.silu(y)
        return ConvBNAct(self.c2, 1, 1, act=self.act, dtype=self.dtype,
                         name="cv4")(y, train=train)


def _pool_same(x, k: int):
    p = k // 2
    return nn.max_pool(x, window_shape=(k, k), strides=(1, 1),
                       padding=((p, p), (p, p)))


class SPP(nn.Module):
    """Spatial pyramid pooling (reference common.py:181-195): 1x1 reduce,
    parallel stride-1 maxpools at k=(5,9,13), concat, 1x1 expand."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        y = jnp.concatenate([x] + [_pool_same(x, k) for k in self.k],
                            axis=-1)
        return ConvBNAct(self.c2, 1, 1, act=self.act, dtype=self.dtype,
                         name="cv2")(y, train=train)


class SPPF(nn.Module):
    """Fast SPP (reference common.py:198-212): three CHAINED k-pools —
    mathematically equal to SPP(k, 2k-1, 3k-2) because stride-1 max-pools
    compose (max over a k-window of k-window maxima = max over a
    (2k-1)-window)."""

    c2: int
    k: int = 5
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        y1 = _pool_same(x, self.k)
        y2 = _pool_same(y1, self.k)
        y3 = _pool_same(y2, self.k)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBNAct(self.c2, 1, 1, act=self.act, dtype=self.dtype,
                         name="cv2")(y, train=train)


class Focus(nn.Module):
    """Space-to-depth stem (reference common.py:215-227): the 2x2 pixel
    shuffle x(n,h,w,c) -> (n,h/2,w/2,4c) followed by a Conv.  Channel order
    matches torch's cat([..., ::2, ::2], [..., 1::2, ::2], [..., ::2, 1::2],
    [..., 1::2, 1::2]) with NCHW->NHWC layout translation."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate([
            x[:, ::2, ::2, :],    # (even rows, even cols)
            x[:, 1::2, ::2, :],   # (odd rows, even cols)
            x[:, ::2, 1::2, :],   # (even rows, odd cols)
            x[:, 1::2, 1::2, :],  # (odd rows, odd cols)
        ], axis=-1)
        return ConvBNAct(self.c2, self.k, self.s, act=self.act,
                         dtype=self.dtype, name="conv")(y, train=train)


class Proto(nn.Module):
    """Mask prototype tower for segmentation (reference common.py:838-848):
    Conv3x3 -> nearest 2x upsample -> Conv3x3 -> Conv1x1 to `nm` channels,
    run on the highest-resolution detection feature map."""

    npr: int = 256
    nm: int = 32
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.npr, 3, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        x = upsample_nearest_2x(x)
        x = ConvBNAct(self.npr, 3, 1, act=self.act, dtype=self.dtype,
                      name="cv2")(x, train=train)
        return ConvBNAct(self.nm, 1, 1, act=self.act, dtype=self.dtype,
                         name="cv3")(x, train=train)


def upsample_nearest_2x(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def max_pool(x, k: int, s: int):
    # torch nn.MaxPool2d(k, s) default padding=0 -> VALID; the tiny spec's
    # ZeroPad row supplies the asymmetric pad before the stride-1 pool.
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s),
                       padding="VALID")
