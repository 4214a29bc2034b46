"""Flax layer zoo for the YOLO detector.

Counterparts of the reference layer zoo (/root/reference/yolov3/models/common.py:45-313):
Conv (conv + BN + SiLU), Bottleneck, BottleneckCSP, C3 (+ the C3x/C3TR/
C3SPP/C3Ghost variants), SPP, SPPF, Focus, DWConv, GhostConv,
GhostBottleneck, CrossConv, TransformerLayer/Block, Contract, Expand.
NHWC layout; BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 ->
flax momentum 0.9).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from adaptiveisp_tpu.detect.activations import apply_activation


def autopad(k: int) -> int:
    return k // 2


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


class ConvBNAct(nn.Module):
    """conv(bias=False) -> BN -> act (reference common.py:45-59).

    `dtype` is the computation dtype: bfloat16 rides the MXU natively on TPU
    (params stay float32); None keeps float32 everywhere.  `p` overrides the
    k//2 autopad (the v5 6x6-stem Conv passes an explicit padding).
    `act`: True = SiLU (the reference Conv default), False = identity, or an
    activation name from detect/activations.py (the reference's
    `Conv.default_act` rebinding via the spec-level `activation:` key).
    `g` is the conv group count (torch `groups` = flax feature_group_count);
    `k`/`s` accept (kh, kw) tuples for the CrossConv 1xk / kx1 factorization.
    """

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    act: Any = True
    dtype: Any = None
    p: Optional[int] = None
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.k)
        ph, pw = (autopad(kh), autopad(kw)) if self.p is None \
            else _pair(self.p)
        x = nn.Conv(self.c2, kernel_size=(kh, kw),
                    strides=_pair(self.s), padding=((ph, ph), (pw, pw)),
                    feature_group_count=self.g,
                    use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        return apply_activation(self.act, x, train=train)


class DWConv(nn.Module):
    """Depthwise conv: Conv at groups=gcd(c1, c2) (common.py:62-65); same
    flat conv/bn param layout as ConvBNAct (torch DWConv subclasses Conv).

    TPU note: XLA lowers grouped/depthwise convs off the MXU — fine for the
    small stride-2 shortcut convs the Ghost family uses, but never put one
    in an ISP hot path (ops/math.depthwise_conv3x3 is the fast pattern)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        p = autopad(self.k)
        x = nn.Conv(self.c2, kernel_size=(self.k, self.k),
                    strides=(self.s, self.s), padding=((p, p), (p, p)),
                    feature_group_count=g, use_bias=False, name="conv",
                    dtype=self.dtype)(x)
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


class CrossConv(nn.Module):
    """Cross-conv downsample: 1xk then kx1 (reference common.py:142-155)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 1.0
    shortcut: bool = False
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, (1, self.k), (1, self.s), act=self.act,
                      dtype=self.dtype, name="cv1")(x, train=train)
        y = ConvBNAct(self.c2, (self.k, 1), (self.s, 1), act=self.act,
                      dtype=self.dtype, name="cv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class GhostConv(nn.Module):
    """Ghost convolution (reference common.py:248-258): a dense 1x1/kxk conv
    producing half the channels, then a cheap depthwise 5x5 generating the
    other ("ghost") half from it."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBNAct(c_, self.k, self.s, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        g = ConvBNAct(c_, 5, 1, act=self.act, g=c_, dtype=self.dtype,
                      name="cv2")(y, train=train)
        return jnp.concatenate([y, g], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference common.py:261-274): GhostConv pw ->
    [DWConv dw at s=2] -> linear GhostConv pw, plus a DWConv+Conv shortcut
    when striding (identity otherwise).  Param names mirror the torch
    Sequential indices (conv0/conv1/conv2, short0/short1) for conversion."""

    c2: int
    k: int = 3
    s: int = 1
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv0")(x, train=train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype,
                       name="conv1")(y, train=train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype,
                      name="conv2")(y, train=train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False,
                        dtype=self.dtype, name="short0")(x, train=train)
            sc = ConvBNAct(self.c2, 1, 1, act=False, dtype=self.dtype,
                           name="short1")(sc, train=train)
        else:
            sc = x
        return y + sc


class TransformerLayer(nn.Module):
    """Pre-projected multi-head self-attention block (reference
    common.py:74-89): q/k/v Linears (no bias) feed a standard MHA
    (joint in-projection with bias + out-projection, torch
    nn.MultiheadAttention semantics), then a 2-Linear feedforward; both
    sublayers residual, LayerNorm deliberately removed (upstream note)."""

    c: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C]
        c, h = self.c, self.num_heads
        d = c // h
        q = nn.Dense(c, use_bias=False, name="q", dtype=self.dtype)(x)
        k = nn.Dense(c, use_bias=False, name="k", dtype=self.dtype)(x)
        v = nn.Dense(c, use_bias=False, name="v", dtype=self.dtype)(x)
        # torch MHA in-projection (in_proj_weight/bias split into thirds)
        q = nn.Dense(c, name="in_q", dtype=self.dtype)(q)
        k = nn.Dense(c, name="in_k", dtype=self.dtype)(k)
        v = nn.Dense(c, name="in_v", dtype=self.dtype)(v)
        b, l = x.shape[0], x.shape[1]

        def heads(t):  # [B, L, C] -> [B, H, L, d]
            return t.reshape(b, l, h, d).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhld,bhmd->bhlm", qh, kh) / jnp.sqrt(
            jnp.asarray(d, qh.dtype))
        attn = nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhlm,bhmd->bhld", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, c)
        o = nn.Dense(c, name="out_proj", dtype=self.dtype)(o)
        x = o + x
        y = nn.Dense(c, use_bias=False, name="fc1", dtype=self.dtype)(x)
        y = nn.Dense(c, use_bias=False, name="fc2", dtype=self.dtype)(y)
        return y + x


class TransformerBlock(nn.Module):
    """Vision-transformer stage (reference common.py:91-108): optional Conv
    to c2, flatten HxW to a sequence, add a learned Linear position
    embedding, run num_layers TransformerLayers, reshape back to a map."""

    c2: int
    num_heads: int
    num_layers: int
    act: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBNAct(self.c2, 1, 1, act=self.act, dtype=self.dtype,
                          name="conv")(x, train=train)
        b, hh, ww, c = x.shape
        p = x.reshape(b, hh * ww, c)
        p = p + nn.Dense(c, name="linear", dtype=self.dtype)(p)
        for r in range(self.num_layers):
            p = TransformerLayer(c, self.num_heads, dtype=self.dtype,
                                 name=f"tr{r}")(p)
        return p.reshape(b, hh, ww, c)


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference common.py:156-167):
    two parallel 1x1 branches, n inner blocks (e=1.0) on one of them,
    concat, 1x1 fuse.  `variant` swaps the inner block family, covering the
    reference's C3x (CrossConv, common.py:170), C3TR (TransformerBlock,
    :178), C3SPP (SPP, :186) and C3Ghost (GhostBottleneck, :194)
    subclasses."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    act: Any = True
    dtype: Any = None
    variant: str = "bottleneck"
    k_spp: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train=train)
        if self.variant == "bottleneck":
            for r in range(self.n):
                a = Bottleneck(c_, self.shortcut, e=1.0, act=self.act,
                               dtype=self.dtype, name=f"m{r}")(a, train=train)
        elif self.variant == "cross":
            for r in range(self.n):
                a = CrossConv(c_, 3, 1, e=1.0, shortcut=self.shortcut,
                              act=self.act, dtype=self.dtype,
                              name=f"m{r}")(a, train=train)
        elif self.variant == "ghost":
            for r in range(self.n):
                a = GhostBottleneck(c_, act=self.act, dtype=self.dtype,
                                    name=f"m{r}")(a, train=train)
        elif self.variant == "transformer":
            a = TransformerBlock(c_, 4, self.n, act=self.act,
                                 dtype=self.dtype, name="m")(a, train=train)
        elif self.variant == "spp":
            a = SPP(c_, k=self.k_spp, act=self.act, dtype=self.dtype,
                    name="m")(a, train=train)
        else:
            raise ValueError(f"unknown C3 variant {self.variant!r}")
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


def contract(x, gain: int = 2):
    """Fold gain x gain spatial blocks into channels (reference
    common.py:277-288), matching torch's (s, s, c) permute order so
    converted weights see identical channel layout."""
    b, h, w, c = x.shape
    s = gain
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # b, h/s, w/s, s, s, c
    return x.reshape(b, h // s, w // s, c * s * s)


def expand(x, gain: int = 2):
    """Unfold channels into gain x gain spatial blocks (reference
    common.py:291-302), inverse permute order of :func:`contract`."""
    b, h, w, c = x.shape
    s = gain
    x = x.reshape(b, h, w, s, s, c // s**2)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # b, h, s, w, s, c/s^2
    return x.reshape(b, h * s, w * s, c // s**2)


def max_pool(x, k: int, s: int):
    # torch nn.MaxPool2d(k, s) default padding=0 -> VALID; the tiny spec's
    # ZeroPad row supplies the asymmetric pad before the stride-1 pool.
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s),
                       padding="VALID")
