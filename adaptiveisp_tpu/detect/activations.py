"""Activation zoo + spec-level activation override.

Counterpart of the reference's ``yolov3/utils/activations.py`` (SiLU,
Hardswish, Mish, FReLU, AconC, MetaAconC) and of the ``activation:`` YAML
key that rebinds the default Conv activation for a whole model
(``yolov3/models/yolo.py:302-305``, ``models/common.py:47-53``).

Stateless activations are pure jnp functions; FReLU / AconC / MetaAconC are
parameterized (flax modules instantiated inside the owning Conv block, so
their parameters live under ``.../act``).  Formulas follow the public papers
(FReLU: Ma et al., ECCV 2020; ACON: Ma et al., CVPR 2021); the torch
checkpoint converter only covers the SiLU default — models trained with a
learnable activation are checkpointed natively (orbax/pickle).

Usage::

    spec = {**YOLOV3_SPEC, "activation": "mish"}   # whole-model override
    ConvBNAct(64, 3, 1, act="frelu")               # per-block override
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


# ---------------------------------------------------------------- stateless

def silu(x):
    return nn.silu(x)


def hardswish(x):
    # x * relu6(x + 3) / 6 (torch nn.Hardswish, reference activations.py:18)
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    # x * tanh(softplus(x)) (reference activations.py:26)
    return x * jnp.tanh(nn.softplus(x))


def leaky_relu(x):
    # LeakyReLU(0.1) — the darknet-era YOLO default
    return nn.leaky_relu(x, negative_slope=0.1)


def relu(x):
    return nn.relu(x)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def hardsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def identity(x):
    return x


# ------------------------------------------------------------ parameterized

class FReLU(nn.Module):
    """Funnel activation: ``max(x, BN(depthwise3x3(x)))`` (reference
    activations.py:53-61).  The funnel condition is a per-channel spatial
    context — a depthwise conv, so it stays cheap on the MXU."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        t = nn.Conv(c, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=c, use_bias=False, name="conv")(x)
        t = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(t)
        return jnp.maximum(x, t)


class AconC(nn.Module):
    """ACON-C: ``(p1-p2)*x*sigmoid(beta*(p1-p2)*x) + p2*x`` with learnable
    per-channel p1, p2, beta (reference activations.py:64-78).  Smoothly
    interpolates between linear (beta->0 mean) and max-like (beta->inf)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, c))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, c))
        beta = self.param("beta", nn.initializers.ones, (1, 1, 1, c))
        d = (p1 - p2) * x
        return d * nn.sigmoid(beta * d) + p2 * x


class MetaAconC(nn.Module):
    """ACON-C with beta generated per (image, channel) by a small
    channel-bottleneck network over globally pooled features (reference
    activations.py:81-103, r=16)."""

    r: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c2 = max(self.r, c // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, c))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, c))
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(c2, kernel_size=(1, 1), use_bias=True, name="fc1")(y)
        y = nn.Conv(c, kernel_size=(1, 1), use_bias=True, name="fc2")(y)
        beta = nn.sigmoid(y)
        d = (p1 - p2) * x
        return d * nn.sigmoid(beta * d) + p2 * x


ACTIVATIONS: dict[str, Any] = {
    "silu": silu,
    "hardswish": hardswish,
    "mish": mish,
    "leaky_relu": leaky_relu,
    "relu": relu,
    "relu6": relu6,
    "hardsigmoid": hardsigmoid,
    "identity": identity,
    "frelu": FReLU,
    "aconc": AconC,
    "meta_aconc": MetaAconC,
}


def apply_activation(act: Any, x, train: bool = False):
    """Apply a ConvBNAct ``act`` setting inside a compact module context.

    ``True`` -> SiLU (the reference Conv default, common.py:47);
    ``False``/``None`` -> identity; a string -> registry lookup (stateless
    fn applied directly, parameterized module instantiated as ``act``);
    a callable -> applied as-is.
    """
    if act is True:
        return nn.silu(x)
    if act is False or act is None:
        return x
    if isinstance(act, str):
        try:
            entry = ACTIVATIONS[act]
        except KeyError:
            raise KeyError(
                f"unknown activation {act!r}; known: "
                f"{sorted(ACTIVATIONS)}") from None
        if isinstance(entry, type) and issubclass(entry, nn.Module):
            return entry(name="act")(x, train=train)
        return entry(x)
    if callable(act):
        return act(x)
    raise TypeError(f"activation spec must be bool/str/callable, got {act!r}")
