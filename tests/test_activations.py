"""Activation zoo tests.

Reference parity targets: ``yolov3/utils/activations.py`` (SiLU, Hardswish,
Mish, FReLU, AconC, MetaAconC) and the spec-level ``activation:`` override
(``yolov3/models/yolo.py:302-305``).  Stateless activations are checked
against torch.nn.functional oracles; the learnable ones against their paper
formulas computed from extracted parameters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect import activations as A
from adaptiveisp_tpu.detect.layers import ConvBNAct
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.detect.spec import _normalize_activation, load_spec

X = np.linspace(-6.0, 6.0, 121).astype(np.float32)


@pytest.mark.parametrize("name,torch_fn", [
    ("silu", "silu"),
    ("hardswish", "hardswish"),
    ("mish", "mish"),
    ("relu", "relu"),
    ("relu6", "relu6"),
    ("hardsigmoid", "hardsigmoid"),
])
def test_stateless_vs_torch(name, torch_fn):
    import torch
    import torch.nn.functional as F

    got = np.asarray(A.ACTIVATIONS[name](jnp.asarray(X)))
    want = getattr(F, torch_fn)(torch.from_numpy(X)).numpy()
    assert np.abs(got - want).max() < 1e-6


def test_leaky_relu_slope():
    got = np.asarray(A.leaky_relu(jnp.asarray(X)))
    want = np.where(X > 0, X, 0.1 * X)
    assert np.abs(got - want).max() < 1e-6


def test_frelu_dominates_input():
    """max(x, funnel(x)) >= x elementwise, shape preserved, params exist."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6)
                    .astype(np.float32))
    m = A.FReLU()
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert bool((y >= x - 1e-6).all())
    conv = variables["params"]["conv"]["kernel"]
    assert conv.shape == (3, 3, 1, 6)  # depthwise


def test_aconc_formula():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 5)
                    .astype(np.float32))
    m = A.AconC()
    variables = m.init(jax.random.PRNGKey(1), x)
    y = np.asarray(m.apply(variables, x))
    p = jax.device_get(variables["params"])
    p1, p2, beta = p["p1"], p["p2"], p["beta"]
    xn = np.asarray(x)
    d = (p1 - p2) * xn
    want = d / (1.0 + np.exp(-beta * d)) + p2 * xn
    assert np.abs(y - want).max() < 1e-5


def test_aconc_beta_limits():
    """beta -> 0 gives the mean of the two linear branches; large beta
    approaches max(p1*x, p2*x) (the ACON paper's smooth-maximum property)."""
    x = jnp.asarray(np.linspace(-3, 3, 61).reshape(1, 1, 61, 1)
                    .astype(np.float32))
    m = A.AconC()
    variables = m.init(jax.random.PRNGKey(2), x)
    shape = jax.device_get(variables["params"]["p1"]).shape

    def params(beta):
        return {"p1": np.ones(shape, np.float32),
                "p2": np.zeros(shape, np.float32),
                "beta": np.full(shape, beta, np.float32)}

    y = np.asarray(m.apply({"params": params(1e4)}, x)).ravel()
    assert np.abs(y - np.maximum(np.asarray(x).ravel(), 0.0)).max() < 1e-3
    y0 = np.asarray(m.apply({"params": params(0.0)}, x)).ravel()
    assert np.abs(y0 - 0.5 * np.asarray(x).ravel()).max() < 1e-5


def test_meta_aconc_formula():
    """beta = sigmoid(fc2(fc1(mean_hw(x)))), then the ACON-C formula with
    that per-(image, channel) beta (reference activations.py:81-103)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    m = A.MetaAconC()
    variables = m.init(jax.random.PRNGKey(3), x)
    y = np.asarray(m.apply(variables, x))
    assert y.shape == x.shape and np.isfinite(y).all()
    p = jax.device_get(variables["params"])
    xn = np.asarray(x)
    pooled = xn.mean(axis=(1, 2), keepdims=True)        # (N,1,1,C)
    h = (np.einsum("nhwc,kkcd->nhwd", pooled, p["fc1"]["kernel"])
         + p["fc1"]["bias"])
    h = (np.einsum("nhwc,kkcd->nhwd", h, p["fc2"]["kernel"])
         + p["fc2"]["bias"])
    beta = 1.0 / (1.0 + np.exp(-h))
    d = (p["p1"] - p["p2"]) * xn
    want = d / (1.0 + np.exp(-beta * d)) + p["p2"] * xn
    assert np.abs(y - want).max() < 1e-4


def test_conv_block_act_by_name():
    x = jnp.asarray(np.random.RandomState(4).rand(1, 8, 8, 3)
                    .astype(np.float32))
    outs = {}
    for act in (True, "mish", "frelu", False):
        m = ConvBNAct(8, 3, 1, act=act)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        outs[act] = np.asarray(m.apply(variables, x, train=False))
    assert not np.allclose(outs[True], outs["mish"], atol=1e-4)
    assert not np.allclose(outs[True], outs[False], atol=1e-4)
    # frelu has extra params under .../act
    m = ConvBNAct(8, 3, 1, act="frelu")
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "act" in variables["params"]


def test_unknown_activation_raises():
    x = jnp.zeros((1, 4, 4, 3), jnp.float32)
    m = ConvBNAct(4, 1, 1, act="nonexistent")
    with pytest.raises(KeyError, match="nonexistent"):
        m.init(jax.random.PRNGKey(0), x, train=False)


MICRO_SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58]],
    "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],
    "head": [[[1], 1, "Detect", ["nc", "anchors"]]],
}


def test_spec_level_activation_override():
    """spec['activation'] rebinds every Conv block's activation (reference
    yolo.py:302-305); 'silu' must equal the default bit-for-bit."""
    x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 3)
                    .astype(np.float32))
    outs = {}
    for act in (None, "silu", "leaky_relu"):
        spec = dict(MICRO_SPEC)
        if act:
            spec["activation"] = act
        model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                           imgsz=32)
        outs[act] = np.asarray(model.apply(variables, x, train=False))
    assert np.array_equal(outs[None], outs["silu"])
    assert not np.allclose(outs[None], outs["leaky_relu"], atol=1e-4)


def test_ultralytics_activation_spellings():
    assert _normalize_activation("nn.LeakyReLU(0.1)") == "leaky_relu"
    assert _normalize_activation("nn.SiLU()") == "silu"
    assert _normalize_activation("nn.Hardswish()") == "hardswish"
    assert _normalize_activation("Mish()") == "mish"
    assert _normalize_activation("MetaAconC(c1=16)") == "meta_aconc"
    spec = load_spec({**MICRO_SPEC, "activation": "nn.ReLU()"})
    assert spec["activation"] == "relu"
