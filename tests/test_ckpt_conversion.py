"""Numerical parity of reference-checkpoint conversion.

Builds torch modules with the REFERENCE's exact architecture and state-dict
naming (FeatureExtractor conv ladder, per-filter heads named by short_name,
Value net — SURVEY §2.1), converts their state dicts with detect/convert.py,
and checks the flax forward matches the torch forward numerically.  This is
the gate that the released ckpt-lod-df-1.0 / value checkpoints load
correctly (layout: conv NCHW->HWIO, linear transpose, trunk-flatten
permutation, BN stats).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.detect import convert as C
from adaptiveisp_tpu.policy.nets import FeatureExtractor
from adaptiveisp_tpu.policy.value import Value
from adaptiveisp_tpu.policy.agent import Agent

CFG = Config()
RNG = np.random.RandomState(51)


def build_torch_trunk(in_channels: int, mid: int = 32, out_dim: int = 4096):
    """The reference FeatureExtractor ladder (agent.py:26-60) with its
    Sequential naming (layers.0 conv, layers.1 bn, layers.2 lrelu, ...)."""
    size = 64
    layers = []
    ch = mid
    layers += [nn.Conv2d(in_channels, ch, 4, 2, 1), nn.BatchNorm2d(ch),
               nn.LeakyReLU(0.2)]
    size //= 2
    while size > 4:
        in_ch = ch
        ch = out_dim // 16 if size == 8 else ch * 2
        size //= 2
        layers += [nn.Conv2d(in_ch, ch, 4, 2, 1), nn.BatchNorm2d(ch),
                   nn.LeakyReLU(0.2)]
    seq = nn.Sequential(*layers)
    # randomize BN stats so conversion is load-bearing
    for m in seq:
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.rand_like(m.weight) + 0.5
            m.bias.data = torch.randn_like(m.bias) * 0.1
    return seq


class TorchTrunkModel(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.feature_extractor = _Wrap(build_torch_trunk(in_channels))


class _Wrap(nn.Module):
    def __init__(self, seq):
        super().__init__()
        self.layers = seq

    def forward(self, x):
        return self.layers(x).reshape(x.shape[0], -1)


def test_feature_extractor_conversion_parity():
    torch.manual_seed(0)
    in_ch = 16
    tmodel = TorchTrunkModel(in_ch).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    params, stats = {}, {}
    C.convert_feature_extractor(sd, "feature_extractor", params, stats)

    x = RNG.rand(2, in_ch, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel.feature_extractor(torch.from_numpy(x)).numpy()

    fe = FeatureExtractor(mid_channels=32, output_dim=4096, dropout_prob=0.0)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    got = fe.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)
    # flax flattens (h, w, c); torch flattens (c, h, w) — compare through the
    # permutation the converter applies to consumers of these features
    perm = C.nchw_flatten_permutation(256, 4, 4)
    got_in_torch_order = np.zeros_like(want)
    got_np = np.asarray(got)
    got_in_torch_order[:, :] = got_np[:, np.argsort(perm)][:, :]
    # equivalently: want[:, perm] should equal got
    np.testing.assert_allclose(np.asarray(got), want[:, perm],
                               rtol=1e-3, atol=1e-4)


class TorchValue(nn.Module):
    """The reference Value net (value.py:48-99) with its state-dict names."""

    def __init__(self, in_channels):
        super().__init__()
        self.feature_extractor = _Wrap(build_torch_trunk(in_channels))
        self.fc1 = nn.Linear(4096, 128)
        self.fc2 = nn.Linear(128, 1)
        self.lrelu = nn.LeakyReLU(0.2)

    def forward(self, images_nchw, states):
        images = images_nchw  # already 64x64 in the test
        lum = (images[:, 0] * 0.27 + images[:, 1] * 0.67
               + images[:, 2] * 0.06 + 1e-5)[:, None]
        luminance = lum.mean(dim=(1, 2, 3))
        contrast = torch.var(lum, dim=(1, 2, 3))
        i_max, _ = torch.max(torch.clip(images, 0, 1), dim=1)
        i_min, _ = torch.min(torch.clip(images, 0, 1), dim=1)
        sat = (i_max - i_min) / (torch.minimum(i_max + i_min,
                                               2.0 - i_max - i_min) + 1e-2)
        saturation = sat.mean(dim=[1, 2])
        feats = torch.stack([luminance, contrast, saturation], dim=1)
        states = torch.cat([states, feats], dim=1)
        states = states[:, :, None, None] + images[:, 0:1] * 0
        x = torch.cat([images, states], dim=1)
        f = self.feature_extractor(x)
        return self.fc2(self.lrelu(self.fc1(f)))


def test_value_conversion_parity():
    torch.manual_seed(1)
    n_state = CFG.num_state_dim  # 13 -> input channels 3 + 13 + 3 = 19
    tval = TorchValue(3 + n_state + 3).eval()
    sd = {k: v.numpy() for k, v in tval.state_dict().items()}
    params, stats = C.convert_value_state_dict(sd)

    images = RNG.rand(2, 3, 64, 64).astype(np.float32)
    states = RNG.rand(2, n_state).astype(np.float32)
    with torch.no_grad():
        want = tval(torch.from_numpy(images),
                    torch.from_numpy(states)).numpy()

    value = Value(cfg=CFG, feature_size=64)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    got = value.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
                      jnp.asarray(states), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _torch_agent_heads():
    """Per-filter heads + selector with reference naming (agent.py:71-84,
    filters.py:48-55)."""
    from adaptiveisp_tpu.ops.bank import filter_specs

    mods = {}
    for spec in filter_specs(CFG):
        mods[spec.short_name + ".fc1"] = nn.Linear(4096, 128)
        mods[spec.short_name + ".fc_filter"] = nn.Linear(128, spec.n_params)
        mods[spec.short_name + ".fc_mask"] = nn.Linear(128, 6)
    mods["fc1"] = nn.Linear(4096, 128)
    mods["fc2"] = nn.Linear(128, len(CFG.filters))
    return mods


def test_agent_conversion_parity():
    """Full agent conversion: trunks + heads + selector; compares pdf and
    squashed filter params against a torch recomputation."""
    torch.manual_seed(2)
    in_ch = 3 + CFG.num_state_dim
    t_fe = TorchTrunkModel(in_ch).eval()
    t_sel = TorchTrunkModel(in_ch).eval()
    heads = _torch_agent_heads()

    sd = {}
    for k, v in t_fe.state_dict().items():
        sd[k] = v.numpy()
    for k, v in t_sel.state_dict().items():
        sd[k.replace("feature_extractor", "action_selection")] = v.numpy()
    for name, mod in heads.items():
        sd[name + ".weight"] = mod.weight.detach().numpy()
        sd[name + ".bias"] = mod.bias.detach().numpy()

    params, stats = C.convert_agent_state_dict(sd, CFG)
    agent = Agent(cfg=CFG, feature_size=64)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}

    x = RNG.rand(1, 3, 64, 64).astype(np.float32)
    z = RNG.rand(1, CFG.z_dim).astype(np.float32)
    states = np.zeros((1, CFG.num_state_dim), np.float32)

    out, new_states, surrogate, penalty, _, info = agent.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(z),
        jnp.asarray(states), 1.0, train=False)

    # torch recomputation of the selector pdf
    lrelu = nn.LeakyReLU(0.2)
    with torch.no_grad():
        enriched = np.concatenate(
            [x, np.broadcast_to(states[:, :, None, None], (1, 13, 64, 64))],
            axis=1).astype(np.float32)
        sel_feat = t_sel.feature_extractor(torch.from_numpy(enriched))
        logits = heads["fc2"](lrelu(heads["fc1"](sel_feat)))
        pdf = torch.softmax(logits, dim=-1).numpy() + 1e-37
    pdf = pdf * (1 - CFG.exploration) + CFG.exploration / 10
    pdf = pdf / (pdf.sum(1, keepdims=True) + 1e-30)
    np.testing.assert_allclose(np.asarray(info["pdf"]), pdf,
                               rtol=1e-3, atol=1e-5)

    # torch recomputation of one filter head's squashed params (exposure)
    with torch.no_grad():
        filt_feat = t_fe.feature_extractor(torch.from_numpy(enriched))
        raw = heads["E.fc_filter"](lrelu(heads["E.fc1"](filt_feat))).numpy()
    want_exposure = np.tanh(raw) * 0.5 + 0.5
    want_exposure = want_exposure * 7.0 - 3.5
    np.testing.assert_allclose(np.asarray(info["filter_params"][0]),
                               want_exposure, rtol=1e-3, atol=1e-4)
