"""Expert-parallel (ep) and pipeline-parallel (pp) sharding correctness.

Both must be numerically identical to their single-device equivalents:
ep blend == bank.render_blend, pp streaming render == sequential per-frame
bank.render_pipeline.  Runs on the 8-device virtual CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.ops.bank import (
    filter_specs, get_spec, render_blend, render_pipeline)
from adaptiveisp_tpu.ops.ep import make_ep_blend_render
from adaptiveisp_tpu.ops.pp import make_pipelined_render
from adaptiveisp_tpu.train import mesh as mesh_lib

RNG = np.random.RandomState(23)


def _all_params(cfg, batch):
    return [jnp.asarray(RNG.rand(batch, s.n_params).astype(np.float32)
                        * 2 - 1)
            for s in filter_specs(cfg)]


def _stage_params(cfg, names):
    return [jnp.asarray(RNG.rand(get_spec(cfg, n).n_params)
                        .astype(np.float32) * 2 - 1) for n in names]


# ---------------------------------------------------------------- ep ----

@pytest.mark.parametrize("shape", [(4, 2), (1, 5)],
                         ids=["dp-x-ep", "pure-ep"])
def test_ep_blend_equals_render_blend(shape):
    cfg = Config()
    n_data, n_expert = shape
    batch = 2 * n_data
    img = jnp.asarray(RNG.rand(batch, 32, 32, 3).astype(np.float32))
    params = _all_params(cfg, batch)
    actions = RNG.randint(0, cfg.n_filters, size=batch)
    onehot = jnp.asarray(np.eye(cfg.n_filters, dtype=np.float32)[actions])

    want = render_blend(cfg, img, params, onehot)

    mesh = mesh_lib.make_mesh_dp_ep(n_data, n_expert)
    fn = make_ep_blend_render(cfg, mesh)
    got = fn(img, params, onehot)
    assert got.sharding.spec == jax.sharding.PartitionSpec(
        "data", None, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ep_blend_soft_weights():
    """The blend contract is a weighted sum, not argmax — soft weights
    (every expert contributing) must also match."""
    cfg = Config()
    batch = 2
    img = jnp.asarray(RNG.rand(batch, 32, 32, 3).astype(np.float32))
    params = _all_params(cfg, batch)
    w = RNG.rand(batch, cfg.n_filters).astype(np.float32)
    w = jnp.asarray(w / w.sum(axis=1, keepdims=True))

    want = render_blend(cfg, img, params, w)
    fn = make_ep_blend_render(cfg, mesh_lib.make_mesh_dp_ep(1, 2))
    got = fn(img, params, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ep_rejects_nondividing_experts():
    cfg = Config()  # 10 filters
    with pytest.raises(ValueError):
        make_ep_blend_render(cfg, mesh_lib.make_mesh_dp_ep(2, 3))


# ---------------------------------------------------------------- pp ----

@pytest.mark.parametrize("shape,names", [
    ((1, 5), ["exposure", "improved_wb", "ccm", "gamma", "sharpen"]),
    ((2, 4), ["exposure", "gamma", "contrast", "saturation_plus"]),
], ids=["pure-pp-5stage", "dp-x-pp-4stage"])
def test_pipelined_render_equals_sequential(shape, names):
    cfg = Config()
    n_data, n_pipe = shape
    m, n = 7, n_data  # 7 frames, microbatch = n_data
    frames = jnp.asarray(RNG.rand(m, n, 32, 32, 3).astype(np.float32))
    params = _stage_params(cfg, names)

    stages = [(nm, jnp.broadcast_to(p[None], (n, p.shape[0])))
              for nm, p in zip(names, params)]
    want = np.stack([np.asarray(render_pipeline(cfg, frames[t], stages,
                                                allow_fused=False))
                     for t in range(m)])

    mesh = mesh_lib.make_mesh_dp_pp(n_data, n_pipe)
    fn = make_pipelined_render(cfg, mesh, names)
    got = fn(frames, params)
    assert got.shape == frames.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_pipelined_render_single_stage_degenerate():
    cfg = Config()
    frames = jnp.asarray(RNG.rand(3, 1, 16, 16, 3).astype(np.float32))
    params = _stage_params(cfg, ["exposure"])
    fn = make_pipelined_render(cfg, mesh_lib.make_mesh_dp_pp(1, 1), ["exposure"])
    got = fn(frames, params)
    want = np.stack([np.asarray(render_pipeline(
        cfg, frames[t],
        [("exposure", jnp.broadcast_to(params[0][None], (1, 1)))],
        allow_fused=False)) for t in range(3)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_pipelined_render_stage_count_mismatch():
    cfg = Config()
    with pytest.raises(ValueError):
        make_pipelined_render(cfg, mesh_lib.make_mesh_dp_pp(1, 4),
                              ["exposure", "gamma"])
