"""Spatial (sp) sharding of the ISP render over a device mesh.

A high-res frame's rows are spread over the 'spatial' mesh axis; GSPMD
must insert correct halo exchanges for the windowed stages (sharpen's
gaussian blur, NLM's window shifts), so the sharded result must equal the
single-device render exactly.  Runs on the 8-device virtual CPU mesh from
conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.ops.bank import (
    get_spec, make_sharded_render, render_pipeline)
from adaptiveisp_tpu.train import mesh as mesh_lib

RNG = np.random.RandomState(11)

STAGES = ["exposure", "improved_wb", "ccm", "gamma", "sharpen"]


def _params(cfg, names, batch):
    out = []
    for n in names:
        spec = get_spec(cfg, n)
        out.append(jnp.asarray(
            RNG.rand(batch, spec.n_params).astype(np.float32) * 2 - 1))
    return out


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)],
                         ids=["pure-sp", "dp-x-sp"])
def test_sharded_render_equals_single_device(shape):
    cfg = Config()
    n_data, n_spatial = shape
    batch, hw = n_data, 128
    img = jnp.asarray(RNG.rand(batch, hw, hw, 3).astype(np.float32))
    params = _params(cfg, STAGES, batch)

    want = render_pipeline(cfg, img, list(zip(STAGES, params)),
                           allow_fused=False)

    mesh = mesh_lib.make_mesh_2d(n_data, n_spatial)
    fn = make_sharded_render(cfg, mesh, STAGES)
    got = fn(img, params)
    # the output really is row-sharded over the mesh
    assert got.sharding.spec == jax.sharding.PartitionSpec(
        "data", "spatial", None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_sharded_render_with_nlm_halo():
    """NLM's 11x11 window shifts cross shard boundaries — the strongest
    halo-exchange correctness probe."""
    cfg = Config()
    img = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    params = _params(cfg, ["denoise"], 1)

    want = render_pipeline(cfg, img, [("denoise", params[0])],
                           allow_fused=False)
    mesh = mesh_lib.make_mesh_2d(1, 8)
    fn = make_sharded_render(cfg, mesh, ["denoise"])
    got = fn(img, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mesh_2d_rejects_oversubscription():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh_2d(4, 4)   # 16 > 8 virtual devices
