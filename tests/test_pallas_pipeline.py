"""Fused pipeline kernel vs the per-stage jnp chain (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.ops import bank
from adaptiveisp_tpu.ops.pallas.pipeline import render_pipeline_fused

CFG = Config()
RNG = np.random.RandomState(23)


def _stages_5(n=1):
    return [
        ("exposure", jnp.asarray(np.full((n, 1), 1.2, np.float32))),
        ("improved_wb",
         jnp.asarray(np.tile([[2.40, 1.22, 1.88]], (n, 1)).astype(np.float32))),
        ("ccm", jnp.asarray(
            np.tile((np.eye(3, dtype=np.float32) * 1.2).reshape(1, 9),
                    (n, 1)))),
        ("gamma", jnp.asarray(np.full((n, 1), 0.45, np.float32))),
        ("sharpen", jnp.asarray(np.full((n, 1), 3.0, np.float32))),
    ]


def test_fused_matches_chain_5stage():
    img = jnp.asarray(RNG.rand(2, 16, 128, 3).astype(np.float32))
    stages = _stages_5(2)
    want = np.asarray(bank.render_pipeline(CFG, img, stages))
    got = np.asarray(render_pipeline_fused(CFG, img, stages, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_pointwise_stack():
    img = jnp.asarray(RNG.rand(1, 16, 128, 3).astype(np.float32))
    stages = [
        ("tone", jnp.asarray(0.5 + 1.5 * RNG.rand(1, 8).astype(np.float32))),
        ("contrast", jnp.asarray([[0.4]], np.float32)),
        ("wnb", jnp.asarray([[0.3]], np.float32)),
        ("saturation_plus", jnp.asarray([[0.6]], np.float32)),
    ]
    want = np.asarray(bank.render_pipeline(CFG, img, stages))
    got = np.asarray(render_pipeline_fused(CFG, img, stages, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_multi_tile_sharpen_borders():
    # H=32 with tile forced small enough for multiple tiles happens only for
    # larger H; use H=16 tile=16 single and H=32/tile16? _pick_tile(32)=32,
    # so use H=48 -> tile 16, 3 tiles: checks cross-tile halo correctness.
    img = jnp.asarray(RNG.rand(1, 48, 128, 3).astype(np.float32))
    stages = [("sharpen", jnp.asarray([[5.0]], np.float32))]
    want = np.asarray(bank.render_pipeline(CFG, img, stages))
    got = np.asarray(render_pipeline_fused(CFG, img, stages, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_per_sample_params():
    img = jnp.asarray(RNG.rand(2, 16, 128, 3).astype(np.float32))
    p = jnp.asarray([[0.5], [2.0]], np.float32)
    stages = [("exposure", p)]
    got = np.asarray(render_pipeline_fused(CFG, img, stages, interpret=True))
    want0 = np.asarray(img[0]) * 2 ** 0.5
    want1 = np.asarray(img[1]) * 2 ** 2.0
    np.testing.assert_allclose(got[0], want0, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want1, rtol=2e-4, atol=2e-5)
