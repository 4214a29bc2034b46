"""Fixed-pipeline optimizer: loss decreases on a crafted task."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.detect.loss import LossHyp, per_image_loss_batch
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.train.fixed_pipeline import (
    init_raw_params, optimize_fixed_pipeline, render_with_raw_params)

CFG = Config(use_pallas=False)
RNG = np.random.RandomState(61)

SPEC = {
    "nc": 4,
    "anchors": [[10, 14, 23, 27, 37, 58]],
    "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],
    "head": [[[3], 1, "Detect", ["nc", "anchors"]]],
}
ANCHORS = [np.asarray(SPEC["anchors"][0], np.float32).reshape(-1, 2) / 16]


def test_init_and_render():
    raw = init_raw_params(CFG, ("exposure", "gamma"))
    # keep pixels above gamma's 0.001 clip floor so identity holds exactly
    img = jnp.asarray((RNG.rand(1, 32, 32, 3) * 0.9 + 0.1).astype(np.float32))
    out = render_with_raw_params(CFG, img, ("exposure", "gamma"), raw)
    assert out.shape == img.shape
    # zero raw features: exposure = 0 EV (identity), gamma = 1 (identity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-4, atol=1e-5)


def test_optimize_reduces_detect_loss():
    model, variables = create_detector(jax.random.PRNGKey(0), spec=SPEC,
                                       imgsz=32)
    imgs = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32) * 0.1)
    targets = jnp.asarray(np.tile([[1, 0.5, 0.5, 0.5, 0.5]], (2, 1))
                          .reshape(2, 1, 5).astype(np.float32))
    tmask = jnp.ones((2, 1), bool)
    hyp = LossHyp(obj=0.64 * (32 / 640) ** 2)

    stages, raw, history = optimize_fixed_pipeline(
        CFG, ("exposure", "gamma"), model, variables, ANCHORS,
        batches=[(imgs, targets, tmask)], hyp=hyp, lr=0.1, steps=30,
        verbose=False)
    assert len(stages) == 2 and stages[0][0] == "exposure"
    # the optimizer should reduce the detection loss on its own objective
    assert history[-1] < history[0]
