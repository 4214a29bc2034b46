"""Convenience API — the torch-hub entry analog (reference hubconf.py).

One-call constructors for the three model families plus a loaded end-to-end
pipeline object usable for inference:

    import adaptiveisp_tpu.api as api
    isp = api.load_adaptive_isp(agent_ckpt=None)      # random init demo
    out = isp.process(images_nhwc)                    # 5-step adaptive ISP
    det = api.load_detector(weights="yolov3.pt")
    boxes, n = det.detect(out)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.config import Config, DEFAULT_CONFIG


@dataclasses.dataclass
class AdaptiveISP:
    """Loaded agent + jitted rollout."""

    cfg: Config
    agent: Any
    variables: Any
    steps: int = 5

    def __post_init__(self):
        from adaptiveisp_tpu.eval.rollout import jit_rollout

        self._roll = jit_rollout(self.agent, steps=self.steps)
        self._rng = np.random.RandomState(0)

    def process(self, images, pipeline: Optional[Sequence[int]] = None,
                seed: Optional[int] = None):
        """images: [N, H, W, 3] float32 in [0, 1] -> retouched images."""
        from adaptiveisp_tpu.eval.rollout import no_pipeline
        from adaptiveisp_tpu.policy.states import (get_initial_states,
                                                   get_noise)

        images = jnp.asarray(images, jnp.float32)
        n = images.shape[0]
        rng = np.random.RandomState(seed) if seed is not None else self._rng
        noises = jnp.asarray(np.stack(
            [get_noise(rng, n, self.cfg.z_dim, self.cfg.z_type)
             for _ in range(self.steps)]))
        states = jnp.asarray(get_initial_states(n, self.cfg.num_state_dim))
        pipe = (no_pipeline(self.steps) if pipeline is None
                else jnp.asarray([(-1 if p is None else int(p))
                                  for p in pipeline], jnp.int32))
        res = self._roll(self.variables, images, noises, states, pipe)
        return res.image

    def process_with_trace(self, images, **kw):
        from adaptiveisp_tpu.eval.rollout import no_pipeline
        from adaptiveisp_tpu.policy.states import (get_initial_states,
                                                   get_noise)

        images = jnp.asarray(images, jnp.float32)
        n = images.shape[0]
        noises = jnp.asarray(np.stack(
            [get_noise(self._rng, n, self.cfg.z_dim, self.cfg.z_type)
             for _ in range(self.steps)]))
        states = jnp.asarray(get_initial_states(n, self.cfg.num_state_dim))
        return self._roll(self.variables, images, noises, states,
                          no_pipeline(self.steps))


@dataclasses.dataclass
class Detector:
    model: Any
    variables: Any
    spec: Any = None

    def __post_init__(self):
        from adaptiveisp_tpu.detect.model import decode_predictions

        self._fwd = jax.jit(lambda v, x: decode_predictions(
            self.model.apply(v, x, train=False), self.spec))

    def detect(self, images, conf_thres: float = 0.25,
               iou_thres: float = 0.45, max_det: int = 300,
               multi_label: bool = False):
        from adaptiveisp_tpu.detect.nms import non_max_suppression

        preds = self._fwd(self.variables, jnp.asarray(images, jnp.float32))
        return non_max_suppression(
            preds, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, multi_label=multi_label)


def load_adaptive_isp(agent_ckpt: Optional[str] = None,
                      cfg: Config = DEFAULT_CONFIG, imgsz: int = 512,
                      steps: int = 5, seed: int = 0) -> AdaptiveISP:
    from adaptiveisp_tpu.policy.agent import create_agent_state

    agent, variables = create_agent_state(
        cfg, jax.random.PRNGKey(seed), image_size=imgsz, batch=1)
    if agent_ckpt:
        from adaptiveisp_tpu.train import checkpoint as ckpt_lib

        variables = ckpt_lib.load_weights_only(agent_ckpt)["agent_model"]
    return AdaptiveISP(cfg, agent, variables, steps=steps)


def load_detector(weights: Optional[str] = None, spec=None,
                  nc: Optional[int] = None, seed: int = 0) -> Detector:
    from adaptiveisp_tpu.detect.model import create_detector

    model, variables = create_detector(
        jax.random.PRNGKey(seed), spec=spec, nc=nc, imgsz=256)
    if weights:
        from train_isp import load_yolo_variables

        loaded = load_yolo_variables(weights)
        if loaded is not None:
            variables = loaded
    return Detector(model, variables, spec=spec)


def load_value(cfg: Config = DEFAULT_CONFIG, imgsz: int = 512, seed: int = 0):
    from adaptiveisp_tpu.policy.value import create_value_state

    return create_value_state(cfg, jax.random.PRNGKey(seed),
                              image_size=imgsz, batch=1)
