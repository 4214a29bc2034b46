"""Model export.

The reference exports the torch detector to 12 formats
(/root/reference/yolov3/export.py).  The TPU-native export story is
``jax.export``: serialize the jitted forward (detector alone, or the full
adaptive-ISP + detector graph) as portable StableHLO that any XLA runtime
(TPU/GPU/CPU, TF, IREE) can load — plus a pickled-variables format for pure
Python reload.
"""

from __future__ import annotations

import os
import pickle


import jax
import jax.numpy as jnp
from jax import export as jexport


def export_stablehlo(fn, example_args, path: str,
                     platforms=("cpu", "tpu")) -> str:
    """Serialize jit(fn) at the example shapes to a StableHLO artifact.

    ``platforms`` requests a MULTI-platform lowering — without it,
    jax.export embeds only the exporting backend's lowering and the
    artifact refuses to load anywhere else (the portability this module
    promises).  Falls back to the current backend when a requested
    platform has no lowering rule for some primitive."""
    try:
        exported = jexport.export(
            jax.jit(fn), platforms=list(platforms))(*example_args)
    except Exception:
        exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_detector(model, variables, path: str, imgsz: int = 512,
                    batch: int = 1, spec=None) -> str:
    """Detector forward + decode as one exported graph."""
    from adaptiveisp_tpu.detect.model import decode_predictions

    def fn(images):
        preds = model.apply(variables, images, train=False)
        return decode_predictions(preds, spec)

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    return export_stablehlo(fn, (x,), path)


def export_adaptive_isp(cfg, agent, agent_variables, path: str,
                        imgsz: int = 512, steps: int = 5,
                        batch: int = 1) -> str:
    """The full adaptive 5-step ISP rollout as one exported graph."""
    from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline

    roll = jit_rollout(agent, steps=steps)

    def fn(images, noises, states):
        res = roll(agent_variables, images, noises, states,
                   no_pipeline(steps))
        return res.image, res.states, res.selected

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    z = jnp.zeros((steps, batch, cfg.z_dim), jnp.float32)
    s = jnp.zeros((batch, cfg.num_state_dim), jnp.float32)
    return export_stablehlo(fn, (x, z, s), path)


def save_variables(variables, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    return path


def load_variables(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
