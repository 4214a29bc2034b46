"""adaptiveisp_tpu — TPU-native (JAX/XLA/Pallas) AdaptiveISP framework.

A from-scratch re-design of OpenImagingLab/AdaptiveISP (NeurIPS 2024): a
task-driven, scene-adaptive ISP that builds a per-image processing pipeline
with deep RL, rewarded by a frozen YOLOv3 detection loss.  See SURVEY.md for
the reference layer map this framework covers.
"""

from adaptiveisp_tpu.config import Config, TrainConfig, DEFAULT_CONFIG

__version__ = "0.2.0"
__all__ = ["Config", "TrainConfig", "DEFAULT_CONFIG",
           "load_adaptive_isp", "load_detector"]


def load_adaptive_isp(*args, **kw):
    """Hub-style one-call loader (see adaptiveisp_tpu.api)."""
    from adaptiveisp_tpu import api

    return api.load_adaptive_isp(*args, **kw)


def load_detector(*args, **kw):
    """Hub-style one-call detector loader (see adaptiveisp_tpu.api)."""
    from adaptiveisp_tpu import api

    return api.load_detector(*args, **kw)
