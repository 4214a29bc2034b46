"""adaptiveisp_tpu — TPU-native (JAX/XLA/Pallas) AdaptiveISP framework.

A from-scratch re-design of OpenImagingLab/AdaptiveISP (NeurIPS 2024): a
task-driven, scene-adaptive ISP that builds a per-image processing pipeline
with deep RL, rewarded by a frozen YOLOv3 detection loss.  See SURVEY.md for
the reference layer map this framework covers.
"""

from adaptiveisp_tpu.config import Config, TrainConfig, DEFAULT_CONFIG

__version__ = "0.1.0"
__all__ = ["Config", "TrainConfig", "DEFAULT_CONFIG"]
