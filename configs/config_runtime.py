"""Runtime-penalty training config (BASELINE config 5: lambda = 5e-3)."""

from adaptiveisp_tpu.config import Config

cfg = Config(filter_runtime_penalty=True, filter_runtime_penalty_lambda=5e-3)
