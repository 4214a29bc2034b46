"""A reduced 8-filter roster without the two most expensive ops (NLM denoise
and sharpen) — demonstrates the filter-roster swap the reference enables via
its config module (filters list, reference config.py:19-24).  Runtime costs
must stay aligned with the roster order.
"""

from adaptiveisp_tpu.config import Config

cfg = Config(
    filters=("exposure", "gamma", "ccm", "tone", "contrast",
             "saturation_plus", "wnb", "improved_wb"),
    filters_runtime=(1.7, 2.0, 1.9, 2.7, 2.1, 2.0, 1.9, 1.7),
)
