"""Default roster — the swap-in equivalent of the reference's `--cfg config`.

Any module exporting a `cfg` Config can be selected with
`train_isp.py --cfg configs.config_default` (the reference's importlib-based
config swap, train.py:86).
"""

from adaptiveisp_tpu.config import Config

cfg = Config()
