"""High-res qualitative rollout (the reference DynamicISP.val path)."""

import os

import numpy as np
import jax
import pytest

from adaptiveisp_tpu.config import Config, TrainConfig
from adaptiveisp_tpu.eval.hr_render import run_hr_validation

CFG = Config(test_steps=2)
RNG = np.random.RandomState(91)


@pytest.fixture(scope="module")
def toy_hr_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("hr")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    for i in range(2):
        arr = (RNG.rand(96, 128, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{i}.png")
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    return str(root / "images")


def test_hr_render_produces_artifacts(toy_hr_dir, tmp_path):
    tcfg = TrainConfig(batch_size=1, epochs=1, imgsz=64)
    data = {"val": toy_hr_dir, "source": "normalize"}
    out_dir = run_hr_validation(CFG, tcfg, data, model_weights=None,
                                save_dir=str(tmp_path / "hr"), steps=2,
                                max_images=2)
    assert os.path.isdir(out_dir)
    step0 = os.listdir(os.path.join(out_dir, "step-0"))
    strips = os.listdir(os.path.join(out_dir, "all-step"))
    assert len(step0) == 2 and len(strips) == 2
    # high-res frames are the pre-letterbox (max-side-capped) image — the
    # reference HR variants also keep load_image's resized copy, so aspect
    # is preserved without padding: 128x96 capped to 64 -> 64x48
    from PIL import Image

    im = Image.open(os.path.join(out_dir, "step-0", step0[0]))
    assert im.size == (64, 48)


def test_hr_render_spatial_shard_matches_single_device(toy_hr_dir, tmp_path):
    """sp-sharded big-frame application (rows over 4 devices) writes the
    same pixels as the single-device path — halo exchange is correct."""
    tcfg = TrainConfig(batch_size=1, epochs=1, imgsz=64)
    data = {"val": toy_hr_dir, "source": "normalize"}
    base = run_hr_validation(CFG, tcfg, data, model_weights=None,
                             save_dir=str(tmp_path / "a"), steps=2,
                             max_images=1)
    shrd = run_hr_validation(CFG, tcfg, data, model_weights=None,
                             save_dir=str(tmp_path / "b"), steps=2,
                             max_images=1, spatial_shard=4)
    from PIL import Image

    for fname in os.listdir(os.path.join(base, "step-0")):
        a = np.asarray(Image.open(os.path.join(base, "step-0", fname)))
        b = np.asarray(Image.open(os.path.join(shrd, "step-0", fname)))
        np.testing.assert_array_equal(a, b)
