"""render_isp.py CLI: scripted batch render, single-device vs --pipe N."""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaptiveisp_tpu.config import Config  # noqa: E402


def _write_imgs(d, n, h=32, w=40, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(d, exist_ok=True)
    arrs = []
    for i in range(n):
        a = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(a).save(os.path.join(d, f"im{i}.png"))
        arrs.append(a.astype(np.float32) / 255.0)
    return arrs


def _read_out(out_dir, n):
    outs = []
    for i in range(n):
        with Image.open(os.path.join(out_dir, f"im{i}.png")) as im:
            outs.append(np.asarray(im, np.float32) / 255.0)
    return outs


def test_stage_parsing_errors():
    from render_isp import parse_stage

    cfg = Config()
    name, p = parse_stage(cfg, "improved_wb:0.1,0.2,0.3")
    assert name == "improved_wb" and p.shape == (3,)
    with pytest.raises(ValueError):          # wrong parameter count
        parse_stage(cfg, "exposure:0.1,0.2")
    with pytest.raises(KeyError):            # unknown filter
        parse_stage(cfg, "nonexistent:1.0")


def test_render_cli_matches_direct_render(tmp_path):
    import jax.numpy as jnp

    from adaptiveisp_tpu.ops.bank import render_pipeline
    from render_isp import main

    arrs = _write_imgs(tmp_path / "imgs", 3)
    out_dir = main(["--source", str(tmp_path / "imgs"),
                    "--out", str(tmp_path / "out"), "--batch", "2",
                    "--stage", "exposure:0.4", "--stage", "gamma:0.2"])
    got = _read_out(out_dir, 3)

    cfg = Config()
    for a, g in zip(arrs, got):
        n1 = a[None]
        stages = [("exposure", jnp.full((1, 1), 0.4)),
                  ("gamma", jnp.full((1, 1), 0.2))]
        want = np.clip(np.asarray(render_pipeline(cfg, jnp.asarray(n1),
                                                  stages))[0], 0, 1)
        # png round-trip floor-quantizes (save_img), error up to 1/255
        assert np.abs(want - g).max() <= (1.0 / 255) + 1e-6


def test_render_cli_pipe_equals_single(tmp_path):
    from render_isp import main

    _write_imgs(tmp_path / "imgs", 5, seed=3)
    script = tmp_path / "chain.yaml"
    with open(script, "w") as f:
        yaml.safe_dump([{"name": "exposure", "params": [0.3]},
                        {"name": "improved_wb",
                         "params": [0.05, 0.0, -0.05]},
                        {"name": "gamma", "params": [-0.2]},
                        {"name": "sharpen", "params": [0.7]}], f)

    single = main(["--source", str(tmp_path / "imgs"),
                   "--out", str(tmp_path / "single"),
                   "--script", str(script)])
    piped = main(["--source", str(tmp_path / "imgs"),
                  "--out", str(tmp_path / "piped"),
                  "--script", str(script),
                  "--pipe", "4", "--batch", "1", "--window", "3"])
    a = _read_out(single, 5)
    b = _read_out(piped, 5)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_render_cli_pipe_stage_count_mismatch(tmp_path):
    from render_isp import main

    _write_imgs(tmp_path / "imgs", 1)
    with pytest.raises(SystemExit):
        main(["--source", str(tmp_path / "imgs"),
              "--out", str(tmp_path / "out"),
              "--stage", "exposure:0.1", "--pipe", "4"])
