"""CLI argument plumbing, config-module swap, dataset resolution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_train_cli_lod_coupling_rules():
    from train_isp import parse_args

    args = parse_args(["--data_name", "lod", "--add_noise",
                       "--bri_range", "0.1", "0.3"])
    # the reference forces these off for lod (train.py:652-655)
    assert args.add_noise is False
    assert args.bri_range is None
    assert args.use_linear is False
    assert args.save_path.startswith("lod-")


def test_train_cli_coco_keeps_noise():
    from train_isp import parse_args

    args = parse_args(["--data_name", "coco", "--add_noise",
                       "--noise_level", "0.005"])
    assert args.add_noise is True
    assert args.noise_level == 0.005


def test_val_cli_defaults_match_reference_protocol():
    from val_isp import parse_args

    args = parse_args(["--data", "lod"])
    assert args.conf_thres == 0.001
    assert args.iou_thres == 0.6
    assert args.max_det == 300
    assert args.steps == 5
    assert args.imgsz == 512
    assert args.batch_size == 1


def test_cfg_module_swap():
    from train_isp import load_cfg

    cfg = load_cfg("configs.config_fast_filters")
    assert cfg.n_filters == 8
    assert "denoise" not in cfg.filters
    assert len(cfg.filters_runtime) == 8
    assert cfg.num_state_dim == 11
    assert cfg.z_dim == 3 + 8 * 16

    cfg_rt = load_cfg("configs.config_runtime")
    assert cfg_rt.filter_runtime_penalty is True
    assert cfg_rt.filter_runtime_penalty_lambda == 5e-3

    assert load_cfg(None).n_filters == 10


def test_reduced_roster_agent_runs():
    """The roster swap must flow through the whole policy graph."""
    from train_isp import load_cfg
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states

    cfg = load_cfg("configs.config_fast_filters")
    model, variables = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=64, batch=1)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    z = jnp.asarray(rng.rand(1, cfg.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
    out, ns, _, _, _, info = model.apply(variables, x, z, states, 1.0,
                                         train=False)
    assert info["pdf"].shape == (1, 8)
    assert ns.shape == (1, 11)


def test_check_dataset_builtins_and_yaml(tmp_path):
    from adaptiveisp_tpu.data.dataset_config import check_dataset

    d = check_dataset("lod")
    assert d["nc"] == 80
    assert d["train"].endswith("RAW_dark_train.txt")
    assert d["source"] == "normalize"

    yaml_path = tmp_path / "custom.yaml"
    yaml_path.write_text(
        "path: /data/x\ntrain: tr.txt\nval: va.txt\nnc: 3\n"
        "names: [a, b, c]\n")
    d2 = check_dataset(str(yaml_path))
    assert d2["train"] == "/data/x/tr.txt"
    assert d2["names"] == {0: "a", 1: "b", 2: "c"}

    with pytest.raises(FileNotFoundError):
        check_dataset("nonexistent_dataset")


def test_imgsz_hyp_scales_by_level_count():
    from adaptiveisp_tpu.train.trainer import imgsz_hyp

    h3 = imgsz_hyp(512, nc=80, nl=3)
    h2 = imgsz_hyp(512, nc=80, nl=2)       # yolov3-tiny reward detector
    assert np.isclose(h2.box, h3.box * 3 / 2)
    assert np.isclose(h2.obj, h3.obj * 3 / 2)
    assert np.isclose(h2.cls, h3.cls * 3 / 2)


def test_train_cli_hyp_yaml_matches_builtin_scaling(tmp_path):
    """--hyp with scratch-low values == the built-in imgsz_hyp scaling
    (reference train.py:96-101, 140-148)."""
    import yaml

    from adaptiveisp_tpu.detect.hyp import load_hyp, split_hyp
    from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC
    from adaptiveisp_tpu.train.trainer import imgsz_hyp

    path = tmp_path / "hyp.yaml"
    with open(path, "w") as f:
        yaml.safe_dump({"box": 0.05, "cls": 0.5, "obj": 1.0}, f)
    _, loss_hyp, _ = split_hyp(load_hyp(str(path)),
                               nl=len(YOLOV3_SPEC["anchors"]),
                               nc=YOLOV3_SPEC["nc"], imgsz=512)
    want = imgsz_hyp(512, nc=YOLOV3_SPEC["nc"],
                     nl=len(YOLOV3_SPEC["anchors"]))
    assert np.isclose(loss_hyp.box, want.box)
    assert np.isclose(loss_hyp.cls, want.cls)
    assert np.isclose(loss_hyp.obj, want.obj)

    # and a non-default value actually flows through
    with open(path, "w") as f:
        yaml.safe_dump({"box": 0.1, "cls": 0.5, "obj": 1.0}, f)
    _, loss_hyp2, _ = split_hyp(load_hyp(str(path)), nl=3, nc=80, imgsz=512)
    assert np.isclose(loss_hyp2.box, 0.1)


def test_train_cli_yolo_spec_flag():
    from train_isp import parse_args

    args = parse_args(["--yolo_spec", "yolov3-tiny"])
    assert args.yolo_spec == "yolov3-tiny"
