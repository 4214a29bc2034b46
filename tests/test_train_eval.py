"""Tests for the adaptive rollout, the jitted actor-critic step, and DP sharding."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptiveisp_tpu.config import Config, TrainConfig
from adaptiveisp_tpu.detect.loss import LossHyp
from adaptiveisp_tpu.detect.model import (
    anchors_in_grid_units, create_detector)
from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
from adaptiveisp_tpu.policy.agent import Agent, create_agent_state
from adaptiveisp_tpu.policy.states import get_initial_states
from adaptiveisp_tpu.policy.value import create_value_state
from adaptiveisp_tpu.train import mesh as mesh_lib
from adaptiveisp_tpu.train.optim import exp_segment_schedule, make_optimizer
from adaptiveisp_tpu.train.step import init_train_state, make_train_step

CFG = Config()
RNG = np.random.RandomState(11)
IMG = 64

# A small detector spec so the CPU test compiles fast; 2 levels.
MINI_SPEC = {
    "nc": 8,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],   # /2
        [-1, 1, "Conv", [16, 3, 2]],  # /4
        [-1, 1, "Conv", [16, 3, 2]],  # /8
        [-1, 1, "Bottleneck", [16]],
        [-1, 1, "Conv", [32, 3, 2]],  # /16
    ],
    "head": [
        [-1, 1, "Conv", [32, 3, 2]],  # /32
        [[4, 5], 1, "Detect", ["nc", "anchors"]],
    ],
}


def mini_anchors():
    return [np.asarray(MINI_SPEC["anchors"][0], np.float32).reshape(-1, 2) / 16,
            np.asarray(MINI_SPEC["anchors"][1], np.float32).reshape(-1, 2) / 32]


def test_rollout_five_steps_stops():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    roll = jit_rollout(model, steps=CFG.test_steps)
    img = jnp.asarray(RNG.rand(2, IMG, IMG, 3).astype(np.float32))
    noises = jnp.asarray(RNG.rand(5, 2, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(2, CFG.num_state_dim))
    res = roll(variables, img, noises, states, no_pipeline(5))
    assert res.image.shape == img.shape
    st = np.asarray(res.states)
    np.testing.assert_array_equal(st[:, 1], [1, 1])  # stopped
    np.testing.assert_array_equal(st[:, 2], [5, 5])  # 5 steps taken
    assert res.selected.shape == (5, 2)
    assert (np.asarray(res.selected) >= 0).all()


def test_rollout_forced_pipeline():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=1)
    roll = jit_rollout(model, steps=3)
    img = jnp.asarray(RNG.rand(1, IMG, IMG, 3).astype(np.float32))
    noises = jnp.asarray(RNG.rand(3, 1, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(1, CFG.num_state_dim))
    pipe = jnp.asarray([0, 6, 9], jnp.int32)  # exposure, contrast, wb
    res = roll(variables, img, noises, states, pipe)
    np.testing.assert_array_equal(np.asarray(res.selected).ravel(), [0, 6, 9])
    st = np.asarray(res.states)
    assert st[0, 2] == 3 and st[0, 1] == 0  # 3 steps, not stopped
    # usage bits for 0, 6, 9 set
    np.testing.assert_array_equal(st[0, 3:][[0, 6, 9]], [1, 1, 1])


def test_rollout_early_stop_masks_updates():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=1)
    roll = jit_rollout(model, steps=4)
    img = jnp.asarray(RNG.rand(1, IMG, IMG, 3).astype(np.float32))
    noises = jnp.asarray(RNG.rand(4, 1, CFG.z_dim).astype(np.float32))
    # start at step 4 -> first application sets stopped; remaining 3 masked
    states = jnp.asarray(get_initial_states(1, CFG.num_state_dim))
    states = states.at[:, 2].set(4.0)
    res = roll(variables, img, noises, states, no_pipeline(4))
    st = np.asarray(res.states)
    assert st[0, 1] == 1 and st[0, 2] == 5  # stopped exactly at step 5
    sel = np.asarray(res.selected).ravel()
    assert sel[0] >= 0 and (sel[1:] == -1).all()  # later steps masked


def _build_train_setup(batch=2):
    tcfg = TrainConfig(batch_size=batch, epochs=1)
    agent, agent_vars = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=batch)
    value, value_vars = create_value_state(
        CFG, jax.random.PRNGKey(1), image_size=IMG, batch=batch)
    yolo, yolo_vars = create_detector(
        jax.random.PRNGKey(2), spec=MINI_SPEC, imgsz=IMG)
    hyp = LossHyp()
    tx_a = make_optimizer(3e-5, 100)
    tx_v = make_optimizer(3e-5, 100)
    step_fn = make_train_step(agent, value, yolo, CFG, tcfg, mini_anchors(),
                              hyp, tx_a, tx_v)
    state = init_train_state(agent_vars, value_vars, tx_a, tx_v)
    return step_fn, state, yolo_vars


def _batch(batch=2, t_max=4):
    imgs = jnp.asarray(RNG.rand(batch, IMG, IMG, 3).astype(np.float32))
    z = jnp.asarray(RNG.rand(batch, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(batch, CFG.num_state_dim))
    targets = np.zeros((batch, t_max, 5), np.float32)
    tmask = np.zeros((batch, t_max), bool)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask[:, 0] = True
    return (imgs, z, states, jnp.asarray(targets), jnp.asarray(tmask))


def test_train_step_runs_and_updates():
    step_fn, state, yolo_vars = _build_train_setup()
    batch = _batch()
    jit_step = jax.jit(step_fn)
    out = jit_step(state, yolo_vars, batch, jax.random.PRNGKey(3), 0.0)
    m = {k: np.asarray(v) for k, v in out.metrics.items()}
    assert np.isfinite(m["agent_loss"]) and np.isfinite(m["value_loss"])
    assert np.isfinite(m["reward"])
    assert out.retouch.shape == batch[0].shape
    assert int(out.state.step) == 1
    # params updated but only slightly (grad clip 1e-5 + lr 3e-5)
    old = jax.tree_util.tree_leaves(state.agent_params)
    new = jax.tree_util.tree_leaves(out.state.agent_params)
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(old, new)]
    assert max(diffs) > 0
    assert max(diffs) < 1e-3

    # second step consumes the new state
    out2 = jit_step(out.state, yolo_vars, batch, jax.random.PRNGKey(4), 0.01)
    assert int(out2.state.step) == 2


def test_schedule_matches_reference_decay():
    sched = exp_segment_schedule(3e-5, max_iter=1000, lr_decay=0.1, segments=3)
    np.testing.assert_allclose(sched(0), 3e-5)
    np.testing.assert_allclose(sched(1000), 3e-5 * 1e-3, rtol=1e-6)
    np.testing.assert_allclose(sched(500), 3e-5 * 10 ** -1.5, rtol=1e-6)


def test_grad_clip_bounds_update_norm():
    import optax
    tx = make_optimizer(1e-3, 100, clip_norm=1e-5)
    params = {"w": jnp.ones((4, 4))}
    opt = tx.init(params)
    big_grads = {"w": jnp.full((4, 4), 1e3)}
    updates, _ = tx.update(big_grads, opt, params)
    # adam normalises, but the clip ensures the pre-adam grads were tiny;
    # just assert updates are finite and bounded by lr
    u = np.abs(np.asarray(updates["w"])).max()
    assert np.isfinite(u) and u <= 1.1e-3


def test_dp_sharded_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 cpu devices, got {n_dev}"
    step_fn, state, yolo_vars = _build_train_setup(batch=8)
    batch = _batch(batch=8)

    # single-device result
    out_single = jax.jit(step_fn)(
        state, yolo_vars, batch, jax.random.PRNGKey(3), 0.0)

    # sharded over the 8-device mesh
    mesh = mesh_lib.make_mesh()
    sharded = mesh_lib.shard_train_step(step_fn, mesh)
    state_r = mesh_lib.replicate(mesh, state)
    yolo_r = mesh_lib.replicate(mesh, yolo_vars)
    batch_s = mesh_lib.shard_batch(mesh, batch)
    out_sharded = sharded(state_r, yolo_r, batch_s,
                          jax.random.PRNGKey(3), 0.0)

    np.testing.assert_allclose(
        float(out_single.metrics["value_loss"]),
        float(out_sharded.metrics["value_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out_single.metrics["reward"]),
        float(out_sharded.metrics["reward"]), rtol=1e-3, atol=1e-5)
    # updated params agree across the sharded/unsharded paths
    a = jax.tree_util.tree_leaves(out_single.state.agent_params)[0]
    b = jax.tree_util.tree_leaves(out_sharded.state.agent_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)


def test_rollout_records_params():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=1)
    roll = jit_rollout(model, steps=2)
    img = jnp.asarray(RNG.rand(1, IMG, IMG, 3).astype(np.float32))
    noises = jnp.asarray(RNG.rand(2, 1, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(1, CFG.num_state_dim))
    res = roll(variables, img, noises, states, no_pipeline(2))
    from adaptiveisp_tpu.ops.bank import param_counts
    assert res.params.shape == (2, 1, sum(param_counts(CFG)))
    p = np.asarray(res.params)
    # exposure params live in [-3.5, 3.5]; gamma in [1/3, 3]
    assert np.all(np.abs(p[..., 0]) <= 3.5)
    assert np.all(p[..., 1] >= 1 / 3 - 1e-5) and np.all(p[..., 1] <= 3 + 1e-5)


def test_agent_masking_enabled_runs():
    cfg = CFG.replace(masking=True)
    model, variables = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    x = jnp.asarray(RNG.rand(2, IMG, IMG, 3).astype(np.float32))
    z = jnp.asarray(RNG.rand(2, cfg.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(2, cfg.num_state_dim))
    out, ns, surr, pen, _, info = model.apply(variables, x, z, states, 1.0,
                                              train=False)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1
    # with the mask the output is a partial lerp -> generally differs from
    # the unmasked render
    model2, variables2 = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    out2, *_ = model2.apply(variables2, x, z, states, 1.0, train=False)
    assert not np.allclose(o, np.asarray(out2), atol=1e-5)


def test_rollout_deterministic_given_noise():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=1)
    roll = jit_rollout(model, steps=3)
    img = jnp.asarray(RNG.rand(1, IMG, IMG, 3).astype(np.float32))
    noises = jnp.asarray(RNG.rand(3, 1, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(1, CFG.num_state_dim))
    r1 = roll(variables, img, noises, states, no_pipeline(3))
    r2 = roll(variables, img, noises, states, no_pipeline(3))
    np.testing.assert_array_equal(np.asarray(r1.image), np.asarray(r2.image))
    np.testing.assert_array_equal(np.asarray(r1.selected),
                                  np.asarray(r2.selected))


def test_initialize_detect_biases():
    from adaptiveisp_tpu.detect.model import initialize_detect_biases

    yolo, variables = create_detector(jax.random.PRNGKey(2), spec=MINI_SPEC,
                                      imgsz=IMG)
    out = initialize_detect_biases(variables, spec=MINI_SPEC, imgsz=IMG)
    det = out["params"]["l6"]
    b = np.asarray(det["m0"]["bias"]).reshape(3, -1)
    b_old = np.asarray(variables["params"]["l6"]["m0"]["bias"]).reshape(3, -1)
    # objectness bias shifted by log(8/(imgsz/stride)^2), cls by log prior
    np.testing.assert_allclose(b[:, 4] - b_old[:, 4],
                               np.log(8 / (IMG / 16) ** 2), rtol=1e-5)
    assert (b[:, 5:] < b_old[:, 5:]).all()  # negative class prior added


def test_bf16_reward_parity():
    """The frozen reward detector now defaults to bf16 in the trainer
    (train/trainer.py): the reward must stay numerically equivalent to the
    f32 reference path.  The reward is a DIFFERENCE of two clipped losses
    through the same detector, so bf16 quantization largely cancels —
    measured parity on CPU: per-image loss absdiff ~1e-4, reward (x100)
    absdiff ~0.015, correlation > 0.997."""
    from adaptiveisp_tpu.detect.loss import per_image_loss_batch
    from adaptiveisp_tpu.detect.model import DetectionModel

    _, vars_ = create_detector(jax.random.PRNGKey(2), spec=MINI_SPEC,
                               imgsz=IMG)
    f32 = DetectionModel(spec=MINI_SPEC)
    bf16 = DetectionModel(spec=MINI_SPEC, dtype=jnp.bfloat16)
    hyp = LossHyp()
    anch = mini_anchors()

    B = 6
    imgs = jnp.asarray(RNG.rand(B, IMG, IMG, 3).astype(np.float32))
    retouch = jnp.clip(imgs * 1.7 + 0.05, 0, 1)
    targets = np.zeros((B, 4, 5), np.float32)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((B, 4), bool)
    tmask[:, 0] = True
    targets, tmask = jnp.asarray(targets), jnp.asarray(tmask)

    def losses(model, x):
        p = model.apply(vars_, x, train=False)
        loss, _ = per_image_loss_batch(p, targets, tmask, anch, hyp)
        return jnp.clip(loss, 0.0, 1.0)

    li32, lr32 = losses(f32, imgs), losses(f32, retouch)
    libf, lrbf = losses(bf16, imgs), losses(bf16, retouch)
    assert float(jnp.abs(li32 - libf).max()) < 5e-3
    assert float(jnp.abs(lr32 - lrbf).max()) < 5e-3
    r32 = np.asarray((li32 - lr32) * 100).ravel()
    rbf = np.asarray((libf - lrbf) * 100).ravel()
    assert np.abs(r32 - rbf).max() < 0.25
    if r32.std() > 1e-6:
        assert np.corrcoef(r32, rbf)[0, 1] > 0.99


def test_train_step_donation_threading():
    """The trainer jits its step with donate_argnums=0 (state updated in
    place); threading the state forward must keep working."""
    step_fn, state, yolo_vars = _build_train_setup()
    jit_step = jax.jit(step_fn, donate_argnums=0)
    b = _batch()
    out = jit_step(state, yolo_vars, b, jax.random.PRNGKey(0), 0.0)
    out2 = jit_step(out.state, yolo_vars, b, jax.random.PRNGKey(1), 0.5)
    assert np.isfinite(float(out2.metrics["value_loss"]))
    assert int(jax.device_get(out2.state.step)) == 2


def test_trainer_yolo_dtype_resolution(tmp_path):
    """String dtype knobs resolve: 'bfloat16' (default) -> bf16 module,
    'float32' -> None (reference parity)."""
    import os

    from PIL import Image

    from adaptiveisp_tpu.train.trainer import Trainer

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        Image.fromarray((RNG.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            img_dir / f"i{i}.png")
        (lbl_dir / f"i{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

    cfg = CFG.replace(replay_memory_size=4)
    tcfg = TrainConfig(batch_size=2, epochs=1, imgsz=IMG, data_name="coco")
    tr = Trainer(cfg, tcfg, str(img_dir), save_dir=str(tmp_path / "runA"),
                 t_max=4, data_source="raw", log=False, yolo_spec=MINI_SPEC)
    assert tr.yolo.dtype == jnp.bfloat16
    tr.close()
    tr2 = Trainer(cfg, tcfg, str(img_dir), save_dir=str(tmp_path / "runB"),
                  t_max=4, data_source="raw", log=False,
                  yolo_spec=MINI_SPEC, yolo_dtype="float32")
    assert tr2.yolo.dtype is None
    tr2.close()
