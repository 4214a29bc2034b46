"""Tests for the Agent (policy) and Value (critic) networks."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.policy.agent import Agent, create_agent_state
from adaptiveisp_tpu.policy.value import create_value_state
from adaptiveisp_tpu.policy.states import (
    STATE_REWARD_DIM, STATE_STOPPED_DIM, STATE_STEP_DIM,
    enrich_image_input, get_initial_states, pdf_sample)

CFG = Config()
RNG = np.random.RandomState(3)
IMG = 64  # small images for test speed (trunk still sees 64x64)


def _setup_agent():
    model, variables = create_agent_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    return model, variables


def _inputs(batch=2):
    x = jnp.asarray(RNG.rand(batch, IMG, IMG, 3).astype(np.float32))
    z = jnp.asarray(RNG.rand(batch, CFG.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(batch, CFG.num_state_dim))
    return x, z, states


def test_pdf_sample_inverse_cdf():
    pdf = jnp.asarray([[0.3, 0.7], [0.5, 0.5]], jnp.float32)
    u = jnp.asarray([[0.2], [0.9]], jnp.float32)
    idx = np.asarray(pdf_sample(pdf, u))
    np.testing.assert_array_equal(idx, [0, 1])
    u = jnp.asarray([[0.31], [0.49]], jnp.float32)
    idx = np.asarray(pdf_sample(pdf, u))
    np.testing.assert_array_equal(idx, [1, 0])


def test_enrich_adds_state_channels():
    x = jnp.zeros((2, 8, 8, 3))
    s = jnp.asarray(RNG.rand(2, 13).astype(np.float32))
    out = enrich_image_input(CFG, x, s)
    assert out.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(out[0, 3, 5, 3:]), np.asarray(s[0]))


def test_agent_eval_forward_shapes():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    out, new_states, surrogate, penalty, hr, info = model.apply(
        variables, x, z, states, 1.0, train=False)
    assert out.shape == x.shape
    assert new_states.shape == states.shape
    assert surrogate.shape == (2, 1)
    assert penalty.shape == (2, 1)
    assert hr is None
    assert info["pdf"].shape == (2, 10)
    # eval mode -> argmax action
    np.testing.assert_array_equal(
        np.asarray(info["selected_filter"]), np.asarray(info["max_filter_id"]))
    # pdf normalised
    np.testing.assert_allclose(np.asarray(info["pdf"]).sum(1), 1.0, rtol=1e-5)
    # output in [0, 1]
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_agent_state_transition():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    out, ns, _, _, _, info = model.apply(variables, x, z, states, 1.0,
                                         train=False)
    ns = np.asarray(ns)
    # step incremented, not stopped yet (step 0 -> 1, test_steps=5)
    np.testing.assert_array_equal(ns[:, STATE_STEP_DIM], [1.0, 1.0])
    np.testing.assert_array_equal(ns[:, STATE_STOPPED_DIM], [0.0, 0.0])
    # usage bit set for the selected filter
    sel = np.asarray(info["selected_filter"])
    for b in range(2):
        assert ns[b, 3 + sel[b]] == 1.0
        assert ns[b, 3:].sum() == 1.0


def test_agent_stops_on_last_step():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    states = states.at[:, STATE_STEP_DIM].set(CFG.test_steps - 1)
    _, ns, _, _, _, _ = model.apply(variables, x, z, states, 1.0, train=False)
    ns = np.asarray(ns)
    np.testing.assert_array_equal(ns[:, STATE_STOPPED_DIM], [1.0, 1.0])
    np.testing.assert_array_equal(ns[:, STATE_REWARD_DIM], [1.0, 1.0])
    np.testing.assert_array_equal(ns[:, STATE_STEP_DIM], [5.0, 5.0])


def test_agent_usage_penalty_on_reuse():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    # mark every filter as already used -> reuse penalty must fire
    states = states.at[:, 3:].set(1.0)
    _, _, _, penalty, _, info = model.apply(variables, x, z, states, 1.0,
                                            train=False)
    assert np.all(np.asarray(info["usage_penalty"]) == 1.0)
    # progress=1.0 kills the entropy penalty term
    assert np.allclose(np.asarray(info["entropy_penalty"]), 0.0, atol=1e-6)
    assert np.all(np.asarray(penalty) >= 1.0 - 1e-5)


def test_agent_forced_pipeline():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    for forced in [0, 4, 9]:
        _, _, _, _, _, info = model.apply(
            variables, x, z, states, 1.0, train=False,
            selected_filter_id=forced)
        np.testing.assert_array_equal(
            np.asarray(info["selected_filter"]), [forced, forced])


def test_agent_surrogate_is_log_prob():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    _, _, surrogate, _, _, info = model.apply(variables, x, z, states, 1.0,
                                              train=False)
    pdf = np.asarray(info["pdf"])
    sel = np.asarray(info["selected_filter"])
    want = np.log(pdf[np.arange(2), sel] + 1e-10)[:, None]
    np.testing.assert_allclose(np.asarray(surrogate), want, rtol=1e-5)


def test_agent_train_mode_samples_and_updates_bn():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    out, mutated = model.apply(
        variables, x, z, states, 0.5, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    retouched, ns, surr, pen, hr, info = out
    np.testing.assert_array_equal(
        np.asarray(info["selected_filter"]),
        np.asarray(info["random_filter_id"]))
    # batch stats were updated
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old, new))


def test_agent_runtime_penalty():
    cfg = CFG.replace(filter_runtime_penalty=True,
                      filter_runtime_penalty_lambda=0.01)
    model, variables = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    x, z, states = _inputs()
    _, _, _, _, _, info = model.apply(variables, x, z, states, 1.0,
                                      train=False)
    sel = np.asarray(info["selected_filter"])
    want = 0.01 * np.asarray(cfg.filters_runtime)[sel][:, None]
    np.testing.assert_allclose(np.asarray(info["runtime_penalty"]), want,
                               rtol=1e-5)


def test_agent_high_res_passthrough():
    model, variables = _setup_agent()
    x, z, states = _inputs()
    hr_in = jnp.asarray(RNG.rand(2, IMG * 2, IMG * 2, 3).astype(np.float32))
    out, ns, surr, pen, hr, info = model.apply(
        variables, x, z, states, 1.0, train=False, high_res=hr_in)
    assert hr.shape == hr_in.shape
    assert np.asarray(hr).min() >= 0.0 and np.asarray(hr).max() <= 1.0


def test_value_forward():
    model, variables = create_value_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=2)
    images = jnp.asarray(RNG.rand(2, IMG, IMG, 3).astype(np.float32))
    states = jnp.asarray(get_initial_states(2, CFG.num_state_dim))
    v = model.apply(variables, images, states, train=False)
    assert v.shape == (2, 1)
    # without explicit states the net still runs (scene stats only) — that is
    # a different input-channel count, so it needs its own init
    from adaptiveisp_tpu.policy.value import Value
    m2 = Value(cfg=CFG)
    vars2 = m2.init({"params": jax.random.PRNGKey(0)}, images, None,
                    train=False)
    v2 = m2.apply(vars2, images, None, train=False)
    assert v2.shape == (2, 1)


def test_value_scene_statistics():
    # gray image: saturation 0, contrast 0, luminance = value
    images = jnp.full((1, IMG, IMG, 3), 0.25, jnp.float32)
    lum = 0.25 * 0.27 + 0.25 * 0.67 + 0.25 * 0.06 + 1e-5
    model, variables = create_value_state(
        CFG, jax.random.PRNGKey(0), image_size=IMG, batch=1)
    states = jnp.asarray(get_initial_states(1, CFG.num_state_dim))
    v = model.apply(variables, images, states, train=False)
    assert np.isfinite(np.asarray(v)).all()
    assert abs(lum - 0.25) < 0.01
