"""The actor-critic training step as a single jitted function.

Re-design of the reference hot loop (/root/reference/train.py:234-351):
one `jax.grad` over a combined loss replaces the two sequential
``backward()`` calls — mathematically identical, because

  * ``value_loss`` touches only value params (q is detached in the
    advantage, train.py:294),
  * ``agent_loss`` touches agent params via the surrogate/render path AND
    value params via ``-q_value`` (routine_loss, train.py:299) exactly as
    the reference's second backward accumulates into both.

Stop-gradient sites mirror the reference exactly:
  train.py:274  detect_input_loss.detach()       (input loss is a constant)
  train.py:294  q_value.detach() in the advantage
  train.py:305  advantage.detach() in the surrogate term

The frozen YOLO runs with BatchNorm in inference mode
(train.py:239-243) and contributes no gradient (lax.stop_gradient on its
params path is unnecessary: reward flows through detect_retouch_loss into the
retouched image -> agent; YOLO's own params are simply not differentiated).

Per-network gradient clipping to global-norm 1e-5 (train.py:345-346) and the
exponential LR decay 0.1^(3*iter/max_iter) (train.py:210-218) live in
:mod:`adaptiveisp_tpu.train.optim`.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from adaptiveisp_tpu.detect.loss import LossHyp, per_image_loss_batch
from adaptiveisp_tpu.policy.states import STATE_STEP_DIM, STATE_STOPPED_DIM


class TrainState(NamedTuple):
    agent_params: Any
    agent_stats: Any
    agent_opt: Any
    value_params: Any
    value_stats: Any
    value_opt: Any
    step: jnp.ndarray


class StepOutput(NamedTuple):
    state: TrainState
    retouch: jnp.ndarray
    new_states: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]


def make_train_step(agent, value, yolo, cfg, tcfg, anchors_grid,
                    hyp: LossHyp, agent_tx, value_tx,
                    cached_input_loss: bool = False):
    """Build the jitted train step closure.

    agent/value/yolo: flax modules; cfg: Config; tcfg: TrainConfig;
    agent_tx/value_tx: optax transforms (clip + adam + schedule).

    cached_input_loss: the detector is FROZEN, so a pool image's input
    loss equals the retouch loss computed when it was last written back —
    the batch then carries a precomputed loss_in [N, 1] (weighted+clipped)
    and the step skips the input-image detector forward entirely, cutting
    one of the two full YOLO forwards per iteration.  Numerically
    identical to recomputing (same detector, same image, BN in inference
    mode); fresh pool slots get their loss from make_input_loss_fn.
    """

    def loss_fn(trainable, agent_stats, value_stats, yolo_vars, batch,
                dropout_rng, progress):
        agent_params, value_params = trainable
        if cached_input_loss:
            imgs, z, states, targets, tmask, loss_in = batch
        else:
            imgs, z, states, targets, tmask = batch

        # ---- agent forward (train mode, BN batch stats, dropout) --------
        # named scopes carry through to HLO op metadata (tf_op paths), so
        # tools/trace_breakdown.py can attribute device time per component
        # (fwd AND the autodiff-transposed bwd ops inherit the scope)
        with jax.named_scope("agent_fwd"):
            (retouch, new_states, surrogate, penalty, _, info), agent_mut = (
                agent.apply({"params": agent_params,
                             "batch_stats": agent_stats},
                            imgs, z, states, progress, train=True,
                            rngs={"dropout": dropout_rng},
                            mutable=["batch_stats"]))
        stopped = new_states[:, STATE_STOPPED_DIM:STATE_STOPPED_DIM + 1]

        # ---- frozen detector on input & retouched (train.py:262-271) ----
        if cached_input_loss:
            detect_input_loss = loss_in
        else:
            with jax.named_scope("yolo_input"):
                pred_input = yolo.apply(yolo_vars, imgs, train=False)
                detect_input_loss, _ = per_image_loss_batch(
                    pred_input, targets, tmask, anchors_grid, hyp)
                detect_input_loss = jnp.clip(
                    detect_input_loss * cfg.detect_loss_weight, 0.0, 1.0)

        with jax.named_scope("yolo_retouch"):
            pred_retouch = yolo.apply(yolo_vars, retouch, train=False)
            detect_retouch_loss, retouch_comps = per_image_loss_batch(
                pred_retouch, targets, tmask, anchors_grid, hyp)
            detect_retouch_loss = jnp.clip(
                detect_retouch_loss * cfg.detect_loss_weight, 0.0, 1.0)

        # ---- reward (train.py:273-277) ----------------------------------
        reward = ((cfg.all_reward + (1 - cfg.all_reward) * stopped)
                  * (jax.lax.stop_gradient(detect_input_loss)
                     - detect_retouch_loss) * cfg.critic_logit_multiplier)
        if cfg.use_penalty:
            reward = reward - penalty

        # ---- critic (train.py:282-295) ----------------------------------
        with jax.named_scope("value_net"):
            old_value, value_mut = value.apply(
                {"params": value_params, "batch_stats": value_stats},
                imgs, states, train=True, mutable=["batch_stats"])
            new_value, value_mut2 = value.apply(
                {"params": value_params,
                 "batch_stats": value_mut["batch_stats"]},
                retouch, new_states, train=True, mutable=["batch_stats"])

        clear_final = (new_states[:, STATE_STEP_DIM:STATE_STEP_DIM + 1]
                       > cfg.maximum_trajectory_length).astype(jnp.float32)
        new_value = new_value * (1.0 - clear_final)

        if tcfg.use_truncated:
            retouch_mean = jnp.mean(retouch, axis=(1, 2, 3))[:, None]
            truncated = jnp.where(retouch_mean > 0.01, 1.0, 0.0)
            truncated = jnp.where(retouch_mean < tcfg.max_brightness,
                                  truncated, 0.0)
            q_value = reward + ((1.0 - stopped) * cfg.discount_factor
                                * new_value * (1.0 - truncated))
        else:
            q_value = reward + (1.0 - stopped) * cfg.discount_factor * new_value

        advantage = jax.lax.stop_gradient(q_value) - old_value
        value_loss = jnp.mean(advantage ** 2)

        # ---- TD actor objective (train.py:297-305) ----------------------
        if cfg.use_TD:
            routine_loss = -q_value * cfg.parameter_lr_mul
            adv = -advantage
        else:
            routine_loss = -reward
            adv = -reward
        agent_loss = jnp.mean(
            routine_loss + surrogate * jax.lax.stop_gradient(adv))

        total = value_loss + agent_loss
        aux = {
            "agent_stats": agent_mut["batch_stats"],
            "value_stats": value_mut2["batch_stats"],
            "retouch": retouch,
            "new_states": new_states,
            "metrics": {
                "agent_loss": agent_loss,
                "value_loss": value_loss,
                "detect_input_loss": detect_input_loss.mean(),
                "detect_retouch_loss": detect_retouch_loss.mean(),
                "loss_components": jnp.stack(
                    [retouch_comps["box"].mean(), retouch_comps["obj"].mean(),
                     retouch_comps["cls"].mean()]),
                "reward": reward.mean(),
                "penalty": penalty.mean(),
                "q_value": q_value.mean(),
                "selected_filter": info["selected_filter"],
                "retouch_mean": retouch.mean(),
                "retouch_finite": jnp.isfinite(retouch).all(),
                # per-image retouch loss (weighted+clipped): becomes the
                # written-back slot's cached input loss
                "retouch_loss_per_image": jax.lax.stop_gradient(
                    detect_retouch_loss),
            },
        }
        return total, aux

    def train_step(state: TrainState, yolo_vars, batch, dropout_rng,
                   progress) -> StepOutput:
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            (state.agent_params, state.value_params),
            state.agent_stats, state.value_stats, yolo_vars, batch,
            dropout_rng, progress)
        agent_grads, value_grads = grads

        with jax.named_scope("optimizer"):
            a_updates, a_opt = agent_tx.update(
                agent_grads, state.agent_opt, state.agent_params)
            agent_params = optax.apply_updates(state.agent_params, a_updates)
            v_updates, v_opt = value_tx.update(
                value_grads, state.value_opt, state.value_params)
            value_params = optax.apply_updates(state.value_params, v_updates)

        new_state = TrainState(
            agent_params, aux["agent_stats"], a_opt,
            value_params, aux["value_stats"], v_opt,
            state.step + 1)
        return StepOutput(new_state, aux["retouch"], aux["new_states"],
                          aux["metrics"])

    return train_step


def make_input_loss_fn(yolo, cfg, anchors_grid, hyp: LossHyp):
    """Jitted detector loss of raw pool images (weighted + clipped exactly
    like the step's detect_input_loss) — used to seed cached losses for
    fresh replay slots."""

    @jax.jit
    def fn(yolo_vars, imgs, targets, tmask):
        preds = yolo.apply(yolo_vars, imgs, train=False)
        loss, _ = per_image_loss_batch(preds, targets, tmask, anchors_grid,
                                       hyp)
        return jnp.clip(loss * cfg.detect_loss_weight, 0.0, 1.0)

    return fn


def init_train_state(agent_variables, value_variables, agent_tx, value_tx):
    return TrainState(
        agent_params=agent_variables["params"],
        agent_stats=agent_variables["batch_stats"],
        agent_opt=agent_tx.init(agent_variables["params"]),
        value_params=value_variables["params"],
        value_stats=value_variables["batch_stats"],
        value_opt=value_tx.init(value_variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
