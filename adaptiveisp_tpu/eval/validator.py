"""Adaptive inference + detection evaluation.

Counterpart of /root/reference/yolov3/val_adaptiveisp.py:104-460: run the
agent-in-the-loop 5-step ISP on each val image, a frozen YOLOv3 forward, NMS,
IoU matching at 10 thresholds, and ap_per_class — with the reference's
artifacts (records.txt filter-sequence log, per-step images, per-image param
JSON) and the 3-bucket speed report.

Eval protocol defaults mirror the reference exactly: imgsz 512, batch 1,
steps 5, conf 0.001, IoU 0.6, max_det 300, multi-label NMS
(val_adaptiveisp.py:110-112, 466-470).
"""

from __future__ import annotations

import collections
import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.data.datasets import ISPDataset, collate
from adaptiveisp_tpu.detect.boxes import scale_boxes, xywh2xyxy
from adaptiveisp_tpu.detect.metrics import process_batch, summarize
from adaptiveisp_tpu.detect.model import decode_predictions
from adaptiveisp_tpu.detect.nms import non_max_suppression
from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
from adaptiveisp_tpu.obs.logging import save_img
from adaptiveisp_tpu.obs.profile import Profile, speed_report
from adaptiveisp_tpu.ops.bank import short_names
from adaptiveisp_tpu.policy.states import get_initial_states, get_noise


def run_validation(cfg, agent, agent_variables, yolo, yolo_variables,
                   dataset: ISPDataset, steps: int = 5,
                   conf_thres: float = 0.001, iou_thres: float = 0.6,
                   max_det: int = 300, batch_size: int = 1,
                   pipeline: Optional[Sequence[int]] = None,
                   save_dir: Optional[str] = None,
                   save_image: bool = False, save_param: bool = False,
                   save_json: bool = False, anno_json: Optional[str] = None,
                   noise_seed: int = 0, max_images: int = -1,
                   render: str = "auto", yolo_spec=None, mesh=None,
                   class_names=None, profile: bool = False,
                   merge: bool = False, plots: bool = False,
                   augment: bool = False, save_txt: bool = False,
                   save_conf: bool = False, save_hybrid: bool = False,
                   single_cls: bool = False, max_labels: int = 128,
                   max_nms: int = 4096) -> Dict:
    """Returns {'precision', 'recall', 'map50', 'map', 'speed', 'records'}.

    render="auto" picks the switch path (renders only the selected filter —
    exact whenever the whole batch shares one action) for batch_size 1 or a
    forced pipeline, else the one-hot blend; measured 2.5x faster per image
    at the reference eval protocol (batch 1, 5 steps, 512px).

    The host loop is software-pipelined (double-buffered): batch k+1 is
    dispatched to the device before batch k's results are fetched, so host
    post-processing (scale_boxes / process_batch / artifact dumps) overlaps
    device compute and nothing pays a per-bucket device sync.  Pass
    profile=True to restore synchronous per-bucket timing for kernel
    attribution (the reference Profile semantics, val_adaptiveisp.py:254).
    """
    if render == "auto":
        render = ("switch" if batch_size == 1 or pipeline is not None
                  else "blend")
    iouv = np.linspace(0.5, 0.95, 10)
    names = short_names(cfg)
    rng = np.random.RandomState(noise_seed)

    roll = jit_rollout(agent, steps=steps, record_steps=save_image,
                       render=render)
    if augment:
        # TTA: three scaled/flipped passes fused into the same program
        # (reference val.py --augment -> yolo.py:205-252)
        from adaptiveisp_tpu.detect.tta import forward_augment

        fwd = jax.jit(lambda v, x: forward_augment(
            lambda xi: yolo.apply(v, xi, train=False), x, yolo_spec))
    else:
        fwd = jax.jit(lambda v, x: decode_predictions(
            yolo.apply(v, x, train=False), yolo_spec))

    # fused eval step: rollout + detector + decode + NMS in ONE compiled
    # call.  Through a remote/tunneled device every dispatch pays an RTT;
    # one call per batch instead of three cut steady-state eval from 282 to
    # ~RTT+compute ms/img.  profile=True keeps the three separate calls so
    # the reference's pre/inference/NMS attribution stays measurable.
    def _eval(avars, yvars, im, noises, states, pipe, hyb=None):
        res = roll(avars, im, noises, states, pipe)
        preds = fwd(yvars, res.image)
        if hyb is not None:
            # autolabelling: ground-truth rows ride along as conf-1.0 NMS
            # candidates (reference val.py:218-219 labels= path)
            preds = jnp.concatenate([preds, hyb], axis=1)
        dets, nvalid = non_max_suppression(
            preds, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, max_nms=max_nms, multi_label=True,
            merge=merge, agnostic=single_cls)
        return res, dets, nvalid

    eval_fused = jax.jit(_eval)

    pipe_arr = (no_pipeline(steps) if pipeline is None
                else jnp.asarray([(-1 if p is None else int(p))
                                  for p in pipeline], jnp.int32))

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        if save_image:
            for i in range(steps):
                os.makedirs(os.path.join(save_dir, "img_results",
                                         f"step-{i}"), exist_ok=True)
        if save_param:
            os.makedirs(os.path.join(save_dir, "param_results"),
                        exist_ok=True)

    profiles = {"pre": Profile(), "inference": Profile(sync=profile),
                "nms": Profile(sync=profile), "post": Profile()}
    stats = []
    records = []
    coco_records = []
    det_nc = (yolo_spec["nc"] if yolo_spec is not None
              else (len(class_names) if class_names else 80))
    confusion = None
    if plots:
        from adaptiveisp_tpu.detect.metrics import ConfusionMatrix

        confusion = ConfusionMatrix(nc=det_nc)
    n_total = len(dataset) if max_images < 0 else min(max_images, len(dataset))

    # warm the jits so the speed report measures steady state, not compiles
    if n_total:
        wb = collate([dataset[0]] * batch_size)
        wim = jnp.asarray(wb["im"])
        wno = jnp.asarray(np.stack([
            get_noise(np.random.RandomState(0), batch_size, cfg.z_dim,
                      cfg.z_type) for _ in range(steps)]))
        wst = jnp.asarray(get_initial_states(batch_size, cfg.num_state_dim))
        whyb = (jnp.zeros((batch_size, max_labels, 5 + det_nc))
                if save_hybrid else None)
        if profile:
            wres = roll(agent_variables, wim, wno, wst, pipe_arr)
            wpred = fwd(yolo_variables, wres.image)
            if whyb is not None:
                wpred = jnp.concatenate([wpred, whyb], axis=1)
            jax.device_get(non_max_suppression(
                wpred, conf_thres=conf_thres, iou_thres=iou_thres,
                max_det=max_det, max_nms=max_nms, multi_label=True,
                merge=merge, agnostic=single_cls)[1])
        else:
            jax.device_get(eval_fused(
                agent_variables, yolo_variables, wim, wno, wst, pipe_arr,
                whyb)[2])

    def _host_prep(idx):
        """Decode + collate + noise draws (runs on the producer thread)."""
        batch = collate([dataset[i] for i in idx])
        nb = batch["im"].shape[0]
        noises = np.stack([get_noise(rng, nb, cfg.z_dim, cfg.z_type)
                           for _ in range(steps)])
        states = get_initial_states(nb, cfg.num_state_dim)
        hyb = None
        if save_hybrid:
            # padded [nb, L, 5+nc] GT candidate rows: xywh px, obj 1.0,
            # one-hot class (reference val.py:218-219)
            hgt, wdt = batch["im"].shape[1:3]
            hyb = np.zeros((nb, max_labels, 5 + det_nc), np.float32)
            for bi in range(nb):
                lab = batch["label"][bi]
                n = min(lab.shape[0], max_labels)
                if n:
                    hyb[bi, :n, 0:4] = lab[:n, 2:6] * np.array(
                        [wdt, hgt, wdt, hgt], np.float32)
                    hyb[bi, :n, 4] = 1.0
                    cls = (np.zeros(n, int) if single_cls
                           else lab[:n, 1].astype(int))
                    hyb[bi, np.arange(n), 5 + cls] = 1.0
        return batch, noises, states, hyb

    def dispatch(prepped):
        """Device transfer + ONE async eval dispatch (no fetch)."""
        batch, noises_np, states_np, hyb_np = prepped
        hyb = jnp.asarray(hyb_np) if hyb_np is not None else None
        with profiles["pre"]:
            im = jnp.asarray(batch["im"])
            nb = im.shape[0]
            noises = jnp.asarray(noises_np)
            states = jnp.asarray(states_np)
            if mesh is not None and nb % mesh.devices.size == 0:
                # data-parallel eval: shard the batch over the mesh; the
                # jits propagate input shardings (throughput mode)
                from adaptiveisp_tpu.train.mesh import data_sharding

                im = jax.device_put(im, data_sharding(mesh, im.ndim))
                states = jax.device_put(states,
                                        data_sharding(mesh, states.ndim))

        if profile:
            with profiles["inference"]:
                res = roll(agent_variables, im, noises, states, pipe_arr)
                preds = fwd(yolo_variables, res.image)
                if hyb is not None:
                    preds = jnp.concatenate([preds, hyb], axis=1)
            with profiles["nms"]:
                dets, nvalid = non_max_suppression(
                    preds, conf_thres=conf_thres, iou_thres=iou_thres,
                    max_det=max_det, max_nms=max_nms, multi_label=True,
                    merge=merge, agnostic=single_cls)
        else:
            with profiles["inference"]:
                res, dets, nvalid = eval_fused(
                    agent_variables, yolo_variables, im, noises, states,
                    pipe_arr, hyb)
        # start the device->host copies now so they overlap the next
        # batch's compute; consume()'s device_get then returns from the
        # already-landed host buffers instead of paying a fresh round trip
        to_fetch = [dets, nvalid, res.selected]
        if save_image and res.images_per_step is not None:
            to_fetch.append(res.images_per_step)
        if save_param and res.params is not None:
            to_fetch.append(res.params)
        for arr in to_fetch:
            try:
                arr.copy_to_host_async()
            except AttributeError:
                break
        return batch, nb, (im.shape[1], im.shape[2]), res, dets, nvalid

    def consume(work):
        batch, nb, (h, w), res, dets_d, nvalid_d = work
        with profiles["post"]:
            # one consolidated fetch for everything the host needs
            dets, nvalid, sels = jax.device_get(
                (dets_d, nvalid_d, res.selected))
            dets = np.asarray(dets)
            nvalid = np.asarray(nvalid)
            sels = np.asarray(sels)  # [steps, nb]
        _postprocess(batch, nb, h, w, dets, nvalid, sels, res)

    def _postprocess(batch, nb, h, w, dets, nvalid, sels, res):
        for bi in range(nb):
            path = batch["path"][bi]
            (h0, w0), ((rh, rw), pad) = batch["shape"][bi]
            seq = [int(sels[s, bi]) for s in range(steps)]
            records.append((os.path.split(path)[1], seq))

            if save_dir and save_image:
                for s in range(steps):
                    save_img(np.asarray(res.images_per_step[s][bi]),
                             os.path.join(save_dir, "img_results",
                                          f"step-{s}",
                                          os.path.split(path)[1] + ".png"))
            if save_dir and save_param and bi == 0:
                # one JSON per BATCH keyed by its first image — exactly the
                # reference's save_param behavior (val_adaptiveisp.py:301,
                # 324-327 use filter_id[0] / paths[0]; the protocol runs
                # batch 1, where per-batch == per-image)
                from adaptiveisp_tpu.ops.bank import param_offsets

                offsets = param_offsets(cfg)
                all_params = np.asarray(res.params)  # [steps, nb, P]
                param_doc = collections.OrderedDict()
                param_doc["pipeline"] = [s for s in seq if s >= 0]
                for s, fid in enumerate(seq):
                    if fid < 0:
                        continue
                    lo, hi = offsets[fid]
                    param_doc[f"step{s}_{names[fid]}"] = [
                        float(v) for v in all_params[s, bi, lo:hi]]
                with open(os.path.join(
                        save_dir, "param_results",
                        os.path.splitext(os.path.split(path)[1])[0]
                        + ".json"), "w") as f:
                    json.dump(param_doc, f, indent=4)

            det = dets[bi][:int(nvalid[bi])].copy()
            labels = batch["label"][bi]  # [n, 6] (idx, cls, xywhn)
            lab = labels[:, 1:].copy()
            if single_cls:
                # single-class evaluation (reference val.py:245)
                det[:, 5] = 0.0
                if lab.size:
                    lab[:, 0] = 0.0
            if lab.size:
                # pure numpy: a jnp call here costs one device dispatch
                # PER IMAGE inside the host post-processing loop
                xywh = lab[:, 1:5] * np.array([w, h, w, h], np.float32)
                lab[:, 1:5] = np.concatenate(
                    [xywh[:, :2] - xywh[:, 2:] / 2,
                     xywh[:, :2] + xywh[:, 2:] / 2], axis=1)
            if det.shape[0]:
                det[:, :4] = scale_boxes((h, w), det[:, :4], (h0, w0),
                                         ((rh, rw), pad))
            if save_dir and save_txt:
                # normalized `cls xc yc w h [conf]` label files
                # (reference val.py save_one_txt, :50-56)
                from adaptiveisp_tpu.detect.boxes import xyxy2xywhn

                os.makedirs(os.path.join(save_dir, "labels"), exist_ok=True)
                xywh = np.asarray(xyxy2xywhn(det[:, :4], w=w0, h=h0))
                lines = []
                for ri in range(det.shape[0]):
                    vals = [int(det[ri, 5])] + xywh[ri].tolist() + (
                        [float(det[ri, 4])] if save_conf else [])
                    lines.append(" ".join(f"{v:g}" for v in vals))
                stem = os.path.splitext(os.path.split(path)[1])[0]
                with open(os.path.join(save_dir, "labels",
                                       stem + ".txt"), "w") as f:
                    f.write("\n".join(lines) + ("\n" if lines else ""))
            if lab.size:
                lab_px = lab.copy()
                lab_px[:, 1:5] = scale_boxes((h, w), lab[:, 1:5], (h0, w0),
                                             ((rh, rw), pad))
            else:
                lab_px = np.zeros((0, 5), np.float32)
            correct = process_batch(det, lab_px, iouv)
            stats.append((correct, det[:, 4], det[:, 5], lab_px[:, 0]))
            if confusion is not None:
                confusion.process_batch(det, lab_px)
            if save_json:
                from adaptiveisp_tpu.eval.coco_json import (
                    COCO80_TO_91, detections_to_coco)

                coco_records.extend(detections_to_coco(
                    path, det, class_map=COCO80_TO_91))

    # double-buffered drive: a producer thread decodes/collates batches
    # ahead, and batch k+1 is dispatched before batch k is fetched so host
    # post-processing and IO overlap device compute (VERDICT round-1 #5)
    import queue
    import threading
    import time

    t_wall0 = time.perf_counter()
    idx_lists = [list(range(s, min(s + batch_size, n_total)))
                 for s in range(0, n_total, batch_size)]
    q: queue.Queue = queue.Queue(maxsize=2)

    def _producer():
        try:
            for idx in idx_lists:
                q.put(_host_prep(idx))
        except Exception as e:  # surface to the consumer
            q.put(e)
        q.put(None)

    threading.Thread(target=_producer, daemon=True).start()
    pending = None
    while True:
        prepped = q.get()
        if isinstance(prepped, Exception):
            raise prepped
        if prepped is None:
            break
        work = dispatch(prepped)
        if pending is not None:
            consume(pending)
        pending = work
    if pending is not None:
        consume(pending)
    wall_s = time.perf_counter() - t_wall0

    plot_dir = save_dir if (plots and save_dir) else None
    result = summarize(stats, names=class_names, plot_dir=plot_dir)
    if confusion is not None:
        result["confusion_matrix"] = confusion.matrix
        if plot_dir:
            cm_names = (list(class_names.values())
                        if isinstance(class_names, dict)
                        else list(class_names or ()))
            confusion.plot(save_dir=plot_dir, names=cm_names)
    result["speed"] = speed_report(profiles, n_total)
    result["wall_ms_per_img"] = 1000.0 * wall_s / max(n_total, 1)
    result["records"] = records
    if save_dir:
        with open(os.path.join(save_dir, "records.txt"), "w") as f:
            f.write(",".join(names) + "\n")
            for fname, seq in records:
                f.write(fname + "," + ",".join(str(s) for s in seq) + "\n")
        if save_json:
            from adaptiveisp_tpu.eval.coco_json import (
                pycocotools_eval, save_predictions)

            pred_json = save_predictions(coco_records, save_dir)
            if anno_json:
                rescored = pycocotools_eval(pred_json, anno_json)
                if rescored:
                    result["coco_map"] = rescored["map"]
                    result["coco_map50"] = rescored["map50"]
    return result
