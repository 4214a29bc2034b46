#!/usr/bin/env python
"""Streaming detection CLI — the reference `python yolov3/detect.py` analog
(/root/reference/yolov3/detect.py): run (optionally adaptive-ISP-processed)
detection over images, video files, globs, webcam indices, or rtsp/http
streams (reference LoadImages/LoadStreams surface, dataloaders.py:190-427),
printing and saving results.
"""

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source", type=str, required=True,
                   help="image file/folder/.txt list/glob, video file, "
                        "webcam index, rtsp/http url, or .streams file")
    p.add_argument("--vid_stride", type=int, default=1,
                   help="video frame-rate stride")
    p.add_argument("--max_frames", type=int, default=None,
                   help="stop a live stream after N frames")
    p.add_argument("--weights", type=str, default="pretrained/yolov3.pt")
    p.add_argument("--isp_weights", type=str, default=None,
                   help="run adaptive ISP preprocessing with this agent ckpt")
    p.add_argument("--isp_steps", type=int, default=5)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--conf_thres", type=float, default=0.25)
    p.add_argument("--iou_thres", type=float, default=0.45)
    p.add_argument("--max_det", type=int, default=300)
    p.add_argument("--save_dir", type=str, default="runs/detect")
    p.add_argument("--exist_ok", action="store_true",
                   help="write into --save_dir even if it exists "
                        "(default: auto-increment like increment_path)")
    p.add_argument("--save_txt", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="TTA inference (3 scales + lr flip, yolo.py:211)")
    p.add_argument("--classes", type=int, nargs="*", default=None,
                   help="filter detections by class id, e.g. --classes 0 2")
    p.add_argument("--agnostic_nms", action="store_true",
                   help="class-agnostic NMS")
    p.add_argument("--half", action="store_true",
                   help="bf16 detector inference (MXU-native)")
    p.add_argument("--save_img", action="store_true",
                   help="save annotated images (reference detect.py "
                        "default-on save path)")
    p.add_argument("--save_crop", action="store_true",
                   help="save per-detection crops (detect.py --save-crop)")
    p.add_argument("--visualize", action="store_true",
                   help="dump per-stage feature-map grids "
                        "(detect.py --visualize, plots.py:54)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from train_isp import load_yolo_variables
    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.data.dataset_config import COCO_NAMES
    from adaptiveisp_tpu.data.letterbox import letterbox
    from adaptiveisp_tpu.data.sources import open_source
    from adaptiveisp_tpu.detect.boxes import scale_boxes
    from adaptiveisp_tpu.detect.model import create_detector, decode_predictions
    from adaptiveisp_tpu.detect.nms import non_max_suppression

    cfg = Config()
    yolo, yolo_vars = create_detector(
        jax.random.PRNGKey(0), imgsz=256,
        dtype=jnp.bfloat16 if args.half else None)
    loaded = load_yolo_variables(args.weights)
    if loaded is not None:
        yolo_vars = loaded

    isp = None
    if args.isp_weights:
        from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
        from adaptiveisp_tpu.policy.agent import create_agent_state
        from adaptiveisp_tpu.policy.states import (get_initial_states,
                                                   get_noise)
        from adaptiveisp_tpu.train import checkpoint as ckpt_lib

        agent, agent_vars = create_agent_state(
            cfg, jax.random.PRNGKey(0), image_size=args.imgsz, batch=1)
        agent_vars = ckpt_lib.load_weights_only(
            args.isp_weights)["agent_model"]
        roll = jit_rollout(agent, steps=args.isp_steps)
        rng = np.random.RandomState(0)

        def isp(img):
            noises = jnp.asarray(np.stack(
                [get_noise(rng, 1, cfg.z_dim) for _ in range(args.isp_steps)]))
            states = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
            return roll(agent_vars, img, noises, states,
                        no_pipeline(args.isp_steps)).image

    if args.augment:
        from adaptiveisp_tpu.detect.tta import forward_augment

        fwd = jax.jit(lambda v, x: forward_augment(
            lambda xi: yolo.apply(v, xi, train=False), x))
    else:
        fwd = jax.jit(lambda v, x: decode_predictions(
            yolo.apply(v, x, train=False)))
    from adaptiveisp_tpu.obs.logging import increment_path

    args.save_dir = increment_path(args.save_dir, exist_ok=args.exist_ok)
    os.makedirs(args.save_dir, exist_ok=True)

    source = open_source(args.source, vid_stride=args.vid_stride,
                         max_frames=args.max_frames)
    sources = source if isinstance(source, list) else [source]
    for src in sources:
        _run_source(src, args, isp, fwd, yolo_vars, yolo)


def _run_source(source, args, isp, fwd, yolo_vars, yolo=None):
    import numpy as np
    import jax.numpy as jnp

    from adaptiveisp_tpu.data.dataset_config import COCO_NAMES
    from adaptiveisp_tpu.data.letterbox import letterbox
    from adaptiveisp_tpu.detect.boxes import scale_boxes
    from adaptiveisp_tpu.detect.nms import non_max_suppression

    for name, raw, meta in source:
        h0, w0 = raw.shape[:2]
        img, ratio, pad = letterbox(raw, args.imgsz, color=(0, 0, 0),
                                    auto=False)
        x = jnp.asarray(img[None])
        if isp is not None:
            x = isp(x)
        preds = fwd(yolo_vars, x)
        dets, nvalid = non_max_suppression(
            preds, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det, multi_label=False,
            classes=(tuple(args.classes) if args.classes else None),
            agnostic=args.agnostic_nms)
        det = np.array(dets[0][:int(nvalid[0])])  # copy: np view is read-only
        if det.shape[0]:
            det[:, :4] = scale_boxes((args.imgsz, args.imgsz), det[:, :4],
                                     (h0, w0), (ratio, pad))
        print(f"{name}: {det.shape[0]} detections")
        for d in det:
            cls = COCO_NAMES[int(d[5])] if int(d[5]) < len(COCO_NAMES) else d[5]
            print(f"  {cls} {d[4]:.2f} [{d[0]:.0f},{d[1]:.0f},{d[2]:.0f},{d[3]:.0f}]")
        if args.save_txt:
            safe = os.path.splitext(name.replace(":", "_"))[0]
            with open(os.path.join(args.save_dir, safe + ".txt"), "w") as f:
                for d in det:
                    f.write(" ".join(f"{v:.5g}" for v in d) + "\n")
        if args.save_img or args.save_crop:
            from adaptiveisp_tpu.api import Detections

            safe = os.path.splitext(name.replace(":", "_"))[0]
            dd = Detections([raw], [det], dict(enumerate(COCO_NAMES)),
                            paths=[safe + ".png"])
            if args.save_img:
                dd.save(args.save_dir)
            if args.save_crop:
                dd.crop(os.path.join(args.save_dir, "crops"))
        if args.visualize:
            from adaptiveisp_tpu.obs.plots import feature_visualization

            safe = os.path.splitext(name.replace(":", "_"))[0]
            _, state = yolo.apply(
                yolo_vars, x, train=False, capture_intermediates=True,
                mutable=["intermediates"])
            feature_visualization(
                state["intermediates"],
                os.path.join(args.save_dir, safe))


if __name__ == "__main__":
    main()
