#!/usr/bin/env python
"""RL training CLI — the reference `python train.py` equivalent
(/root/reference/train.py:614-661 argparse surface).

Example:
  python train_isp.py --task train_val --batch_size 8 --epochs 800 \
      --data_cfg lod --save_path adaptiveisp
  python train_isp.py --task val --model_weights experiments/.../ckpt
"""

import argparse
import importlib
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="train_val",
                   help="train, train_val, val")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--weights", type=str, default="pretrained/yolov3.pt",
                   help="torch YOLOv3 checkpoint to convert, or .pkl of "
                        "converted variables")
    p.add_argument("--hyp", type=str, default=None,
                   help="loss hyp YAML (defaults to scratch-low values)")
    p.add_argument("--yolo_spec", type=str, default=None,
                   help="reward-detector architecture: a named spec "
                        "(yolov3, yolov5s, ...) or a model YAML — the "
                        "reference's --yolo_cfg (train.py:110,629)")
    p.add_argument("--save_path", type=str, default="adaptiveisp")
    p.add_argument("--data_name", type=str, default="lod",
                   choices=["lod", "coco", "rod", "oprd"])
    p.add_argument("--data_cfg", type=str, default=None,
                   help="dataset yaml / builtin name (default: data_name)")
    p.add_argument("--add_noise", action="store_true", default=False)
    p.add_argument("--use_linear", action="store_true", default=False)
    p.add_argument("--bri_range", type=float, default=None, nargs="*")
    p.add_argument("--noise_level", type=float, default=None)
    p.add_argument("--use_truncated", type=bool, default=True)
    p.add_argument("--runtime_penalty", action="store_true", default=False)
    p.add_argument("--runtime_penalty_lambda", type=float, default=0.01)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--model_weights", type=str, default=None)
    p.add_argument("--val_save_path", type=str,
                   default="experiments/adaptiveisp-val")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--spatial_shard", type=int, default=1,
                   help="spread each full-res frame's rows over N devices "
                        "(sp axis) during --task val HR rendering")
    p.add_argument("--cfg", type=str, default=None,
                   help="python module exporting `cfg` (a Config) to swap "
                        "filter rosters, like the reference --cfg")
    p.add_argument("--max_steps", type=int, default=None,
                   help="cap training iterations (smoke runs); default = "
                        "epochs*1000/batch like the reference")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel devices (0 = all available)")
    p.add_argument("--device_replay", action="store_true", default=True,
                   help="keep the replay image pool in device HBM (DP-mesh "
                        "sharded when --dp; kills the per-step host "
                        "round-trip).  Default ON since round 3.")
    p.add_argument("--no_device_replay", dest="device_replay",
                   action="store_false",
                   help="host-side replay pool (reference data flow)")
    p.add_argument("--no_cached_reward", action="store_true", default=False,
                   help="recompute the input-image detector loss every step "
                        "instead of reusing the slot's cached write-back "
                        "loss (numerically identical; debug only)")
    p.add_argument("--yolo_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="compute dtype of the frozen reward detector "
                        "(bf16 = MXU-native, ~6x cheaper reward backward; "
                        "float32 = reference bit-parity)")
    args = p.parse_args(argv)
    args.save_path = args.data_name + "-" + args.save_path
    if args.data_name == "lod":
        # reference coupling rule (train.py:652-655)
        args.add_noise = False
        args.bri_range = None
        args.use_linear = False
    return args


def load_cfg(name):
    from adaptiveisp_tpu.config import DEFAULT_CONFIG

    if not name:
        return DEFAULT_CONFIG
    mod = importlib.import_module(name)
    return mod.cfg


def load_yolo_variables(path):
    """Load detector weights: a converted-.pkl or a torch .pt to convert."""
    import pickle

    import jax.numpy as jnp
    import jax

    if path and not os.path.isfile(path):
        # search the artifact roots (reference attempt_download's local
        # resolution, downloads.py:83-127 — no network probing here)
        try:
            from adaptiveisp_tpu.data.artifacts import resolve_artifact

            path = resolve_artifact(path, download=False)
        except FileNotFoundError:
            pass
    if path and os.path.isfile(path):
        if path.endswith((".pkl", ".pickle")):
            with open(path, "rb") as f:
                return pickle.load(f)
        if path.endswith((".pt", ".pth")):
            import torch

            from adaptiveisp_tpu.detect.convert import convert_yolo_state_dict

            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            model = ckpt.get("model", ckpt)
            sd = (model.float().state_dict()
                  if hasattr(model, "state_dict") else model)
            sd = {k: v.numpy() for k, v in sd.items()}
            params, stats = convert_yolo_state_dict(sd)
            to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
    print(f"[warn] detector weights '{path}' not found; using random init "
          f"(mAP-parity runs need the converted COCO checkpoint)",
          file=sys.stderr)
    return None


def main(argv=None):
    args = parse_args(argv)
    cfg = load_cfg(args.cfg)

    from adaptiveisp_tpu.config import TrainConfig
    from adaptiveisp_tpu.data.dataset_config import check_dataset
    from adaptiveisp_tpu.train.trainer import Trainer

    tcfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        imgsz=args.imgsz, data_name=args.data_name,
        add_noise=args.add_noise, use_linear=args.use_linear,
        bri_range=tuple(args.bri_range) if args.bri_range else None,
        noise_level=args.noise_level, use_truncated=args.use_truncated,
        runtime_penalty=args.runtime_penalty,
        runtime_penalty_lambda=args.runtime_penalty_lambda)

    data = check_dataset(args.data_cfg or args.data_name)
    yolo_vars = load_yolo_variables(args.weights)
    yolo_spec = None
    if args.yolo_spec:
        from adaptiveisp_tpu.detect.spec import resolve_spec

        yolo_spec = resolve_spec(args.yolo_spec)
    loss_hyp = None
    if args.hyp:
        from adaptiveisp_tpu.detect.hyp import load_hyp, split_hyp
        from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC

        spec_for_hyp = yolo_spec or YOLOV3_SPEC
        _, loss_hyp, _ = split_hyp(load_hyp(args.hyp),
                                   nl=len(spec_for_hyp["anchors"]),
                                   nc=spec_for_hyp["nc"], imgsz=args.imgsz)
    mesh = None
    if args.dp:
        from adaptiveisp_tpu.train import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.dp if args.dp > 0 else None)

    if args.task in ("train", "train_val"):
        trainer = Trainer(
            cfg, tcfg, data["train"],
            val_path=data.get("val") if args.task == "train_val" else None,
            save_dir=os.path.join("experiments", args.save_path),
            yolo_variables=yolo_vars, data_source=data.get("source"),
            mesh=mesh, device_replay=args.device_replay,
            cached_reward=not args.no_cached_reward,
            yolo_dtype=args.yolo_dtype, yolo_spec=yolo_spec,
            loss_hyp=loss_hyp)
        if args.resume:
            trainer.resume(args.resume)
        trainer.train(max_steps=args.max_steps)
        trainer.close()
    elif args.task == "val":
        from adaptiveisp_tpu.eval.hr_render import run_hr_validation

        run_hr_validation(cfg, tcfg, data, args.model_weights,
                          args.val_save_path, steps=args.steps,
                          yolo_variables=yolo_vars,
                          spatial_shard=args.spatial_shard)
    else:
        raise SystemExit(f"unknown task {args.task}")


if __name__ == "__main__":
    main()
