"""Scripted-ISP batch renderer: apply a fixed filter chain to a stream.

The production "apply my tuned pipeline at scale" tool — the standalone
counterpart of the reference's fixed-pipeline modes (``--pipeline`` in
val_adaptiveisp.py:292,508-511 and DynamicISP.val's scripted renders,
/root/reference/train.py:489-611), which only exist inside eval scripts
there.  Sources are anything detect_cli accepts (dir / glob / .txt list /
video / webcam / rtsp); outputs are rendered frames plus a throughput
report.

Two execution paths, both producing identical pixels:

* single chip (default): ``ops.bank.render_pipeline`` — on TPU, maximal
  fusable runs of the chain execute as ONE Pallas kernel (one HBM
  read+write for the whole run).
* ``--pipe N``: pipeline parallelism (``ops.pp``) — stage i of the chain
  on pipe-device i, frames streaming through the ring via ppermute, the
  GPipe schedule as one lax.scan.  Composable with ``--batch`` (the
  microbatch, sharded over 'data' when ``--dp`` > 1).

Stages are given as repeatable ``--stage name:p1,p2,...`` flags or a YAML
script (a list of ``{name: ..., params: [...]}``), validated against each
filter's parameter count.

    python render_isp.py --source imgs/ --out runs/render \
        --stage exposure:0.35 --stage gamma:0.1 --stage sharpen:0.8
    python render_isp.py --source clip.mp4 --pipe 4 --window 16 \
        --script pipeline.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_stage(cfg, text: str):
    """``name:p1,p2,...`` -> (name, np.ndarray[P]); loud on bad counts."""
    from adaptiveisp_tpu.ops.bank import get_spec

    name, _, rest = text.partition(":")
    spec = get_spec(cfg, name)  # KeyError on unknown filter names
    params = ([float(v) for v in rest.split(",") if v.strip() != ""]
              if rest else [])
    if len(params) != spec.n_params:
        raise ValueError(
            f"filter {name!r} takes {spec.n_params} parameter(s), "
            f"got {len(params)} in {text!r}")
    return name, np.asarray(params, np.float32)


def load_script(cfg, path: str):
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if not isinstance(doc, list):
        raise ValueError(f"{path}: expected a YAML list of stages")
    stages = []
    for entry in doc:
        params = entry.get("params", [])
        text = entry["name"] + (":" + ",".join(str(p) for p in params)
                                if params else "")
        stages.append(parse_stage(cfg, text))
    return stages


def make_single_render(cfg, names, param_rows):
    """jit'd [n,H,W,3] -> [n,H,W,3] through the fused sequential chain."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.ops.bank import render_pipeline

    consts = [jnp.asarray(p) for p in param_rows]

    @jax.jit
    def fn(imgs):
        n = imgs.shape[0]
        stages = [(name, jnp.broadcast_to(p[None], (n, p.shape[0])))
                  for name, p in zip(names, consts)]
        return render_pipeline(cfg, imgs, stages)

    return fn


def iter_groups(frames_iter, group: int):
    """Yield (names, [H,W,3] arrays) groups of consecutive same-shape
    frames; a shape change flushes the open group (each distinct shape
    compiles once — consecutive grouping keeps video/stream sources at a
    single compile)."""
    names, imgs, shape = [], [], None
    for name, img, _meta in frames_iter:
        if shape is not None and (img.shape != shape or len(imgs) == group):
            yield names, imgs
            names, imgs = [], []
        shape = img.shape
        names.append(name)
        imgs.append(img)
    if imgs:
        yield names, imgs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--source", required=True,
                   help="images dir/glob/.txt, video file, webcam id, url")
    p.add_argument("--out", default="runs/render",
                   help="output directory for rendered frames")
    p.add_argument("--stage", action="append", default=[],
                   metavar="NAME:P1,P2,...",
                   help="pipeline stage (repeatable, applied in order)")
    p.add_argument("--script", default=None,
                   help="YAML stage list (alternative to --stage)")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per dispatch (pp: the microbatch size)")
    p.add_argument("--pipe", type=int, default=0,
                   help="pipeline-parallel over N devices (N == number of "
                        "stages); 0 = single-device fused render")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel axis for --pipe (batch must divide)")
    p.add_argument("--window", type=int, default=8,
                   help="pp: microbatches in flight per dispatch (the "
                        "scan length; >= pipe stages to amortize fill)")
    p.add_argument("--vid_stride", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--cfg", type=str, default=None,
                   help="config module override (configs/)")
    p.add_argument("--exist-ok", action="store_true")
    args = p.parse_args(argv)

    from adaptiveisp_tpu.data.sources import open_source
    from adaptiveisp_tpu.obs.logging import increment_path, save_img
    from train_isp import load_cfg

    cfg = load_cfg(args.cfg)
    stages = list(load_script(cfg, args.script)) if args.script else []
    stages += [parse_stage(cfg, s) for s in args.stage]
    if not stages:
        p.error("no pipeline: give --stage and/or --script")
    names = [n for n, _ in stages]
    param_rows = [pp_ for _, pp_ in stages]

    out_dir = increment_path(args.out, exist_ok=args.exist_ok)
    os.makedirs(out_dir, exist_ok=True)

    if args.pipe > 0:
        if args.pipe != len(stages):
            p.error(f"--pipe {args.pipe} needs exactly {args.pipe} stages, "
                    f"got {len(stages)} (one stage per pipe device)")
        import jax.numpy as jnp

        from adaptiveisp_tpu.ops.pp import make_pipelined_render
        from adaptiveisp_tpu.train.mesh import make_mesh_dp_pp

        mesh = make_mesh_dp_pp(args.dp, args.pipe)
        pp_fn = make_pipelined_render(cfg, mesh, names)
        consts = [jnp.asarray(r) for r in param_rows]

        def render(imgs):  # [n, H, W, 3] -> same, n = window*batch grouped
            n = imgs.shape[0]
            m = -(-n // args.batch)          # microbatches this dispatch
            pad = m * args.batch - n
            if pad:
                imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)], 0)
            frames = imgs.reshape(m, args.batch, *imgs.shape[1:])
            out = np.asarray(pp_fn(jnp.asarray(frames), consts))
            return out.reshape(m * args.batch, *imgs.shape[1:])[:n]

        group = args.window * args.batch
    else:
        _jit_cache = {}

        def render(imgs):
            key = imgs.shape
            if key not in _jit_cache:
                _jit_cache[key] = make_single_render(cfg, names, param_rows)
            return np.asarray(_jit_cache[key](imgs))

        group = args.batch

    src = open_source(args.source, vid_stride=args.vid_stride,
                      max_frames=args.max_frames)
    sources = src if isinstance(src, list) else [src]

    n_frames, n_pix, t0 = 0, 0, time.perf_counter()
    for source in sources:
        for fnames, imgs in iter_groups(iter(source), group):
            batch = np.stack(imgs).astype(np.float32)
            out = render(batch)
            for fname, frame in zip(fnames, out):
                safe = fname.replace(":", "_").replace("/", "_")
                if not os.path.splitext(safe)[1]:
                    safe += ".png"
                save_img(frame, os.path.join(out_dir, safe))
            n_frames += len(fnames)
            n_pix += batch[..., 0].size
    wall = time.perf_counter() - t0
    chain = " -> ".join(names)
    print(f"rendered {n_frames} frame(s) through [{chain}] "
          f"in {wall:.2f}s ({n_pix / max(wall, 1e-9) / 1e6:.2f} MPix/s, "
          f"wall incl. IO) -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
