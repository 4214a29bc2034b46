"""Resume all interrupted detector trainings under a directory tree.

TPU-native analog of the reference's spot-instance recovery script
(/root/reference/yolov3/utils/aws/resume.py): walk the runs tree for
``last.pkl`` checkpoints whose run is unfinished, rebuild each training
command from the ``opt.yaml`` provenance the trainer CLI writes next to its
checkpoints, and re-launch with ``--resume`` (optimizer / EMA / epoch are
restored exactly — see DetectorTrainer.resume).

Differences from the reference (deliberate):
- No DDP relaunch arithmetic: multi-device here is ``--dp N`` over one
  process (XLA mesh), so the resume command is identical to the original.
- ``--dry-run`` prints the commands instead of launching (the reference
  always launches detached); launched jobs run sequentially by default
  because only one process should own the TPU chip.

Usage:
    python tools/resume_all.py [root_dir] [--dry-run] [--parallel]
"""

from __future__ import annotations

import argparse
import os
import pickle
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def find_resumable(root: Path):
    """Yield (last_ckpt, opt_dict) for every unfinished run under root."""
    import yaml

    for last in sorted(root.rglob("last.pkl")):
        opt_path = last.parent / "opt.yaml"
        if not opt_path.exists():
            continue
        with open(opt_path) as f:
            opt = yaml.safe_load(f) or {}
        try:
            with open(last, "rb") as f:
                ckpt = pickle.load(f)
        except Exception:
            continue
        done_epoch = int(ckpt.get("epoch", -1))
        if done_epoch + 1 >= int(opt.get("epochs", 0)):
            continue  # run completed
        yield last, opt


def resume_command(last: Path, opt: dict):
    """Rebuild the trainer CLI invocation from opt.yaml + --resume.

    opt.yaml is ``vars(args)`` verbatim (train_loop CLI provenance dump),
    so every argparse dest maps back to its flag generically — flags that
    change training semantics (--optimizer, --linear-lr, --freeze, --rect,
    --tp, ...) must survive the resume or the restored optimizer state
    would be applied under a different transform/schedule.
    """
    cmd = [sys.executable, "-m", "adaptiveisp_tpu.detect.train_loop"]
    # resume: replaced by the fresh --resume below; evolve: an evolve
    # sweep is not resumable through last.pkl (it resumes from its own
    # evolve.csv); weights: initial weights are overridden by the restore.
    skip = {"resume", "evolve", "weights"}
    for k, v in opt.items():
        if k in skip or v is None:
            continue
        flag = "--" + k.replace("_", "-")
        if isinstance(v, bool):
            if v:
                cmd.append(flag)
        elif isinstance(v, (list, tuple)):
            cmd += [flag] + [str(x) for x in v]
        else:
            cmd += [flag, str(v)]
    cmd += ["--resume", str(last)]
    return cmd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root", nargs="?", default="runs",
                   help="directory tree to scan for last.pkl checkpoints")
    p.add_argument("--dry-run", action="store_true",
                   help="print the resume commands without launching")
    p.add_argument("--parallel", action="store_true",
                   help="launch all resumes at once (default: sequential — "
                        "one process should own the TPU)")
    args = p.parse_args(argv)

    cmds = [resume_command(last, opt)
            for last, opt in find_resumable(Path(args.root))]
    if not cmds:
        print(f"no resumable runs under {args.root}")
        return []
    procs = []
    for cmd in cmds:
        print(" ".join(cmd))
        if args.dry_run:
            continue
        if args.parallel:
            procs.append(subprocess.Popen(cmd, cwd=REPO))
        else:
            subprocess.run(cmd, cwd=REPO, check=False)
    for pr in procs:
        pr.wait()
    return cmds


if __name__ == "__main__":
    main()
