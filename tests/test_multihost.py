"""Multi-host emulation: 2 processes x 4 virtual CPU devices running one
DP-sharded RL train step must match the single-process 8-device run
(VERDICT r2 weak #4; the jax.distributed path of train/mesh.py).

The workers are real OS processes joined over local TCP by
``jax.distributed.initialize`` — the same code path a TPU pod uses over
DCN, with Gloo standing in for the ICI collectives on CPU."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc, port, timeout=540):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-u", WORKER, str(r), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for r in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    metrics = []
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("METRICS ")]
        assert lines, f"rank {r} printed no metrics:\n{out[-2000:]}"
        metrics.append(json.loads(lines[-1][len("METRICS "):]))
    return metrics


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    port = _free_port()
    two = _run_workers(2, port)
    ref = _run_workers(1, _free_port())[0]

    assert {m["rank"] for m in two} == {0, 1}
    keys = [k for k in ref if k not in ("rank", "nproc")]
    assert "value_loss" in keys and len(keys) >= 2
    for k in keys:
        # both ranks see identical (replicated) metrics
        assert two[0][k] == pytest.approx(two[1][k], abs=1e-6), k
        # and the distributed run reproduces the single-process math
        # (Gloo reduction order may differ from XLA's single-process
        # reduction -> small float tolerance)
        assert two[0][k] == pytest.approx(ref[k], rel=1e-4, abs=1e-5), k
    assert np.isfinite([two[0][k] for k in keys]).all()
