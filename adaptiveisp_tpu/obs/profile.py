"""Profiling: the 3-bucket (pre / inference / NMS) timing split + traces.

Counterpart of the reference Profile context timer
(/root/reference/yolov3/utils/general.py:173-191, consumed
val_adaptiveisp.py:254-415) with device synchronisation replacing
torch.cuda.synchronize, plus a jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class Profile(contextlib.ContextDecorator):
    """Accumulating timer; `with p: ...` adds to p.t (seconds)."""

    def __init__(self, sync: bool = False):
        self.t = 0.0
        self.n = 0
        self.sync = sync

    def __enter__(self):
        if self.sync:
            _block_all()
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            _block_all()
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        self.n += 1
        return False


def _block_all():
    # Cheap device barrier: tiny transfer forces completion of queued work.
    jax.device_get(jax.numpy.zeros(()))


def speed_report(profiles: Dict[str, Profile], images: int) -> str:
    """ms/image per bucket (reference val_adaptiveisp.py:411-415 format)."""
    parts = []
    for name, p in profiles.items():
        parts.append(f"{1000 * p.t / max(images, 1):.1f}ms {name}")
    return "Speed: " + ", ".join(parts) + " per image"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_fn(fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs/memory cost analysis of a jittable function — the
    torch_utils.profile() microbench analog (reference torch_utils.py:151-199)
    using XLA's own cost model instead of thop.

    Returns {'flops', 'bytes_accessed', 'params'} (keys present when the
    backend reports them).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    out: Dict[str, float] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            for k in ("flops", "bytes accessed"):
                if k in cost:
                    out[k.replace(" ", "_")] = float(cost[k])
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            out["output_bytes"] = float(
                getattr(mem, "output_size_in_bytes", 0))
            out["temp_bytes"] = float(getattr(mem, "temp_size_in_bytes", 0))
            out["argument_bytes"] = float(
                getattr(mem, "argument_size_in_bytes", 0))
    except Exception:
        pass
    return out
