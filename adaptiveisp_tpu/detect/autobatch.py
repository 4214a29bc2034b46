"""Automatic batch-size estimation from device memory.

TPU-native re-design of the reference autobatch
(/root/reference/yolov3/utils/autobatch.py:1-72): the reference profiles 3
batch sizes empirically and fits a line to *observed* CUDA memory; under
XLA the compiler knows the exact peak memory of a compiled executable
before running it, so this uses **AOT lowering + CompiledMemoryStats**
(argument + output + temp bytes) at two batch sizes, solves the same
linear model mem(b) = intercept + slope*b analytically, and picks the
largest batch that fits `fraction` of the accelerator's HBM.

No allocation ever happens — estimation is purely static, so it cannot
OOM the device the way empirical profiling can.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax

DEFAULT_HBM_BYTES = 16 * 1024 ** 3  # v5e HBM per chip; fallback when the
#                                      backend reports no memory_stats (CPU)


def device_memory_bytes(device=None) -> int:
    """HBM capacity of `device` (bytes); DEFAULT_HBM_BYTES if unknown."""
    device = device or jax.devices()[0]
    stats = None
    if hasattr(device, "memory_stats"):
        try:
            stats = device.memory_stats()
        except Exception:
            stats = None
    if stats:
        for key in ("bytes_limit", "bytes_reservable_limit"):
            if stats.get(key):
                return int(stats[key])
    return DEFAULT_HBM_BYTES


def compiled_bytes(fn: Callable, *args, **kwargs) -> int:
    """Peak device bytes of jit(fn)(*args) from the AOT memory analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    ma = lowered.compile().memory_analysis()
    if ma is None:  # backend without memory analysis: be conservative
        return 0
    return int(ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes - ma.alias_size_in_bytes)


def autobatch(make_args: Callable[[int], tuple], fn: Callable,
              fraction: float = 0.8, device=None,
              capacity_bytes: Optional[int] = None,
              probe_sizes=(1, 4), max_batch: int = 1024,
              verbose: bool = True) -> int:
    """Largest batch size whose compiled step fits fraction*HBM.

    make_args(batch) must return the fn argument tuple at that batch size
    (shapes only matter — jax.ShapeDtypeStruct args are fine and cost no
    host memory).  fn is the step to budget (typically the jitted train
    step or forward).  Mirrors the reference's 'fit a line through
    profiled sizes' (autobatch.py:49-60) with exact compiler numbers.
    """
    capacity = capacity_bytes if capacity_bytes is not None \
        else device_memory_bytes(device)
    b0, b1 = probe_sizes
    m0 = compiled_bytes(fn, *make_args(b0))
    m1 = compiled_bytes(fn, *make_args(b1))
    if m1 <= m0 or m0 == 0:  # degenerate analysis: keep the probe size
        return b1
    slope = (m1 - m0) / (b1 - b0)
    intercept = m0 - slope * b0
    budget = capacity * fraction
    b_fit = int((budget - intercept) / slope)
    # round down to a power of two (XLA recompiles per shape; powers of two
    # tile the MXU best), clamp to [1, max_batch]
    b = max(1, min(max_batch, b_fit))
    b = 2 ** int(math.log2(b))
    if verbose:
        print(f"autobatch: mem(b) ~ {intercept / 1e6:.1f} MB + "
              f"{slope / 1e6:.2f} MB/img; capacity {capacity / 1e9:.1f} GB "
              f"x {fraction:.0%} -> batch {b}")
    return b


def autobatch_detector(model, variables, imgsz: int = 640,
                       fraction: float = 0.8, train: bool = False,
                       capacity_bytes: Optional[int] = None,
                       verbose: bool = True) -> int:
    """Reference check_train_batch_size/autobatch surface
    (yolov3/train.py:186, utils/autobatch.py:18-25) for a flax detector."""
    import jax.numpy as jnp

    def make_args(b):
        return (variables,
                jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.float32))

    if train:
        def fn(vars_, x):
            def loss(v):
                outs = model.apply(v, x, train=False)
                return sum(jnp.sum(o ** 2) for o in jax.tree_util.tree_leaves(outs))

            return jax.grad(loss)(vars_)
    else:
        def fn(vars_, x):
            return model.apply(vars_, x, train=False)

    return autobatch(make_args, fn, fraction=fraction,
                     capacity_bytes=capacity_bytes, verbose=verbose)
