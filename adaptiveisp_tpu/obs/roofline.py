"""Roofline accounting: analytic FLOPs/bytes vs device peaks.

The reference reports only wall times (val_adaptiveisp.py:411-415); here
every benchmark section also reports *utilization* so a regression between
"roofline-bound" and "leaving 2x on the table" is visible:

  * ``flops`` / ``bytes``   — XLA's own cost model on the optimized HLO
    (``compiled.cost_analysis()``), i.e. post-fusion analytic counts;
  * ``mfu``                 — achieved FLOP/s over the chip's bf16 matmul
    peak (the MFU convention of the scaling book);
  * ``hbm_util``            — achieved bytes/s over HBM peak bandwidth,
    the binding roof for elementwise-dominated ISP kernels;
  * ``bound``               — which roof the op sits under at its measured
    arithmetic intensity.

Peak numbers are the public per-chip specs (jax-ml.github.io/scaling-book,
cloud.google.com/tpu/docs/system-architecture):

  chip   bf16 FLOP/s   HBM B/s
  v4     2.75e14       1.23e12
  v5e    1.97e14       8.19e11
  v5p    4.59e14       2.77e12
  v6e    9.18e14       1.64e12
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax


@dataclasses.dataclass(frozen=True)
class Peaks:
    name: str
    flops: float      # bf16 matmul peak, FLOP/s
    hbm_bytes: float  # HBM bandwidth, bytes/s


_PEAKS = (
    ("v5 lite", Peaks("v5e", 1.97e14, 8.19e11)),
    ("v5litepod", Peaks("v5e", 1.97e14, 8.19e11)),
    ("v5e", Peaks("v5e", 1.97e14, 8.19e11)),
    ("v5p", Peaks("v5p", 4.59e14, 2.77e12)),
    ("v6 lite", Peaks("v6e", 9.18e14, 1.64e12)),
    ("v6e", Peaks("v6e", 9.18e14, 1.64e12)),
    ("v4", Peaks("v4", 2.75e14, 1.23e12)),
)


def device_peaks(device=None) -> Optional[Peaks]:
    """Peak table lookup by device_kind; None off-TPU (no meaningful MFU
    denominator for the CPU test backend)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if device.platform != "tpu":
        return None
    for key, peaks in _PEAKS:
        if key in kind:
            return peaks
    return None


def cost_of(fn, *args, **kwargs) -> Dict[str, float]:
    """{'flops', 'bytes'} of one call, from XLA's optimized-HLO cost model.

    An AOT lower+compile of ``fn`` — content-addressed by HLO hash, so when
    the benchmark already compiled the same program the persistent cache
    makes this a deserialization, not a recompile.  Empty dict when the
    backend doesn't report costs (e.g. Pallas custom calls, which XLA
    cannot see inside — pass analytic counts to :func:`utilization`
    instead)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if not cost:
            return {}
        out = {}
        if "flops" in cost:
            out["flops"] = float(cost["flops"])
        if "bytes accessed" in cost:
            out["bytes"] = float(cost["bytes accessed"])
        return out
    except Exception:
        return {}


def utilization(dt_seconds: float, flops: float = 0.0, bytes_: float = 0.0,
                device=None) -> Dict[str, float]:
    """Achieved rates + roof fractions for one measured execution.

    Returns {} off-TPU.  ``bound`` is 'compute' when the op's arithmetic
    intensity (flops/byte) exceeds the device's ridge point, else 'memory'.
    """
    peaks = device_peaks(device)
    if peaks is None or dt_seconds <= 0:
        return {}
    out: Dict[str, float] = {"device": peaks.name}
    if flops:
        out["gflops"] = round(flops / 1e9, 2)
        out["mfu_pct"] = round(100.0 * flops / dt_seconds / peaks.flops, 2)
    if bytes_:
        out["gbytes"] = round(bytes_ / 1e9, 3)
        out["hbm_pct"] = round(
            100.0 * bytes_ / dt_seconds / peaks.hbm_bytes, 2)
    if flops and bytes_:
        ridge = peaks.flops / peaks.hbm_bytes  # flops/byte at the corner
        out["bound"] = "compute" if flops / bytes_ > ridge else "memory"
    return out


def section_util(fn, dt_seconds: float, *args, device=None,
                 **kwargs) -> Dict[str, float]:
    """cost_of + utilization in one call: the per-benchmark-section hook."""
    cost = cost_of(fn, *args, **kwargs)
    return utilization(dt_seconds, cost.get("flops", 0.0),
                       cost.get("bytes", 0.0), device=device)
