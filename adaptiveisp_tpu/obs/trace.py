"""XSpace trace parsing: contention-immune device-time attribution.

The chained-marginal profiler (tools/profile_step_breakdown.py) subtracts
host wall times, so tunnel RTT / host CPU load can push component marginals
negative (round-4 lesson).  This module instead reads the device's OWN
per-op clock out of a ``jax.profiler`` trace: every "XLA Ops" event in the
device plane carries ``device_duration_ps``, analytic ``flops`` /
``bytes_accessed``, and the jax scope path (``tf_op`` like
``jit(step)/agent_fwd/conv``) that :func:`jax.named_scope` annotations in
:mod:`adaptiveisp_tpu.train.step` put there — so device time aggregates
exactly per component, independent of anything the host is doing.

Proto dependency: the XSpace schema ships with tensorflow
(tensorflow.tsl.profiler.protobuf.xplane_pb2); gated import, the rest of the
package never needs it.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence


def find_xplane_files(trace_dir: str) -> List[str]:
    return sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))


def _stat_value(stat, stat_names):
    for field in ("str_value", "int64_value", "uint64_value", "double_value"):
        v = getattr(stat, field)
        if v:
            return v
    if stat.ref_value:
        return stat_names.get(stat.ref_value, "")
    return 0


def xplane_op_table(trace_dir: str,
                    plane_substr: str = "/device:") -> List[Dict]:
    """Aggregate the device plane's XLA-op events.

    Returns one row per distinct HLO op: {name, tf_op, category,
    duration_ps (summed over occurrences), flops, bytes, count}.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # gated

    paths = find_xplane_files(trace_dir)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    rows: Dict[int, Dict] = {}
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if plane_substr not in plane.name:
                continue
            stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    stats = {}
                    for s in list(ev.stats) + list(md.stats):
                        stats[stat_names.get(s.metadata_id, "")] = (
                            _stat_value(s, stat_names))
                    key = ev.metadata_id
                    row = rows.setdefault(key, {
                        "name": md.display_name or md.name.split(" ")[0],
                        "tf_op": str(stats.get("tf_op", "")),
                        "category": str(stats.get("hlo_category", "")),
                        "duration_ps": 0, "flops": 0, "bytes": 0,
                        "count": 0})
                    row["duration_ps"] += int(
                        stats.get("device_duration_ps", 0) or 0)
                    row["flops"] = int(stats.get("flops", 0) or 0)
                    row["bytes"] = int(stats.get("bytes_accessed", 0) or 0)
                    row["count"] += 1
    return sorted(rows.values(), key=lambda r: -r["duration_ps"])


# the train step's named_scope components (train/step.py); autodiff
# transposes keep the scope in their path, so each bucket is fwd+bwd
TRAIN_STEP_COMPONENTS = {
    "agent_fwd": ("agent_fwd",),
    "yolo_retouch": ("yolo_retouch",),
    "yolo_input": ("yolo_input",),
    "value_net": ("value_net",),
    "optimizer": ("optimizer",),
}


def component_breakdown(table: Sequence[Dict],
                        components: Optional[Dict] = None) -> Dict[str, Dict]:
    """Bucket the op table by scope-substring match on tf_op.

    Returns {component: {ms, flops, bytes, pct, achieved_tflops}} plus an
    'other' bucket and a 'total' row.  Percentages are of total device time.
    """
    components = components or TRAIN_STEP_COMPONENTS
    out = {k: {"ps": 0, "flops": 0, "bytes": 0} for k in components}
    out["other"] = {"ps": 0, "flops": 0, "bytes": 0}
    for row in table:
        dest = "other"
        for comp, keys in components.items():
            if any(k in row["tf_op"] for k in keys):
                dest = comp
                break
        out[dest]["ps"] += row["duration_ps"]
        out[dest]["flops"] += row["flops"] * row["count"]
        out[dest]["bytes"] += row["bytes"] * row["count"]
    total_ps = sum(v["ps"] for v in out.values()) or 1
    result = {}
    for comp, v in out.items():
        secs = v["ps"] * 1e-12
        result[comp] = {
            "ms": round(v["ps"] * 1e-9, 3),
            "pct": round(100.0 * v["ps"] / total_ps, 1),
            "gflops": round(v["flops"] / 1e9, 2),
            "achieved_tflops": (round(v["flops"] / secs / 1e12, 2)
                                if v["ps"] else 0.0),
            "achieved_gbs": (round(v["bytes"] / secs / 1e9, 1)
                             if v["ps"] else 0.0),
        }
    result["total"] = {
        "ms": round(total_ps * 1e-9, 3), "pct": 100.0,
        "gflops": round(sum(v["flops"] for v in out.values()) / 1e9, 2),
        "achieved_tflops": round(
            sum(v["flops"] for v in out.values()) / (total_ps * 1e-12)
            / 1e12, 2),
        "achieved_gbs": round(
            sum(v["bytes"] for v in out.values()) / (total_ps * 1e-12)
            / 1e9, 1),
    }
    return result
