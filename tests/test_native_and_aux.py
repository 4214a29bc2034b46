"""Native preprocessing, detector trainer aux (EMA/EarlyStopping/export)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

RNG = np.random.RandomState(41)


def test_native_resize_matches_numpy():
    from adaptiveisp_tpu.data.native import get_lib, resize_bilinear_native

    if get_lib() is None:
        pytest.skip("native library unavailable")
    im = RNG.rand(37, 53, 3).astype(np.float32)
    got = resize_bilinear_native(im, 64, 48)
    # numpy oracle (the original pure-python implementation)
    h, w = im.shape[:2]
    ys = (np.arange(64) + 0.5) * h / 64 - 0.5
    xs = (np.arange(48) + 0.5) * w / 48 - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    top = im[y0c][:, x0c] * (1 - wx) + im[y0c][:, x1c] * wx
    bot = im[y1c][:, x0c] * (1 - wx) + im[y1c][:, x1c] * wx
    want = top * (1 - wy) + bot * wy
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ema_update_ramps():
    from adaptiveisp_tpu.detect.train_detector import ema_init, ema_update

    params = {"w": jnp.zeros((4,))}
    ema = ema_init(params)
    new_params = {"w": jnp.ones((4,))}
    ema1 = ema_update(ema, new_params, decay=0.9999, tau=2000.0)
    # first update: d = 0.9999*(1 - e^{-1/2000}) ~ 5e-4 -> ema ~ new params
    assert float(ema1.params["w"][0]) > 0.99
    # after many updates the decay approaches 0.9999 (slow tracking)
    ema_n = ema1._replace(updates=jnp.asarray(100000, jnp.int32))
    ema2 = ema_update(ema_n, {"w": jnp.zeros((4,))}, decay=0.9999)
    assert float(ema2.params["w"][0]) > 0.99  # barely moved


def test_early_stopping():
    from adaptiveisp_tpu.detect.train_detector import EarlyStopping

    es = EarlyStopping(patience=3)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert not es(2, 0.4)
    assert es(4, 0.3)  # 4 - 0 >= 3
    es2 = EarlyStopping(patience=3)
    es2(0, 0.5)
    es2(2, 0.6)  # improvement resets
    assert not es2(4, 0.5)
    assert es2(5, 0.5)


def test_one_cycle_schedule():
    from adaptiveisp_tpu.detect.train_detector import one_cycle

    lf = one_cycle(1.0, 0.01, 100)
    assert abs(lf(0) - 1.0) < 1e-9
    assert abs(lf(100) - 0.01) < 1e-9
    assert lf(50) < lf(10)


def test_fuse_conv_bn():
    import torch

    from adaptiveisp_tpu.detect.train_detector import fuse_conv_bn

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 4, 3, 1, 1, bias=False)
    bn = torch.nn.BatchNorm2d(4)
    bn.running_mean.data = torch.randn(4) * 0.2
    bn.running_var.data = torch.rand(4) + 0.5
    bn.weight.data = torch.rand(4) + 0.5
    bn.bias.data = torch.randn(4) * 0.2
    bn.eval()
    x = torch.rand(1, 3, 8, 8)
    with torch.no_grad():
        want = bn(conv(x)).numpy()

    k = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    w, b = fuse_conv_bn(jnp.asarray(k),
                        jnp.asarray(bn.weight.detach().numpy()),
                        jnp.asarray(bn.bias.detach().numpy()),
                        jnp.asarray(bn.running_mean.numpy()),
                        jnp.asarray(bn.running_var.numpy()))
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), w, (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_detector_train_step_smoke():
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import create_detector
    from adaptiveisp_tpu.detect.train_detector import (
        DetTrainConfig, init_detector_train_state, make_detector_optimizer,
        make_detector_train_step)

    spec = {
        "nc": 4,
        "anchors": [[10, 14, 23, 27, 37, 58]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[3], 1, "Detect", ["nc", "anchors"]]],
    }
    model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                       imgsz=64)
    dcfg = DetTrainConfig(epochs=2, batch_size=2)
    tx, sched = make_detector_optimizer(dcfg, steps_per_epoch=10)
    anchors = [np.asarray(spec["anchors"][0], np.float32).reshape(-1, 2) / 16]
    step = make_detector_train_step(model, anchors, LossHyp(), tx)
    state = init_detector_train_state(variables, tx)

    images = jnp.asarray(RNG.rand(2, 64, 64, 3).astype(np.float32))
    targets = jnp.asarray(
        np.tile([[1, 0.5, 0.5, 0.4, 0.4]], (2, 1)).reshape(2, 1, 5)
        .astype(np.float32))
    tmask = jnp.ones((2, 1), bool)
    jit_step = jax.jit(step)
    state, metrics = jit_step(state, images, targets, tmask)
    assert np.isfinite(float(metrics["loss"]))
    state2, m2 = jit_step(state, images, targets, tmask)
    assert int(state2.step) == 2
    # warmup LR is tiny at step 0
    assert float(sched(0)) < float(sched(25))


def test_export_stablehlo_roundtrip(tmp_path):
    from adaptiveisp_tpu.detect.export import export_stablehlo, load_stablehlo

    def fn(x):
        return jnp.tanh(x) * 2.0

    x = jnp.ones((2, 4), jnp.float32)
    path = export_stablehlo(fn, (x,), str(tmp_path / "m.stablehlo"))
    exported = load_stablehlo(path)
    out = exported.call(x)
    np.testing.assert_allclose(np.asarray(out), np.tanh(np.ones((2, 4))) * 2,
                               rtol=1e-6)


def test_callbacks_registry():
    from adaptiveisp_tpu.obs.callbacks import Callbacks

    cb = Callbacks()
    seen = []
    cb.register_action("on_train_start", "probe", lambda *a: seen.append(a))
    cb.run("on_train_start", 1, 2)
    assert seen == [(1, 2)]
    with pytest.raises(AssertionError):
        cb.run("nonexistent_hook")


def test_profile_fn_reports_costs():
    from adaptiveisp_tpu.obs.profile import profile_fn

    def f(x):
        return jnp.tanh(x @ x)

    out = profile_fn(f, jnp.ones((64, 64)))
    assert isinstance(out, dict)
    # CPU backend reports flops for the matmul
    if "flops" in out:
        assert out["flops"] >= 2 * 64 * 64 * 64 * 0.5


def test_profiler_trace_smoke(tmp_path):
    from adaptiveisp_tpu.obs.profile import trace

    with trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os
    assert any(os.scandir(tmp_path))  # trace artifacts written


# --------------------------------------------------------------------------- #
# autobatch (reference utils/autobatch.py -> static XLA memory analysis)
# --------------------------------------------------------------------------- #
def test_autobatch_linear_model():
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.detect.autobatch import autobatch, compiled_bytes

    def make_args(b):
        return (jax.ShapeDtypeStruct((b, 128, 128, 3), jnp.float32),)

    def fn(x):
        return (x * 2.0 + 1.0).sum(axis=(1, 2, 3))

    m1 = compiled_bytes(fn, *make_args(1))
    m4 = compiled_bytes(fn, *make_args(4))
    assert m4 > m1 > 0

    # capacity for ~exactly 64 images worth of linear growth
    slope = (m4 - m1) / 3
    intercept = m1 - slope
    cap = intercept + slope * 100
    b = autobatch(make_args, fn, fraction=1.0, capacity_bytes=int(cap),
                  verbose=False)
    assert b == 64  # floor(100) to the next power of two below
    # tiny capacity -> batch 1
    assert autobatch(make_args, fn, fraction=1.0,
                     capacity_bytes=int(intercept + slope),
                     verbose=False) == 1


def test_autobatch_detector_surface():
    import jax

    from adaptiveisp_tpu.detect.autobatch import autobatch_detector
    from adaptiveisp_tpu.detect.model import create_detector

    spec = {
        "nc": 2,
        "anchors": [[10, 14, 23, 27, 37, 58]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[2], 1, "Detect", ["nc", "anchors"]]],
    }
    model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                       imgsz=64)
    b = autobatch_detector(model, variables, imgsz=64, fraction=0.8,
                           capacity_bytes=512 * 1024 ** 2, verbose=False)
    assert 1 <= b <= 1024 and (b & (b - 1)) == 0  # a power of two


def test_callbacks_threaded_dispatch():
    """thread=True fires handlers on daemon threads (reference
    utils/callbacks.py:60-76) so slow backends can't stall the trainer."""
    import threading

    from adaptiveisp_tpu.obs.callbacks import Callbacks

    cb = Callbacks()
    done = threading.Event()
    seen = {}

    def handler(x, key=None):
        seen["args"] = (x, key)
        seen["thread"] = threading.current_thread()
        done.set()

    cb.register_action("on_train_end", "slow", handler)
    cb.run("on_train_end", 41, key="k", thread=True)
    assert done.wait(timeout=5.0)
    assert seen["args"] == (41, "k")
    assert seen["thread"] is not threading.main_thread()
    assert seen["thread"].daemon


def test_xplane_component_breakdown(tmp_path):
    """obs/trace.py parses an XSpace and buckets device time by the
    named_scope path in tf_op (hermetic: synthetic proto, no device)."""
    pytest.importorskip("tensorflow")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    from adaptiveisp_tpu.obs.trace import (component_breakdown,
                                           xplane_op_table)

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    smd = {"device_duration_ps": 1, "tf_op": 2, "flops": 3,
           "bytes_accessed": 4, "hlo_category": 5}
    for name, sid in smd.items():
        plane.stat_metadata[sid].id = sid
        plane.stat_metadata[sid].name = name
    ops = [("fusion.1", "jit(step)/agent_fwd/conv", 7000, 100, 50),
           ("fusion.2", "jit(step)/transpose(jvp(step))/agent_fwd/conv",
            2000, 40, 10),
           ("fusion.3", "jit(step)/value_net/dot", 1000, 10, 5)]
    line = plane.lines.add()
    line.name = "XLA Ops"
    for i, (nm, tf_op, dur, fl, by) in enumerate(ops, start=1):
        md = plane.event_metadata[i]
        md.id, md.name, md.display_name = i, nm, nm
        s = md.stats.add(); s.metadata_id = smd["tf_op"]; s.str_value = tf_op
        s = md.stats.add(); s.metadata_id = smd["flops"]; s.int64_value = fl
        s = md.stats.add()
        s.metadata_id = smd["bytes_accessed"]; s.int64_value = by
        for _ in range(2):  # two occurrences of each op
            ev = line.events.add()
            ev.metadata_id = i
            s = ev.stats.add()
            s.metadata_id = smd["device_duration_ps"]
            s.int64_value = dur

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(xs.SerializeToString())

    table = xplane_op_table(str(tmp_path))
    assert len(table) == 3
    assert table[0]["name"] == "fusion.1"
    assert table[0]["duration_ps"] == 14000  # 2 occurrences summed

    comps = component_breakdown(table)
    # agent bucket = fwd + transposed bwd
    assert comps["agent_fwd"]["ms"] == round((14000 + 4000) * 1e-9, 3)
    assert comps["value_net"]["pct"] == round(100 * 2000 / 20000, 1)
    assert comps["agent_fwd"]["gflops"] == round((200 + 80) / 1e9, 2)
    assert comps["total"]["ms"] == round(20000 * 1e-9, 3)
    assert comps["other"]["ms"] == 0
