"""On-chip breakdown of the RL train step: which sub-graph owns the ~56 ms.

Times, with the chained-marginal method (tunnel-safe), fwd+bwd of each
component in isolation at the production shape (batch 8 @ 512px):
  - full production train step (reference point)
  - agent fwd+bwd (includes the all-filter blend render)
  - blend render alone fwd+bwd (render_candidates + prob blend)
  - production gated blend fwd+bwd (hard one-hot + per-image gated NLM)
  - NLM pallas fwd+bwd alone
  - frozen bf16 YOLOv3 fwd+bwd through the image
  - value net (two applies, as the step does) fwd+bwd

Usage: python tools/profile_step_breakdown.py  (TPU; ~10 min incl. compiles)

For contention-immune attribution use tools/trace_breakdown.py instead: one
jax.profiler trace of the full step, device time per component read from the
XLA op metadata — no marginal subtraction, so host/tunnel load cannot push
components negative the way it can here.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed_chain(fn, x0, iters_short=2, iters_long=10, repeats=5):
    """Marginal per-iter time of x = fn(x) chains (cancels dispatch/fetch).

    Tunnel RTT varies run-to-run by ±30%; 5 repeats + median keeps single
    outliers (including negative marginals under host load) out of the
    reported number.  All samples are printed for transparency.
    """
    import jax

    def run_n(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        jax.tree_util.tree_map(
            lambda a: float(np.asarray(jax.device_get(a)).ravel()[0]), x)
        return time.perf_counter() - t0

    run_n(1)  # compile
    samples = []
    for _ in range(repeats):
        ts, tl = run_n(iters_short), run_n(iters_long)
        samples.append((tl - ts) / (iters_long - iters_short))
    med = sorted(samples)[repeats // 2]
    print("   samples:", " ".join(f"{s*1e3:.1f}" for s in samples), "ms",
          flush=True)
    return med


def main():
    import os

    import jax
    import jax.numpy as jnp

    # share bench.py's persistent compile cache so profiling runs never
    # re-pay the tunneled remote compiles (content-addressed by HLO hash);
    # same opt-out and same repo-relative default as bench.py so the two
    # tools can't silently diverge to different caches
    if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:  # cache is an optimization, not a requirement
            print(f"compile cache unavailable ({e})", flush=True)

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import (
        DetectionModel, anchors_in_grid_units, create_detector)
    from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC
    from adaptiveisp_tpu.ops import bank
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states
    from adaptiveisp_tpu.policy.value import create_value_state
    from adaptiveisp_tpu.train.optim import make_optimizer
    from adaptiveisp_tpu.train.step import init_train_state, make_train_step

    batch, imgsz = 8, 512
    cfg = Config()
    tcfg = TrainConfig(batch_size=batch, epochs=1, imgsz=imgsz)
    ka, kv, ky = jax.random.split(jax.random.PRNGKey(0), 3)
    agent, agent_vars = create_agent_state(cfg, ka, image_size=imgsz,
                                           batch=1)
    value, value_vars = create_value_state(cfg, kv, image_size=imgsz,
                                           batch=1)
    _, yolo_vars = create_detector(ky, imgsz=256)
    yolo = DetectionModel(spec=YOLOV3_SPEC, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, imgsz, imgsz, 3).astype(np.float32))
    z = jnp.asarray(rng.rand(batch, cfg.z_dim).astype(np.float32))
    states = jnp.asarray(get_initial_states(batch, cfg.num_state_dim))

    # ---- full production step ------------------------------------------
    tx = make_optimizer(tcfg.lr, 1000)
    step_fn = jax.jit(make_train_step(agent, value, yolo, cfg, tcfg,
                                      anchors_in_grid_units(), LossHyp(),
                                      tx, tx, cached_input_loss=True),
                      donate_argnums=0)
    # donate COPIES: step_fn donates the state, and the component benches
    # below still need the original agent/value variables alive
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state = init_train_state(copy(agent_vars), copy(value_vars), tx, tx)
    targets = np.zeros((batch, 16, 5), np.float32)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((batch, 16), bool)
    tmask[:, 0] = True
    loss_in = rng.rand(batch, 1).astype(np.float32)
    b = (img, z, states, jnp.asarray(targets), jnp.asarray(tmask),
         jnp.asarray(loss_in))

    out = step_fn(state, yolo_vars, b, jax.random.PRNGKey(1), 0.0)
    float(out.metrics["value_loss"])
    cur = [out]

    def full(x):
        cur[0] = step_fn(cur[0].state, yolo_vars, b, jax.random.PRNGKey(0),
                         0.0)
        return cur[0].metrics["value_loss"]

    t0 = time.perf_counter()
    samples = []
    for _ in range(3):
        def run_n(n):
            t = time.perf_counter()
            for i in range(n):
                full(None)
            float(jax.device_get(cur[0].metrics["value_loss"]))
            return time.perf_counter() - t
        ts, tl = run_n(2), run_n(10)
        samples.append((tl - ts) / 8)
    t_full = sorted(samples)[1]
    print(f"full step:           {t_full*1e3:7.2f} ms", flush=True)

    # ---- agent fwd+bwd ---------------------------------------------------
    @jax.jit
    def agent_fb(x):
        def loss(p):
            (retouch, ns, surr, pen, _, info), _ = agent.apply(
                {"params": p, "batch_stats": agent_vars["batch_stats"]},
                x, z, states, 0.5, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            return retouch.mean() + surr.mean() + pen.mean()
        g = jax.grad(loss)(agent_vars["params"])
        leaf = jax.tree_util.tree_leaves(g)[0]
        return x + leaf.mean() * 0.0 + 1e-6

    print(f"agent fwd+bwd:       {timed_chain(agent_fb, img)*1e3:7.2f} ms",
          flush=True)

    # ---- blend render alone fwd+bwd --------------------------------------
    specs = bank.filter_specs(cfg)
    n_filters = len(specs)
    params_list = [jnp.asarray(rng.rand(batch, s.n_params)
                               .astype(np.float32) * 2 - 1) for s in specs]
    probs = jnp.asarray(rng.rand(batch, n_filters).astype(np.float32))
    probs = probs / probs.sum(-1, keepdims=True)

    @jax.jit
    def blend_fb(x):
        def loss(pl):
            cands = bank.render_candidates(cfg, x, pl)  # [N, F, H, W, C]
            w = probs[:, :, None, None, None]           # [N, F, 1, 1, 1]
            return (cands * w).sum(1).mean()
        g = jax.grad(loss)(params_list)
        return x + g[0].mean() * 0.0 + 1e-6

    print(f"blend render fwd+bwd:{timed_chain(blend_fb, img)*1e3:7.2f} ms",
          flush=True)

    # ---- production blend: hard one-hot + gated NLM ----------------------
    sel = jnp.asarray(rng.randint(0, n_filters, size=(batch,)))
    onehot = jax.nn.one_hot(sel, n_filters, dtype=jnp.float32)

    @jax.jit
    def blend_gated_fb(x):
        def loss(pl):
            return bank.render_blend(cfg, x, pl, onehot).mean()
        g = jax.grad(loss)(params_list)
        return x + g[0].mean() * 0.0 + 1e-6

    print(f"gated blend fwd+bwd: {timed_chain(blend_gated_fb, img)*1e3:7.2f}"
          " ms", flush=True)

    # ---- NLM alone fwd+bwd ------------------------------------------------
    from adaptiveisp_tpu.ops import denoise as dn

    dn_spec = bank.get_spec(cfg, "denoise")
    dn_params = jnp.asarray(rng.rand(batch, dn_spec.n_params)
                            .astype(np.float32) * 2 - 1)

    @jax.jit
    def nlm_fb(x):
        def loss(p):
            return bank.apply_one(cfg, dn_spec, x, p).mean()
        g = jax.grad(loss)(dn_params)
        return x + g.mean() * 0.0 + 1e-6

    print(f"NLM fwd+bwd:         {timed_chain(nlm_fb, img)*1e3:7.2f} ms",
          flush=True)

    # ---- frozen bf16 YOLO fwd+bwd through image ---------------------------
    anchors_grid = anchors_in_grid_units()
    from adaptiveisp_tpu.detect.loss import per_image_loss_batch

    @jax.jit
    def yolo_fb(x):
        def loss(xx):
            preds = yolo.apply(yolo_vars, xx, train=False)
            l, _ = per_image_loss_batch(preds, jnp.asarray(targets),
                                        jnp.asarray(tmask), anchors_grid,
                                        LossHyp())
            return l.mean()
        g = jax.grad(loss)(x)
        return x + g * 1e-6

    print(f"YOLO bf16 fwd+bwd:   {timed_chain(yolo_fb, img)*1e3:7.2f} ms",
          flush=True)

    # ---- value x2 fwd+bwd --------------------------------------------------
    @jax.jit
    def value_fb(x):
        def loss(p):
            v1, m = value.apply(
                {"params": p, "batch_stats": value_vars["batch_stats"]},
                x, states, train=True, mutable=["batch_stats"])
            v2, _ = value.apply(
                {"params": p, "batch_stats": m["batch_stats"]},
                x, states, train=True, mutable=["batch_stats"])
            return v1.mean() + v2.mean()
        g = jax.grad(loss)(value_vars["params"])
        leaf = jax.tree_util.tree_leaves(g)[0]
        return x + leaf.mean() * 0.0 + 1e-6

    print(f"value x2 fwd+bwd:    {timed_chain(value_fb, img)*1e3:7.2f} ms",
          flush=True)
    print(f"(wall {time.perf_counter()-t0:.0f}s after full-step timing)",
          flush=True)


if __name__ == "__main__":
    main()
