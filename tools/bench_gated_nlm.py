"""On-chip check + microbench for the per-image NLM gate.

The training blend multiplies every filter candidate by a hard one-hot
weight (reference agent.py:154), so ~(K-1)/K of the batch pays the NLM
kernel — the single most expensive filter (reference config.py:24 runtime
table: NLM 10 vs ~2 for everything else) — for a contribution that is
exactly zero.  ``nlm_gray_pallas(gate=...)`` skips those images inside the
kernel (pl.when on an SMEM gate plane, ops/pallas/nlm.py).

This script validates on the REAL chip (Mosaic lowering, not interpret
mode) that
  - gated-on images are bitwise equal to the ungated kernel (fwd + grads),
  - gated-off images return zero output and exactly-zero grads,
and reports the fwd+bwd wall win for a 1/8-selected batch.

Measured on TPU v5e (8x512x512): all-on 23.6 ms -> gated 3.4 ms (6.96x).
Run:  timeout 900 python -u tools/bench_gated_nlm.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from adaptiveisp_tpu.ops.pallas.nlm import nlm_gray_pallas

rng = np.random.RandomState(0)
n = 8
rgb = jnp.asarray(rng.rand(n, 512, 512, 3).astype(np.float32))
h = jnp.asarray(np.full((n, 1), 0.4, np.float32))
g_on = jnp.ones((n, 1), jnp.float32)
# 1/8 selected — the expected density when one of ~8 concurrent rollouts
# picks the denoise action
gate = jnp.asarray(np.array([[1.0]] + [[0.0]] * (n - 1), np.float32))
ct = jnp.asarray(rng.randn(n, 512, 512, 3).astype(np.float32))
ct_gated = ct * (np.arange(n) == 0)[:, None, None, None]


def loss(r, hh, gg, v):
    return jnp.vdot(nlm_gray_pallas(r, hh, gate=gg), v)


vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

# correctness: selected-image outputs/grads equal the ungated kernel,
# gated-off grads exactly zero (the cotangent is zeroed outside image 0, so
# the all-on and gated losses must agree exactly)
l_all, (dr_all, dh_all) = vg(rgb, h, g_on, ct_gated)
l_gat, (dr_gat, dh_gat) = vg(rgb, h, gate, ct_gated)
dr_all, dr_gat = np.asarray(dr_all), np.asarray(dr_gat)
print("fwd selected equal:", np.array_equal(
    np.asarray(jax.jit(nlm_gray_pallas)(rgb, h, gate=g_on))[0],
    np.asarray(jax.jit(nlm_gray_pallas)(rgb, h, gate=gate))[0]))
print("loss equal:", float(l_all) == float(l_gat))
print("drgb[0] equal:", np.array_equal(dr_all[0], dr_gat[0]),
      " drgb[1:] zero:", not np.any(dr_gat[1:]))
print("dh equal (sel):", float(dh_all[0, 0]) == float(dh_gat[0, 0]),
      " dh[1:] zero:", not np.any(np.asarray(dh_gat)[1:]))


def timed(gg):
    """Chained marginal fwd+bwd time (median of 3; tunnel noise)."""
    @jax.jit
    def run(r, n_it):
        def body(i, x):
            _, (dr, _) = jax.value_and_grad(loss, argnums=(0, 1))(
                x, h, gg, ct_gated)
            return x + 1e-12 * dr
        return jax.lax.fori_loop(0, n_it, body, r).mean()

    float(run(rgb, jnp.int32(2)))  # compile + warm

    def t(k):
        t0 = time.perf_counter()
        float(run(rgb, jnp.int32(k)))
        return time.perf_counter() - t0

    s = [(t(10) - t(2)) / 8 for _ in range(3)]
    return sorted(s)[1]


t_all = timed(g_on)
t_gat = timed(gate)
print(f"fwd+bwd all-on: {t_all * 1e3:.1f} ms   gated 1/8: "
      f"{t_gat * 1e3:.1f} ms   speedup {t_all / t_gat:.2f}x")
