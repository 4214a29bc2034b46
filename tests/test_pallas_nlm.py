"""Pallas NLM kernel vs the jnp reference implementation (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from adaptiveisp_tpu.ops.denoise import nlm_gray
from adaptiveisp_tpu.ops.pallas.nlm import nlm_gray_pallas_interpret

RNG = np.random.RandomState(17)


def test_pallas_nlm_matches_jnp_single_tile():
    rgb = RNG.rand(1, 16, 32, 3).astype(np.float32)
    h = np.array([[0.4]], np.float32)
    want = np.asarray(nlm_gray(jnp.asarray(rgb), jnp.asarray(h)))
    got = np.asarray(nlm_gray_pallas_interpret(jnp.asarray(rgb), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_nlm_matches_jnp_multi_tile():
    # H=32 with tile 32? _pick_tile gives 32 -> force multiple tiles via H=64
    rgb = RNG.rand(2, 64, 32, 3).astype(np.float32)
    h = np.array([[0.7], [0.05]], np.float32)
    want = np.asarray(nlm_gray(jnp.asarray(rgb), jnp.asarray(h)))
    got = np.asarray(nlm_gray_pallas_interpret(jnp.asarray(rgb), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_nlm_zero_strength():
    rgb = RNG.rand(1, 16, 16, 3).astype(np.float32)
    h = np.zeros((1, 1), np.float32)
    got = np.asarray(nlm_gray_pallas_interpret(jnp.asarray(rgb), jnp.asarray(h)))
    np.testing.assert_allclose(got, np.clip(rgb, 0, 1), atol=1e-4)


def test_nlm_symmetric_variant_matches():
    """The symmetry-halved kernel (w_{-d} = shifted w_d) matches the
    baseline kernel and the XLA reference to float tolerance — at H=64
    (tile 32) so the variant's cross-tile mirror slices execute."""
    from adaptiveisp_tpu.ops.denoise import nlm_gray

    rng = np.random.RandomState(3)
    rgb = rng.rand(2, 64, 64, 3).astype(np.float32)
    h = np.array([[0.35], [0.12]], np.float32)
    want = np.asarray(nlm_gray(jnp.asarray(rgb), jnp.asarray(h)))
    base = np.asarray(nlm_gray_pallas_interpret(
        jnp.asarray(rgb), jnp.asarray(h), sym=False))
    sym = np.asarray(nlm_gray_pallas_interpret(
        jnp.asarray(rgb), jnp.asarray(h), sym=True))
    np.testing.assert_allclose(sym, want, atol=5e-6)
    np.testing.assert_allclose(sym, base, atol=5e-6)


def test_nlm_pallas_backward_matches_xla_autodiff():
    """The fused Pallas backward (on-chip weight recompute, all four
    adjoint paths) matches jax.grad through the XLA reference to float
    tolerance, including the h-strength gradient and the clip/relu tie
    semantics (multi-tile H=64 so cross-tile adjoint gathering runs)."""
    import jax
    from adaptiveisp_tpu.ops.denoise import nlm_gray
    from adaptiveisp_tpu.ops.pallas import nlm as N

    rng = np.random.RandomState(7)
    rgb = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    h = jnp.asarray(np.array([[0.4], [0.15]], np.float32))
    g = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    _, vjp_ref = jax.vjp(nlm_gray, rgb, h)
    dr_ref, dh_ref = vjp_ref(g)

    ones = jnp.ones((2, 1), jnp.float32)
    u, wsum = N._nlm_forward_uw(rgb, h, ones, interpret=True)
    _, clip_vjp = jax.vjp(lambda x: jnp.clip(x, 0.0, 1.0), u)
    dr, dhh = N._nlm_backward(rgb, h, ones, clip_vjp(g)[0], u, wsum,
                              interpret=True)
    _, relu_vjp = jax.vjp(lambda x: jnp.maximum(x, 0.0), h)
    dh = relu_vjp(dhh)[0]

    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=2e-4, atol=1e-5)


def test_nlm_pallas_custom_vjp_wiring():
    """jax.grad through the public nlm_gray_pallas entry (interpret
    kernels) equals jax.grad through the XLA path — the full custom_vjp
    wiring including residual plumbing and clip handling."""
    import jax
    from adaptiveisp_tpu.ops.denoise import nlm_gray
    from adaptiveisp_tpu.ops.pallas import nlm as N

    rng = np.random.RandomState(11)
    rgb = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    h = jnp.asarray(np.array([[0.3]], np.float32))

    # grads via the manual interpret chain (already validated above) are
    # compared against the XLA autodiff to ensure the wiring composes
    want = jax.grad(lambda r, hh: nlm_gray(r, hh).mean(),
                    argnums=(0, 1))(rgb, h)
    ones = jnp.ones((1, 1), jnp.float32)
    u, wsum = N._nlm_forward_uw(rgb, h, ones, interpret=True)
    g = jnp.full_like(u, 1.0 / u.size)
    _, clip_vjp = jax.vjp(lambda x: jnp.clip(x, 0.0, 1.0), u)
    dr, dhh = N._nlm_backward(rgb, h, ones, clip_vjp(g)[0], u, wsum,
                              interpret=True)
    _, relu_vjp = jax.vjp(lambda x: jnp.maximum(x, 0.0), h)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(want[0]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(relu_vjp(dhh)[0]),
                               np.asarray(want[1]), rtol=1e-4)


def test_nlm_pallas_gated_forward_and_backward():
    """Per-image gating (pl.when): gated-on images are BITWISE equal to the
    ungated kernel; gated-off images return zero output and zero grads —
    exact blend semantics since their one-hot weight multiplies them by 0."""
    import jax
    from adaptiveisp_tpu.ops.pallas import nlm as N

    rng = np.random.RandomState(23)
    rgb = jnp.asarray(rng.rand(3, 32, 32, 3).astype(np.float32))
    h = jnp.asarray(np.array([[0.4], [0.2], [0.6]], np.float32))
    gate = jnp.asarray(np.array([[1.0], [0.0], [0.3]], np.float32))
    ones = jnp.ones((3, 1), jnp.float32)

    u_all, w_all = N._nlm_forward_uw(rgb, h, ones, interpret=True)
    u_gat, w_gat = N._nlm_forward_uw(rgb, h, gate, interpret=True)
    # any nonzero gate (1.0 or 0.3) runs the identical kernel body
    np.testing.assert_array_equal(np.asarray(u_gat[0]), np.asarray(u_all[0]))
    np.testing.assert_array_equal(np.asarray(u_gat[2]), np.asarray(u_all[2]))
    assert not np.any(np.asarray(u_gat[1]))
    assert not np.any(np.asarray(w_gat[1]))

    # backward: gated-off image gets zero grads (its cotangent is zero in
    # the blend); gated-on images bitwise match the ungated backward
    g = jnp.asarray(rng.randn(3, 32, 32, 3).astype(np.float32))
    g = g.at[1].set(0.0)  # blend cotangent for the gated-off image IS zero
    _, clip_vjp = jax.vjp(lambda x: jnp.clip(x, 0.0, 1.0), u_all)
    v = clip_vjp(g)[0]
    dr_all, dh_all = N._nlm_backward(rgb, h, ones, v, u_all, w_all,
                                     interpret=True)
    dr_gat, dh_gat = N._nlm_backward(rgb, h, gate, v, u_gat, w_gat,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(dr_gat[0]), np.asarray(dr_all[0]))
    np.testing.assert_array_equal(np.asarray(dr_gat[2]), np.asarray(dr_all[2]))
    np.testing.assert_array_equal(np.asarray(dh_gat[0]), np.asarray(dh_all[0]))
    np.testing.assert_array_equal(np.asarray(dh_gat[2]), np.asarray(dh_all[2]))
    assert not np.any(np.asarray(dr_gat[1]))
    assert float(dh_gat[1, 0]) == 0.0


def test_render_blend_gating_matches_manual_candidate_sum():
    """render_blend (which now gates the NLM branch on its one-hot column)
    equals the explicit sum(onehot * candidates) — values AND gradients —
    for hard one-hots including ones that do/don't select denoise."""
    import jax
    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.ops import bank

    cfg = Config()
    k_nlm = list(cfg.filters).index("denoise")
    rng = np.random.RandomState(5)
    n = 3
    img = jnp.asarray(rng.rand(n, 16, 16, 3).astype(np.float32))
    params = [jnp.asarray(rng.randn(n, s.n_params).astype(np.float32))
              for s in bank.filter_specs(cfg)]
    sel = np.array([k_nlm, 0, k_nlm])  # two images select denoise
    onehot = jnp.asarray(np.eye(cfg.n_filters, dtype=np.float32)[sel])

    def blend(im, ps):
        return bank.render_blend(cfg, im, ps, onehot)

    def manual(im, ps):
        cands = bank.render_candidates(cfg, im, ps)
        return jnp.sum(cands * onehot[:, :, None, None, None], axis=1)

    out_b, out_m = blend(img, params), manual(img, params)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_m),
                               atol=1e-6)

    gb = jax.grad(lambda im: blend(im, params).sum())(img)
    gm = jax.grad(lambda im: manual(im, params).sum())(img)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gm), atol=1e-5)

    pb = jax.grad(lambda p: blend(img, [*params[:k_nlm], p,
                                        *params[k_nlm + 1:]]).sum())(
        params[k_nlm])
    pm = jax.grad(lambda p: manual(img, [*params[:k_nlm], p,
                                         *params[k_nlm + 1:]]).sum())(
        params[k_nlm])
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pm), rtol=1e-4,
                               atol=1e-6)
