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
