"""Pallas kernel tests (interpret mode — runs on the CPU suite; the TPU
path is exercised by bench experiments and gated by NEWSCHED_TPU_PALLAS)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newsched_tpu.ops.pallas.channelizer import (
    arm_fold,
    arm_fold_reference,
    complex_to_interleaved,
    interleave_taps,
    interleaved_to_complex,
    pfb_arm_fold_complex,
)


@pytest.mark.parametrize("n_out,tile", [(512, 512), (1024, 512), (96, 512)])
def test_arm_fold_matches_reference(n_out, tile):
    W, L = 128, 16
    rng = np.random.default_rng(0)
    need = n_out + L - 1
    v = jnp.asarray(rng.standard_normal((need, W)).astype(np.float32))
    c2 = rng.standard_normal((L, W)).astype(np.float32)
    ref = np.asarray(arm_fold_reference(v, jnp.asarray(c2), n_out))
    got = np.asarray(arm_fold(v, c2, n_out, tile=tile, interpret=True))
    assert got.shape == (n_out, W)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_interleaved_roundtrip():
    rng = np.random.default_rng(1)
    V = (rng.standard_normal((32, 8)) + 1j * rng.standard_normal((32, 8))).astype(np.complex64)
    back = np.asarray(interleaved_to_complex(complex_to_interleaved(jnp.asarray(V))))
    np.testing.assert_array_equal(back, V)


def test_pfb_arm_fold_complex_matches_jnp_pfb():
    """The pallas fold must equal the shifted-sum inside pfb_channelize."""
    M, L, n_out = 64, 8, 256
    rng = np.random.default_rng(2)
    need = n_out + L - 1
    V = (rng.standard_normal((need, M)) + 1j * rng.standard_normal((need, M))).astype(np.complex64)
    c = rng.standard_normal((L, M)).astype(np.float32)
    acc_ref = jnp.zeros((n_out, M), jnp.complex64)
    for s in range(L):
        acc_ref = acc_ref + jnp.asarray(c[s])[None, :] * jax.lax.dynamic_slice_in_dim(
            jnp.asarray(V), s, n_out, 0)
    got = np.asarray(pfb_arm_fold_complex(jnp.asarray(V), c, n_out, interpret=True))
    np.testing.assert_allclose(got, np.asarray(acc_ref), rtol=1e-5, atol=1e-5)


def test_arm_fold_auto_tile():
    """A tile that does not divide n_out is shrunk to the largest divisor,
    and the result still matches the reference."""
    rng = np.random.default_rng(3)
    W, L, n_out = 128, 4, 1536
    v = jnp.asarray(rng.standard_normal((n_out + L - 1, W)).astype(np.float32))
    c2 = rng.standard_normal((L, W)).astype(np.float32)
    ref = np.asarray(arm_fold_reference(v, jnp.asarray(c2), n_out))
    got = np.asarray(arm_fold(v, c2, n_out, tile=1024, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
