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


def test_fused_fold_dft_matches_two_step():
    """arm_fold_dft == (arm fold -> interleaved DFT) == pfb_channelize."""
    from newsched_tpu.ops import pfb as pfb_ops
    from newsched_tpu.ops.pallas.channelizer import pfb_channelize_fused

    M, L, n_out = 64, 8, 256
    rng = np.random.default_rng(5)
    taps = rng.standard_normal(M * L).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps, M)
    x = (rng.standard_normal(n_out * M) + 1j * rng.standard_normal(n_out * M)
         ).astype(np.complex64)
    st = pfb_ops.pfb_init_state(M * L)
    _, Y_ref = pfb_ops.pfb_channelize(arm, st, jnp.asarray(x), method="sum")
    xfull = jnp.concatenate([st.tail, jnp.asarray(x)])
    V = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
    c = np.asarray(arm)[::-1, ::-1].T.copy()
    Y = pfb_channelize_fused(V, c, n_out, interpret=True)
    ref = np.asarray(Y_ref)
    err = np.abs(np.asarray(Y) - ref).max() / np.abs(ref).max()
    assert err < 2e-6, err


def test_fm_chain_megakernel_matches_jnp_chain():
    """The fused full-chain kernel (fold + DFT + demod + audio FIR) must
    reproduce the composed jnp chain exactly, including streaming state
    across two batches."""
    from newsched_tpu.ops import fir as fir_ops, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    M, L, A, decim, gain = 64, 8, 33, 4, 0.7
    n_out = 256
    B = n_out * M
    rng = np.random.default_rng(6)
    taps = rng.standard_normal(M * L).astype(np.float32) * 0.1
    ataps = rng.standard_normal(A).astype(np.float32) * 0.2
    arm = pfb_ops.pfb_arm_taps(taps, M)
    c = np.asarray(arm)[::-1, ::-1].T.copy()

    def jnp_chain(x, tail, prev, ftails):
        st, Y = pfb_ops.pfb_channelize(arm, pfb_ops.PfbState(tail=tail),
                                       jnp.asarray(x), method="sum")
        xprev = jnp.concatenate([prev[None, :], Y[:-1]], axis=0)
        p = jnp.conj(xprev) * Y
        aud = jnp.arctan2(jnp.imag(p), jnp.real(p)) * gain

        def one(t, ch):
            s2, y = fir_ops.fir_filter(ataps, fir_ops.FirState(tail=t), ch,
                                       decim=decim, method="conv")
            return s2.tail, y

        import jax as _jax

        ftails2, ys = _jax.vmap(one)(ftails, aud.T.astype(jnp.float32))
        return ys.T, st.tail, Y[-1], ftails2

    def fused(x, tail, prev_p, tail_p):
        xfull = jnp.concatenate([tail, jnp.asarray(x)])
        V = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
        return fm_chain_step(jnp.real(V).astype(jnp.float32),
                             jnp.imag(V).astype(jnp.float32),
                             prev_p, tail_p, c, ataps, decim, gain, n_out,
                             tile=128, interpret=True)

    # batch 1 (zero state) then batch 2 (carried state) — exactness across
    # the boundary is the point
    tail = jnp.zeros((M * L - 1,), jnp.complex64)
    prev = jnp.zeros((M,), jnp.complex64)
    ftails = jnp.zeros((M, A - 1), jnp.float32)
    prev_p = jnp.zeros((1, 2 * M), jnp.float32)
    tail_p = jnp.zeros((A - 1, 2 * M), jnp.float32)
    for bi in range(2):
        x = (rng.standard_normal(B) + 1j * rng.standard_normal(B)
             ).astype(np.complex64)
        ref_aud, tail2, prev2, ftails2 = jnp_chain(x, tail, prev, ftails)
        got_aud, prev_p2, tail_p2 = fused(x, tail, prev_p, tail_p)
        np.testing.assert_allclose(np.asarray(got_aud), np.asarray(ref_aud),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"audio batch {bi}")
        # returned planes state must equal the reference complex state
        np.testing.assert_allclose(np.asarray(prev_p2)[0, :M],
                                   np.real(np.asarray(prev2)), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(prev_p2)[0, M:],
                                   np.imag(np.asarray(prev2)), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tail_p2)[:, :M],
                                   np.asarray(ftails2).T, rtol=2e-4, atol=2e-5)
        tail, prev, ftails = tail2, prev2, ftails2
        prev_p, tail_p = prev_p2, tail_p2


def test_fused_block_in_graph_matches_staged_blocks():
    """fm_channelizer_fused (mega-kernel block, interpret mode) must match
    the staged pfb -> vector_quad_demod -> vector_fir flowgraph."""
    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import filter as filt, general, vector_dsp
    from newsched_tpu.ops import firdes

    M, L, decim = 64, 8, 4
    n_items = 64 * 64
    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.1, 0.05, ntaps=33)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(n_items * 1) + 1j * rng.standard_normal(n_items)
         ).astype(np.complex64)

    def staged():
        fg = Flowgraph(batch_size=2048)
        src = general.vector_source(x)
        pfb = filt.pfb_channelizer(M, taps=taps)
        dem = vector_dsp.vector_quad_demod(M, gain=0.9)
        fir = vector_dsp.vector_fir(M, ataps, decim=decim, dtype="rf32")
        snk = general.vector_sink(dtype="rf32", vlen=(M,))
        for a, b in [(src, pfb), (pfb, dem), (dem, fir), (fir, snk)]:
            fg.connect(a, 0, b, 0)
        fg.run()
        return snk.data()

    def fused():
        fg = Flowgraph(batch_size=2048)
        src = general.vector_source(x)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)  # legacy twin
            blk = vector_dsp.fm_channelizer_fused(M, taps, ataps,
                                                  audio_decim=decim,
                                                  gain=0.9, interpret=True)
        snk = general.vector_sink(dtype="rf32", vlen=(M,))
        fg.connect(src, 0, blk, 0)
        fg.connect(blk, 0, snk, 0)
        fg.run()
        return snk.data()

    a, b = staged(), fused()
    assert a.shape == b.shape
    err = np.abs(a - b)
    # identical math up to atan2 formulation (poly vs libm) and matmul order
    assert err.max() < 5e-4, err.max()
