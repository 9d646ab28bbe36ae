"""Probe: Bailey 4-step MXU FFT convolution vs the XLA FFT overlap-save.

The config-3 ledger (BASELINE.md) designed this: 16384 = 128 x 128, so
fft(seg) factorizes into DFT-128 matmul stages + twiddles. For the
overlap-save FILTER the spectrum product can be applied in the (k1, k2)
matrix domain directly, and the inverse mirrors the forward steps — the
whole fft -> product -> ifft pipeline becomes 4 batched (128-contraction)
matmuls + 3 elementwise stages, NO transposes, no digit-reversal.

Run on the TPU (same-session A/B): python bench/exp_bailey.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bailey_mats(N1: int, N2: int):
    k1 = np.arange(N1)
    k2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(k1, k1) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(k2, k2) / N2)
    T = np.exp(-2j * np.pi * np.outer(k1, k2) / (N1 * N2))
    return W1, W2, T


def bailey_conv(segs, Hm, N1, N2, precision):
    """ifft(fft(segs) * H) with both transforms as 4-step matmul FFTs and
    the product in the (k1, k2) matrix domain. segs: (s, N) complex64."""
    W1, W2, T = bailey_mats(N1, N2)
    c64 = lambda m: jnp.asarray(m, jnp.complex64)  # noqa: E731
    A = segs.reshape(-1, N1, N2)
    B = jnp.einsum("kn,snm->skm", c64(W1), A, precision=precision)
    C = B * c64(T)
    D = jnp.einsum("snm,mk->snk", C, c64(W2), precision=precision)
    E = D * Hm  # spectrum product, matrix domain: Hm[k1,k2]=H[k1+N1*k2]
    C2 = jnp.einsum("snk,km->snm", E, c64(np.conj(W2) / N2),
                    precision=precision)
    B2 = C2 * c64(np.conj(T))
    A2 = jnp.einsum("nk,skm->snm", c64(np.conj(W1) / N1), B2,
                    precision=precision)
    return A2.reshape(segs.shape[0], N1 * N2)


def main():
    N1 = N2 = 128
    N = N1 * N2
    ntaps = 1024
    step = N - (ntaps - 1)
    n_lin = 1 << 21
    nseg = -(-n_lin // step)
    print(f"nseg={nseg}")
    rng = np.random.default_rng(0)
    segs = (rng.standard_normal((nseg, N)) + 1j * rng.standard_normal((nseg, N))
            ).astype(np.complex64)
    taps = np.hanning(ntaps).astype(np.float32)
    H = np.fft.fft(taps, N).astype(np.complex64)
    Hm_np = H.reshape(N2, N1).T.copy()  # H[k1+N1*k2] -> [k1,k2]
    # axon: complex64 cannot cross program boundaries — encode as f32 pair
    sr = jnp.asarray(segs.real)
    si = jnp.asarray(segs.imag)

    @jax.jit
    def xla_path(sr, si):
        s = jax.lax.complex(sr, si)
        y = jnp.fft.ifft(jnp.fft.fft(s, axis=-1) * jnp.asarray(H), axis=-1)
        return jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)

    def timed(f, *a):
        out = jax.block_until_ready(f(*a))
        n_it = 30
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_it * 1e6, out

    t_x, (rr, ri) = timed(xla_path, sr, si)
    ref = np.asarray(rr) + 1j * np.asarray(ri)
    p_ref = float(np.mean(np.abs(ref) ** 2))
    print(f"XLA fft+prod+ifft: {t_x:.1f} us")
    for prec in ["default", "high", "highest"]:
        def f_enc(sr, si, p=prec):
            y = bailey_conv(jax.lax.complex(sr, si), jnp.asarray(Hm_np),
                            N1, N2, p)
            return (jnp.real(y).astype(jnp.float32),
                    jnp.imag(y).astype(jnp.float32))

        f = jax.jit(f_enc)
        t_b, (br, bi) = timed(f, sr, si)
        out = np.asarray(br) + 1j * np.asarray(bi)
        err = out - ref
        snr = 10 * np.log10(p_ref / float(np.mean(np.abs(err) ** 2)))
        print(f"bailey[{prec:8s}]: {t_b:.1f} us  ({t_x / t_b:.2f}x XLA)  "
              f"SNR vs XLA path {snr:.1f} dB")


if __name__ == "__main__":
    main()
