"""Probe: Bailey 4-step MXU fast-conv vs the XLA-FFT overlap-save.

Measures, same-session with the scan+device_get two-point method (the
ONLY valid timing on the axon tunnel — rule (h), docs/architecture.md:
`block_until_ready` can return without waiting, so naive async loops
read ~10x-fast fiction; an early version of this probe did exactly
that):

  1. the XLA fft+product+ifft pair on pre-framed segments;
  2. the shipped zero-copy Bailey pipeline (ops/fftops.bailey_filter);
  3. the full fft_filter op both ways through ops/fir.fir_filter.

Historical context (BASELINE.md config-3 round-5 ledger): the G3
middle-collapse formulation measured 170.0 us vs 313.7 for the XLA pair,
and the zero-copy full op 182.6 vs 381.2 (2.09x, 90.3 dB); manual
planes-layout real matmuls (243.0) and Gauss 3-mult complex matmuls
(218.0) were measured-rejected — XLA's native complex einsum lowering
beats both.

Run on the TPU: python bench/exp_bailey.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def two_point(make, args, k1=20, k2=80, reps=3):
    fs_ = {k: make(k) for k in (k1, k2)}
    for f in fs_.values():
        jax.device_get(f(*args))
    ts = {}
    for k, f in fs_.items():
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1) * 1e6


def main():
    from newsched_tpu.ops import fir as fir_ops, firdes

    n = 1 << 21
    ntaps = 1024
    taps = np.asarray(firdes.low_pass(1.0, 1.0, 0.1, 0.03, ntaps=ntaps),
                      np.float32)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n + ntaps - 1)
         + 1j * rng.standard_normal(n + ntaps - 1)).astype(np.complex64)
    xr, xi = jnp.asarray(x.real), jnp.asarray(x.imag)

    def op_maker(fm):
        def make(K):
            @jax.jit
            def f(xr, xi):
                def body(c, _):
                    ar, ai = c
                    y = fir_ops.fft_filter_full(
                        jax.lax.complex(ar, ai),
                        jnp.asarray(taps.astype(np.complex64)), n,
                        fft_size=16384, fft_method=fm, taps_np=taps)
                    ar2 = jnp.concatenate([jnp.real(y) * 0.5, ar[n:]])
                    ai2 = jnp.concatenate([jnp.imag(y) * 0.5, ai[n:]])
                    return (ar2.astype(jnp.float32),
                            ai2.astype(jnp.float32)), None
                (ar, ai), _ = jax.lax.scan(body, (xr, xi), None, length=K)
                return jnp.sum(ar ** 2) + jnp.sum(ai ** 2)
            return f
        return make

    t_xla = two_point(op_maker("xla"), (xr, xi))
    t_mxu = two_point(op_maker("mxu"), (xr, xi))
    print(f"fft_filter_full[xla]: {t_xla:.1f} us/step = {n / t_xla:.0f} Msps")
    print(f"fft_filter_full[mxu]: {t_mxu:.1f} us/step = {n / t_mxu:.0f} Msps "
          f"({t_xla / t_mxu:.2f}x)")


if __name__ == "__main__":
    main()
