"""EXPERIMENT: mega-kernel matmul precision vs throughput and SNR.

HIGHEST = 6 bf16 MXU passes per f32 matmul, HIGH = 3, DEFAULT = 1.
The DFT and audio Toeplitz matmuls are the kernel's MXU work; exp_ksweep
showed the true (dispatch-corrected) step is compute-bound, so halving
passes matters. Each setting is timed with the two-point K fit (K=100 vs
K=400, removing the ~24 ms/dispatch axon tunnel overhead) and SNR-gated
against the float64 numpy golden.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location("bench_root", os.path.join(_ROOT, "bench.py"))
bench_root = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_root)

B = 1 << 21
M, L, AUDIO_DECIM, A = 64, 16, 8, 65
GAIN = 0.5


def best_total(run, carry, n=4):
    carry, sums = run(carry)
    jax.block_until_ready(sums)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        carry, sums = run(carry)
        jax.device_get(sums)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c_fold = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M
    H = M * L - 1

    rng = np.random.default_rng(0)
    xc = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    xr = jnp.asarray(xc.real.astype(np.float32))
    xi = jnp.asarray(xc.imag.astype(np.float32))
    ref = bench_root.numpy_reference(xc, taps, ataps)
    prev0 = jnp.zeros((1, 2 * M), jnp.float32)
    tail0 = jnp.zeros((A - 1, 2 * M), jnp.float32)

    for pname, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                        ("split3", "split3"),
                        ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        def make_run(k, prec=prec):
            @jax.jit
            def run(carry):
                def body(cc, _):
                    prev, tail, cr, ci = cc
                    xfr = jnp.concatenate([cr, xr])
                    xfi = jnp.concatenate([ci, xi])
                    Vr = xfr[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
                    Vi = xfi[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
                    aud, p2, t2 = fm_chain_step(Vr, Vi, prev, tail, c_fold,
                                                ataps, AUDIO_DECIM, GAIN,
                                                n_out, precision=prec)
                    return (p2, t2, xr[-H:], xi[-H:]), jnp.sum(jnp.abs(aud))
                return jax.lax.scan(body, carry, xs=None, length=k)
            return run

        @jax.jit
        def one(prev, tail, prec=prec):
            xfr = jnp.concatenate([jnp.zeros(H, jnp.float32), xr])
            xfi = jnp.concatenate([jnp.zeros(H, jnp.float32), xi])
            Vr = xfr[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            Vi = xfi[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            aud, _, _ = fm_chain_step(Vr, Vi, prev, tail, c_fold, ataps,
                                      AUDIO_DECIM, GAIN, n_out, precision=prec)
            return aud

        aud0 = np.asarray(jax.device_get(one(prev0, tail0)))
        snr = bench_root.snr_db(ref, aud0)
        carry0 = (prev0, tail0, jnp.zeros(H, jnp.float32),
                  jnp.zeros(H, jnp.float32))
        t100 = best_total(make_run(100), carry0)
        t400 = best_total(make_run(400), carry0)
        step = (t400 - t100) / 300
        print(json.dumps({"precision": pname,
                          "snr_db": round(float(snr), 1),
                          "true_us_per_step": round(step * 1e6, 1),
                          "true_msps": round(B / step / 1e6, 1),
                          "dispatch_ms": round((t100 - 100 * step) * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
