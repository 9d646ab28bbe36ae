"""EXPERIMENT: separate per-dispatch overhead from true per-step time.

All round-1/2 numbers divide one dispatched K-step scan's wall time by K.
If the axon tunnel charges a large fixed cost per dispatch, that method
over-reports per-step time by fixed/K. Sweep K and fit total = a + b*K:
b is the true on-device per-step time, a the dispatch overhead.

Cases: XLA 16.8 MB mul stream, the shipped mega-kernel (kernel only),
and the production mega step (prep + kernel).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 1 << 21
M, L, AUDIO_DECIM, A = 64, 16, 8, 65
GAIN = 0.5
KS = [25, 50, 100, 200, 400]


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


def fit(name, make_run, carry0):
    totals = {}
    for k in KS:
        totals[k] = best_total(make_run(k), carry0)
    ks = np.array(KS, np.float64)
    ts = np.array([totals[k] for k in KS])
    bmat = np.vstack([np.ones_like(ks), ks]).T
    (a, b), *_ = np.linalg.lstsq(bmat, ts, rcond=None)
    print(json.dumps({
        "case": name,
        "dispatch_ms": round(a * 1e3, 2),
        "us_per_step": round(b * 1e6, 2),
        "naive_us_at_k100": round(totals[100] / 100 * 1e6, 2),
        "totals_ms": {str(k): round(totals[k] * 1e3, 1) for k in KS},
    }), flush=True)
    return b


def main():
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal(1 << 22).astype(np.float32))

    def make_mul(k):
        @jax.jit
        def run(c):
            def body(cc, _):
                return cc + 1e-9, (x * cc)[:: 1 << 20].sum()
            return jax.lax.scan(body, c, xs=None, length=k)
        return run

    fit("xla_mul_16mb", make_mul, jnp.float32(1.0))

    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c_fold = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M
    H = M * L - 1

    xc = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    xr = jnp.asarray(xc.real.astype(np.float32))
    xi = jnp.asarray(xc.imag.astype(np.float32))
    xfull = np.concatenate([np.zeros(H, np.complex64), xc])
    V0 = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
    vr0 = jnp.asarray(V0.real.astype(np.float32))
    vi0 = jnp.asarray(V0.imag.astype(np.float32))
    prev0 = jnp.zeros((1, 2 * M), jnp.float32)
    tail0 = jnp.zeros((A - 1, 2 * M), jnp.float32)

    def make_kernel_only(k):
        @jax.jit
        def run(carry):
            def body(cc, _):
                prev, tail = cc
                aud, p2, t2 = fm_chain_step(vr0, vi0, prev, tail, c_fold,
                                            ataps, AUDIO_DECIM, GAIN, n_out)
                return (p2, t2), jnp.sum(jnp.abs(aud))
            return jax.lax.scan(body, carry, xs=None, length=k)
        return run

    b = fit("mega_kernel_only", make_kernel_only, (prev0, tail0))
    print(json.dumps({"case": "mega_kernel_only_true_msps",
                      "msps": round(B / b / 1e6, 1)}), flush=True)

    def make_production(k):
        @jax.jit
        def run(carry):
            def body(cc, _):
                prev, tail, cr, ci = cc
                xfr = jnp.concatenate([cr, xr])
                xfi = jnp.concatenate([ci, xi])
                Vr = xfr[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
                Vi = xfi[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
                aud, p2, t2 = fm_chain_step(Vr, Vi, prev, tail, c_fold,
                                            ataps, AUDIO_DECIM, GAIN, n_out)
                return (p2, t2, xr[-H:], xi[-H:]), jnp.sum(jnp.abs(aud))
            return jax.lax.scan(body, carry, xs=None, length=k)
        return run

    b = fit("mega_production", make_production,
            (prev0, tail0, jnp.zeros(H, jnp.float32), jnp.zeros(H, jnp.float32)))
    print(json.dumps({"case": "mega_production_true_msps",
                      "msps": round(B / b / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
