"""EXPERIMENT: what does the mega-kernel's XLA-side prep really cost?

Same-session comparison (the axon tunnel varies run to run, so cross-
session deltas lie):
  kernel_only — vp planes preformed OUTSIDE the scan (loop-invariant,
                hoisted): pure pallas kernel time.
  production  — the real mega_step shape: xfull = concat(carry, x),
                V reshape, re/im split, planes concat INSIDE the scan
                (carry-dependent, not hoistable).
Also tests whether Mosaic supports an in-kernel row-major reshape
(Tp,128)->(2Tp,64) — the unpack needed for a packed-window kernel that
would delete the prep pass entirely.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1 << 21
M = 64
L = 16
AUDIO_DECIM = 8
A = 65
K = 100
GAIN = 0.5


def timeit(run, carry):
    carry, sums = run(carry)
    jax.block_until_ready(sums)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        carry, sums = run(carry)
        jax.device_get(sums)
        best = min(best, time.perf_counter() - t0)
    return best / K


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

    xfull = np.concatenate([np.zeros(H, np.complex64), xc])
    V0 = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
    vr0 = jnp.asarray(V0.real.astype(np.float32))
    vi0 = jnp.asarray(V0.imag.astype(np.float32))

    prev0 = jnp.zeros((1, 2 * M), jnp.float32)
    tail0 = jnp.zeros((A - 1, 2 * M), jnp.float32)

    # (a) kernel only: vp formed from loop-invariant vr0/vi0 -> hoisted
    @jax.jit
    def run_kernel_only(carry):
        def body(cc, _):
            prev, tail = cc
            aud, p2, t2 = fm_chain_step(vr0, vi0, prev, tail, c_fold, ataps,
                                        AUDIO_DECIM, GAIN, n_out)
            return (p2, t2), jnp.sum(jnp.abs(aud))
        return jax.lax.scan(body, carry, xs=None, length=K)

    dt = timeit(run_kernel_only, (prev0, tail0))
    print(json.dumps({"case": "kernel_only", "us_per_step": round(dt * 1e6, 1),
                      "msps": round(B / dt / 1e6, 1)}), flush=True)

    # (b) production shape: carry-dependent prep inside the scan
    @jax.jit
    def run_production(carry):
        def body(cc, _):
            prev, tail, car_r, car_i = cc
            xfr = jnp.concatenate([car_r, xr])
            xfi = jnp.concatenate([car_i, xi])
            Vr = xfr[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            Vi = xfi[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            aud, p2, t2 = fm_chain_step(Vr, Vi, prev, tail, c_fold, ataps,
                                        AUDIO_DECIM, GAIN, n_out)
            return (p2, t2, xr[-H:], xi[-H:]), jnp.sum(jnp.abs(aud))
        return jax.lax.scan(body, carry, xs=None, length=K)

    dt = timeit(run_production, (prev0, tail0, jnp.zeros(H, jnp.float32),
                                 jnp.zeros(H, jnp.float32)))
    print(json.dumps({"case": "production", "us_per_step": round(dt * 1e6, 1),
                      "msps": round(B / dt / 1e6, 1)}), flush=True)

    # (c) does Mosaic support the row-major unpack reshape in-kernel?
    def rk(x_ref, o_ref):
        v = x_ref[:, :]                     # (Tp, 128)
        o_ref[:, :] = v.reshape(2 * v.shape[0], 64)

    Tp = 256
    xp = jnp.asarray(rng.standard_normal((Tp, 128)).astype(np.float32))
    try:
        f = pl.pallas_call(
            rk,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * Tp, 64), jnp.float32),
        )
        out = np.asarray(jax.device_get(jax.jit(f)(xp)))
        ok = np.array_equal(out, np.asarray(xp).reshape(2 * Tp, 64))
        print(json.dumps({"case": "mosaic_unpack_reshape", "compiles": True,
                          "correct": bool(ok)}), flush=True)
    except Exception as e:
        print(json.dumps({"case": "mosaic_unpack_reshape", "compiles": False,
                          "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
