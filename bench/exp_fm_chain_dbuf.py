"""EXPERIMENT: fm_chain mega-kernel with double-buffered window DMA.

The shipped kernel serializes `dma.start(); dma.wait()` per tile; this
variant prefetches tile i+1's window while tile i computes. Run:

    python bench/exp_fm_chain_dbuf.py
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

from newsched_tpu.ops.pallas.channelizer import _round8
from newsched_tpu.ops.pallas.fm_chain import (
    audio_toeplitz, planes_dft_matrix, planes_taps, _mm)
from newsched_tpu.ops.pallas.mathfns import atan2

B = 1 << 21
M = 64
L = 16
AUDIO_DECIM = 8
A = 65
K = 100


def _kernel(vp_hbm, prev0_ref, tail0_ref, c_ref, w_ref, h_ref,
            aud_ref, prev_out_ref, tail_out_ref,
            win, carry_prev, carry_tail, sem, *,
            T: int, L: int, H8: int, M: int, A: int, gain: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(vp_hbm.at[pl.ds(0, T + H8), :], win.at[0],
                              sem.at[0]).start()
        carry_prev[:, :] = prev0_ref[:, :]
        carry_tail[:, :] = tail0_ref[:, :]

    @pl.when(i + 1 < n)
    def _():
        pltpu.make_async_copy(vp_hbm.at[pl.ds((i + 1) * T, T + H8), :],
                              win.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(vp_hbm.at[pl.ds(i * T, T + H8), :], win.at[slot],
                          sem.at[slot]).wait()
    cur = win.at[slot]

    acc = c_ref[0][None, :] * cur[0:T, :]
    for s in range(1, L):
        acc = acc + c_ref[s][None, :] * cur[s: s + T, :]
    Y = _mm(acc, w_ref[:, :])
    Aprev = jnp.concatenate([carry_prev[:, :], Y[:-1, :]], axis=0)
    Yr64 = pltpu.roll(Y, M, 1)
    t1 = Aprev * Y
    t2 = Aprev * Yr64
    PR = t1 + pltpu.roll(t1, M, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * M), 1)
    sgn = jnp.where(lane < M, jnp.float32(1.0), jnp.float32(-1.0))
    PI = sgn * (t2 - pltpu.roll(t2, M, 1))
    aud = atan2(PI, PR) * jnp.float32(gain)
    audfull = jnp.concatenate([carry_tail[:, :], aud], axis=0)
    aud_ref[:, :] = _mm(h_ref[:, :], audfull)
    carry_prev[:, :] = Y[T - 1:T, :]
    carry_tail[:, :] = aud[T - (A - 1):, :]

    @pl.when(i == n - 1)
    def _():
        prev_out_ref[:, :] = Y[T - 1:T, :]
        tail_out_ref[:, :] = aud[T - (A - 1):, :]


def fm_chain_step_dbuf(vr, vi, prev0, tail0, arm_c, ataps, decim, gain,
                       n_out, tile=512):
    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    A = int(np.asarray(ataps).shape[0])
    H8 = _round8(L - 1)
    need_pad = n_out + H8

    def pad(v):
        if int(v.shape[0]) < need_pad:
            return jnp.pad(v, ((0, need_pad - int(v.shape[0])), (0, 0)))
        return v[:need_pad]

    vp = jnp.concatenate([pad(vr), pad(vi)], axis=1)
    c2 = planes_taps(arm_c)
    W2 = planes_dft_matrix(M)
    Haud = audio_toeplitz(ataps, tile, decim)
    kernel = functools.partial(_kernel, T=tile, L=L, H8=H8, M=M, A=A,
                               gain=float(gain))
    grid = (n_out // tile,)
    n_aud = n_out // decim
    aud, prev, tail = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile // decim, 2 * M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A - 1, 2 * M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_aud, 2 * M), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * M), jnp.float32),
            jax.ShapeDtypeStruct((A - 1, 2 * M), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile + H8, 2 * M), jnp.float32),
            pltpu.VMEM((1, 2 * M), jnp.float32),
            pltpu.VMEM((A - 1, 2 * M), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_out * 2 * M * (L + 2 * M) + 2 * n_aud * 2 * M * (A - 1 + tile),
            bytes_accessed=2 * need_pad * M * 4 + n_aud * 2 * M * 4,
            transcendentals=n_out * 2 * M,
        ),
    )(vp, prev0, tail0, jnp.asarray(c2), jnp.asarray(W2), jnp.asarray(Haud))
    return aud[:, :M], prev, tail


def main():
    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M
    rng = np.random.default_rng(0)
    vr = jnp.asarray(rng.standard_normal((n_out + L, M)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((n_out + L, M)).astype(np.float32))
    init = (jnp.zeros((1, 2 * M), jnp.float32),
            jnp.zeros((A - 1, 2 * M), jnp.float32))

    def bench(stepfn, name):
        def step(carry):
            prev, tail = carry
            aud, prev2, tail2 = stepfn(vr, vi, prev, tail, c, ataps,
                                       AUDIO_DECIM, 0.5, n_out)
            return (prev2, tail2), jnp.sum(jnp.abs(aud))

        @jax.jit
        def run(carry):
            return jax.lax.scan(lambda cc, _: step(cc), carry, xs=None, length=K)

        carry, sums = run(init)
        jax.block_until_ready(sums)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            carry, sums = run(carry)
            s = jax.device_get(sums)
            best = min(best, time.perf_counter() - t0)
            assert np.all(np.isfinite(s))
        print(json.dumps({"bench": name, "msps": round(B * K / best / 1e6, 1)}),
              flush=True)
        return s

    s0 = bench(fm_chain_step, "baseline")
    s1 = bench(fm_chain_step_dbuf, "dbuf")
    # correctness: identical checksums (same math, same order)
    print("checksum match:", bool(np.allclose(s0, s1, rtol=1e-6)))


if __name__ == "__main__":
    main()
