"""EXPERIMENT: ablate mega-kernel stages to locate the time.

NOTE: the kernel body below is a COPY of ops/pallas/fm_chain.py's
fm_chain_step taken at commit c639509 (dbuf DMA version), with variant
switches spliced in. If the shipped kernel changes, re-sync this copy
before trusting the ablation numbers.

Variants (all keep the same DMA + output structure, dbuf DMA):
  full       — the real pipeline
  no_atan2   — demod's atan2 replaced by PR + PI (keeps mults/rolls)
  no_dft     — skip the (T,128)@(128,128) DFT matmul (Y = acc)
  no_fold    — fold replaced by a single window slice (1 FMA instead of L)
  no_audio   — skip the audio Toeplitz matmul (writes raw aud rows)
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
            T, L, H8, M, A, gain, variant):
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

    if variant == "dma_only":
        aud_ref[:, :] = cur[0:T // AUDIO_DECIM, :]
        carry_prev[:, :] = cur[0:1, :]
        carry_tail[:, :] = cur[0:A - 1, :]

        @pl.when(i == n - 1)
        def _():
            prev_out_ref[:, :] = carry_prev[:, :]
            tail_out_ref[:, :] = carry_tail[:, :]
        return
    if variant == "no_fold":
        acc = c_ref[0][None, :] * cur[0:T, :]
    else:
        acc = c_ref[0][None, :] * cur[0:T, :]
        for s in range(1, L):
            acc = acc + c_ref[s][None, :] * cur[s: s + T, :]
    if variant == "no_dft":
        Y = acc
    else:
        Y = _mm(acc, w_ref[:, :])
    if variant == "no_demod":
        aud = Y * jnp.float32(gain)
    else:
        Aprev = jnp.concatenate([carry_prev[:, :], Y[:-1, :]], axis=0)
        Yr64 = pltpu.roll(Y, M, 1)
        t1 = Aprev * Y
        t2 = Aprev * Yr64
        PR = t1 + pltpu.roll(t1, M, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * M), 1)
        sgn = jnp.where(lane < M, jnp.float32(1.0), jnp.float32(-1.0))
        PI = sgn * (t2 - pltpu.roll(t2, M, 1))
        if variant == "no_atan2":
            aud = (PR + PI) * jnp.float32(gain)
        else:
            aud = atan2(PI, PR) * jnp.float32(gain)
    if variant == "no_audio":
        aud_ref[:, :] = aud.reshape(T // AUDIO_DECIM, AUDIO_DECIM, 2 * M)[:, 0, :]
    else:
        audfull = jnp.concatenate([carry_tail[:, :], aud], axis=0)
        aud_ref[:, :] = _mm(h_ref[:, :], audfull)
    carry_prev[:, :] = Y[T - 1:T, :]
    carry_tail[:, :] = aud[T - (A - 1):, :]

    @pl.when(i == n - 1)
    def _():
        prev_out_ref[:, :] = Y[T - 1:T, :]
        tail_out_ref[:, :] = aud[T - (A - 1):, :]


def make_step(variant, tile=512):
    H8 = _round8(L - 1)

    def stepfn(vp, prev0, tail0, c2, W2, Haud, n_out):
        kernel = functools.partial(_kernel, T=tile, L=L, H8=H8, M=M, A=A,
                                   gain=0.5, variant=variant)
        grid = (n_out // tile,)
        n_aud = n_out // AUDIO_DECIM
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(
                pl.BlockSpec((tile // AUDIO_DECIM, 2 * M), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
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
        )(vp, prev0, tail0, c2, W2, Haud)

    return stepfn


def main():
    from newsched_tpu.ops import firdes, pfb as pfb_ops

    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M
    H8 = _round8(L - 1)
    rng = np.random.default_rng(0)
    vp = jnp.asarray(rng.standard_normal((n_out + H8, 2 * M)).astype(np.float32))
    c2 = jnp.asarray(planes_taps(c))
    W2 = jnp.asarray(planes_dft_matrix(M))
    tile = 512
    Haud = jnp.asarray(audio_toeplitz(ataps, tile, AUDIO_DECIM))
    init = (jnp.zeros((1, 2 * M), jnp.float32),
            jnp.zeros((A - 1, 2 * M), jnp.float32))

    for variant in ["full", "no_atan2", "no_dft", "no_fold", "no_audio",
                    "no_demod", "dma_only"]:
        stepfn = make_step(variant, tile)

        @jax.jit
        def run(carry):
            def body(cc, _):
                prev, tail = cc
                aud, p2, t2 = stepfn(vp, prev, tail, c2, W2, Haud, n_out)
                return (p2, t2), jnp.sum(jnp.abs(aud))
            return jax.lax.scan(body, carry, xs=None, length=K)

        carry, sums = run(init)
        jax.block_until_ready(sums)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            carry, sums = run(carry)
            s = jax.device_get(sums)
            best = min(best, time.perf_counter() - t0)
        us_per_tile = best / K / (n_out // tile) * 1e6
        print(json.dumps({"variant": variant,
                          "msps": round(B * K / best / 1e6, 1),
                          "us_per_tile": round(us_per_tile, 3)}), flush=True)


if __name__ == "__main__":
    main()
