"""Pallas signal sources: the fixed-point NCO tone generator on-chip.

XLA's f32 sincos put the round-3 sig_source at ~129 us per 2^21-sample
batch — 3x the cost of the config-0 FIR it feeds (BASELINE.md config-0
ledger). This kernel evaluates the same fxpt-NCO phase (uint32
accumulator, exact mod 2^32 — int32 wraparound multiply IS the modular
arithmetic) with quarter-wave polynomial sincos
(ops/pallas/mathfns.sin_cos_turns, ~3e-7 abs — the f32 class XLA's
sincos lives in) on the VPU.

Sample order is row-major over (n/128, 128) f32 planes: sample k lives at
[k // 128, k % 128], so ``out.reshape(-1)`` is free (no relayout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsched_tpu.ops.pallas.mathfns import sin_cos_turns

_T2 = 1.0 / (1 << 32)  # turns per phase LSB


def _nco_kernel(ph_ref, dp_ref, amp_ref, re_ref, im_ref, *, T: int):
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    idx = (jnp.int32(i) * jnp.int32(T) + row) * jnp.int32(128) + lane
    # uint32 phase accumulator via int32 two's-complement wraparound
    phase = ph_ref[0] + idx * dp_ref[0]
    t = phase.astype(jnp.float32) * jnp.float32(_T2)  # turns in [-0.5, 0.5)
    s, c = sin_cos_turns(t)
    a = amp_ref[0]
    re_ref[:, :] = c * a
    im_ref[:, :] = s * a


@functools.partial(jax.jit, static_argnames=("n", "tile", "interpret"))
def nco_planes(phase0, dphase, amp, *, n: int, tile: int = 512,
               interpret: bool = False):
    """(re, im) planes, each (n/128, 128) f32 row-major, of
    amp * exp(j * 2*pi * acc(k)/2^32) with acc(k) = phase0 + k*dphase
    (uint32 wraparound) — the exact fxpt convention of ops/nco.py,
    evaluated on-chip. n must be a multiple of 1024 (8 rows x 128)."""
    if n % 1024:
        raise ValueError(f"n {n} must be a multiple of 1024")
    n_rows = n // 128
    tile = min(tile, n_rows)
    while n_rows % tile:
        tile -= 8
    kernel = functools.partial(_nco_kernel, T=tile)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.BlockSpec((tile, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // tile,),
        in_specs=[smem, smem, smem],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 128), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=40 * n, bytes_accessed=2 * n * 4, transcendentals=2 * n),
        interpret=interpret,
    )(jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(phase0, jnp.uint32), (1,)), jnp.int32),
      jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(dphase, jnp.uint32), (1,)), jnp.int32),
      jnp.reshape(jnp.asarray(amp, jnp.float32), (1,)))


def _nco_folded_kernel(ph_ref, dp_ref, amp_ref, out_ref, *, T: int, R: int):
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    seg = lane & jnp.int32(63)
    # time-folded-lanes sample index: segment s covers samples [s*R, (s+1)*R)
    idx = seg * jnp.int32(R) + jnp.int32(i) * jnp.int32(T) + row
    phase = ph_ref[0] + idx * dp_ref[0]
    t = phase.astype(jnp.float32) * jnp.float32(_T2)
    s, c = sin_cos_turns(t)
    out_ref[:, :] = jnp.where(lane < jnp.int32(64), c, s) * amp_ref[0]


@functools.partial(jax.jit, static_argnames=("R", "tile", "interpret"))
def nco_folded(phase0, dphase, amp, *, R: int, tile: int = 512,
               interpret: bool = False):
    """(R, 128) f32 TIME-FOLDED-LANES planes (ops/pallas/wbfm_chain.py
    layout: lane s = re(segment s), lane 64+s = im) of one batch of
    64*R samples of amp * exp(j*2*pi*acc(k)/2^32) — the zero-conversion
    live source for the fused wbfm chain: no complex assembly, no fold
    transpose. R must be a multiple of 8."""
    if R % 8:
        raise ValueError(f"R {R} must be a multiple of 8")
    tile = min(tile, R)
    while R % tile:
        tile -= 8
    kernel = functools.partial(_nco_folded_kernel, T=tile, R=R)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // tile,),
        in_specs=[smem, smem, smem],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=40 * R * 128, bytes_accessed=R * 128 * 4,
            transcendentals=R * 128),
        interpret=interpret,
    )(jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(phase0, jnp.uint32), (1,)), jnp.int32),
      jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(dphase, jnp.uint32), (1,)), jnp.int32),
      jnp.reshape(jnp.asarray(amp, jnp.float32), (1,)))
