"""TPU-resident Gaussian noise generation (Pallas, hardware PRNG).

The round-3 flagship benchmark replayed precomputed planes rows because the
only live producer paid `jax.random.normal` (threefry2x32 in XLA: ~10 int
ops/word for the bits, then an erfinv-based normal transform) per batch —
2.5x slower end-to-end than the replay (BASELINE.md live-residual ledger).
This module is the cheap on-device generator the reference's ~free
`noise_source` corresponds to (SURVEY.md §3.4 analog noise_source row):
the TPU's per-core hardware PRNG (`pltpu.prng_random_bits`, ~1 op/word)
plus an Irwin-Hall normal transform on the VPU.

Determinism contract (what makes this a STREAM source and lets the fused
chain regenerate its own halo): rows are generated in 64-row GROUPS, and a
group's bits depend only on ``(seed, absolute_group_index)`` — each group
re-seeds the hardware PRNG with a murmur3-style mix of the two. 64 rows
is a measured optimum: per-group seeding serializes the PRNG engine, and
8-row groups cost 111 us/batch vs 40 us at 64 and 33.8 at 512 on the
flagship batch (bench/exp_noise.py probe, 2026-08-21); 64 keeps the fused
kernel's halo regeneration to one group (+12.5% of gen) per tile. Any kernel
that knows the absolute stream position can therefore (re)produce any row
span, tile boundaries and batch sizes notwithstanding (batches must be
multiples of 64 rows). The same convention is used by the standalone source
kernel here and by the gen-mode mega-kernel (fm_chain.py), so a graph's
noise_planes_source and the fused source block emit bit-identical streams.

Normal transform: sum of 6 uint16 halves from 3 random words per element
(Irwin-Hall N=6): zero-mean, unit-variance after scaling, support
±4.24 sigma, excess kurtosis -0.2. Chosen over Box-Muller because Mosaic
has no sin/cos lowering and log costs more than the three extra draws;
over erfinv for the same VPU-budget reason the demod's atan2 is a
polynomial. The truncated tail (P(|x|>4.24 sigma) ~ 2e-5 for a true
Gaussian) is documented, measured in tests, and irrelevant to the DSP
gates (which compare chain-vs-golden on the SAME input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_ROWS = 64  # seeding granularity (measured optimum; see above)


def _ih_const(draws: int):
    """Irwin-Hall N=2*draws over uint16 halves: mean N*(2^16-1)/2,
    var N*(2^32-1)/12. draws=3 (N=6) is the default stream; draws=2
    (N=4) is the cheaper option (1 fewer hw-PRNG draw + 2 fewer adds per
    element): support +-3.46 sigma, excess kurtosis -0.3 vs N=6's
    +-4.24 sigma / -0.2 — a DIFFERENT stream (draws is part of the
    stream identity with seed and position)."""
    n = 2 * draws
    return n * 65535.0 / 2.0, float(np.sqrt(n * (65536.0 ** 2 - 1) / 12.0))


def _mix32(x):
    """murmur3 finalizer on int32 (Mosaic scalar ops) — decorrelates the
    (seed, group) pair before it reaches the hardware PRNG's seed state,
    so adjacent groups never hand the engine near-identical seeds."""
    x = x ^ (jax.lax.shift_right_logical(x, 16))
    x = x * jnp.int32(-2048144789)  # 0x85EBCA6B
    x = x ^ (jax.lax.shift_right_logical(x, 13))
    x = x * jnp.int32(-1028477387)  # 0xC2B2AE35
    x = x ^ (jax.lax.shift_right_logical(x, 16))
    return x


def _group_normal(seed, ghi, glo, width, draws: int = 3):
    """(GROUP_ROWS, width) f32 standard-normal block for absolute group
    (ghi, glo) — `draws` hardware-PRNG draws + Irwin-Hall sum of
    2*draws halves (see _ih_const)."""
    mean, std = _ih_const(draws)
    pltpu.prng_seed(_mix32(glo ^ jnp.int32(-1640531527) * seed),
                    _mix32(ghi + jnp.int32(374761393) * seed))
    shape = (GROUP_ROWS, width)
    s = jnp.zeros(shape, jnp.uint32)
    for _ in range(draws):
        b = pltpu.prng_random_bits(shape)
        b = pltpu.bitcast(b, jnp.uint32)
        s = s + (b & jnp.uint32(0xFFFF)) \
            + jax.lax.shift_right_logical(b, jnp.uint32(16))
    # S < N*2^16 << 2^31: bitcast to int32 for the f32 convert (Mosaic has
    # no uint32->f32 cast).
    return (pltpu.bitcast(s, jnp.int32).astype(jnp.float32)
            - jnp.float32(mean)) * jnp.float32(1.0 / std)


def add_groups_signed(hi, lo, off):
    """64-bit group-counter add of a SIGNED int32 offset (two int32 halves,
    two's-complement semantics): the sharded gen paths step backwards from
    a shard's base group to its warm-up/halo region, which may cross zero
    on the first batch (hi goes negative — the pre-stream region)."""
    off = jnp.int32(off)
    off_hi = jax.lax.shift_right_arithmetic(off, 31)  # sign-extend
    lo2 = lo + off
    # carry out of the unsigned 32-bit add: result < addend (unsigned)
    carry = ((lo2 ^ jnp.int32(-0x80000000)) < (lo ^ jnp.int32(-0x80000000))
             ).astype(jnp.int32)
    return hi + off_hi + carry, lo2


def gen_rows(seed, g0_hi, g0_lo, n_rows: int, width: int, *, row_off: int = 0,
             mask_pre: bool = False, draws: int = 3):
    """In-kernel helper: (n_rows, width) f32 standard-normal rows starting
    at group offset ``row_off // GROUP_ROWS`` past absolute group
    (g0_hi, g0_lo). n_rows and row_off must be multiples of GROUP_ROWS;
    callers embed this inside their own pallas kernels (the gen-mode
    mega-kernel regenerates halo rows this way).

    mask_pre=True zeroes any group whose 64-bit index is negative (hi < 0
    signed) — the pre-stream region a sharded warm-up may reach back into
    on the first batch; row 0 of the stream is group 0, so the pre-stream
    boundary is always group-aligned and whole-group masking is exact."""
    assert n_rows % GROUP_ROWS == 0 and row_off % GROUP_ROWS == 0
    blocks = []
    for g in range(n_rows // GROUP_ROWS):
        off = jnp.int32(row_off // GROUP_ROWS + g)
        glo = g0_lo + off  # uint32 wraparound add (int32 two's complement)
        # carry into hi when lo wrapped: unsigned compare via xor-minint
        wrapped = (glo ^ jnp.int32(-0x80000000)) < (g0_lo ^ jnp.int32(-0x80000000))
        ghi = g0_hi + wrapped.astype(jnp.int32)
        blk = _group_normal(seed, ghi, glo, width, draws=draws)
        if mask_pre:
            blk = jnp.where(ghi < 0, jnp.float32(0.0), blk)
        blocks.append(blk)
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)


def pure_rows(seed: int, g0_hi, g0_lo, n_rows: int, width: int, *,
              mask_pre: bool = False):
    """Portable position-pure twin of ``gaussian_rows``: group g's rows are
    ``normal(fold_in(fold_in(key(seed), g_lo), g_hi))`` — the SAME
    ``(seed, absolute group)`` determinism contract as the hardware-PRNG
    stream, but a DIFFERENT bit stream (threefry+erfinv vs hw-PRNG+
    Irwin-Hall). Pure XLA: runs on any backend and partitions cleanly
    under SPMD, so it is the CPU/sim-mesh stand-in for the gen-fused
    sharded paths (each device regenerates its own halo exactly, the same
    way the hardware kernel does on a TPU).
    """
    if n_rows % GROUP_ROWS:
        raise ValueError(f"n_rows {n_rows} not a multiple of {GROUP_ROWS}")
    key = jax.random.PRNGKey(int(seed))
    offs = jnp.arange(n_rows // GROUP_ROWS, dtype=jnp.int32)
    glo = g0_lo.astype(jnp.int32) + offs
    wrapped = ((glo ^ jnp.int32(-0x80000000))
               < (g0_lo.astype(jnp.int32) ^ jnp.int32(-0x80000000)))
    ghi = g0_hi.astype(jnp.int32) + wrapped.astype(jnp.int32)

    def one(hi, lo):
        k = jax.random.fold_in(jax.random.fold_in(key, lo.astype(jnp.uint32)),
                               hi.astype(jnp.uint32))
        r = jax.random.normal(k, (GROUP_ROWS, width), jnp.float32)
        return jnp.where(hi < 0, jnp.float32(0.0), r) if mask_pre else r

    return jax.vmap(one)(ghi, glo).reshape(n_rows, width)


def _noise_kernel(hi_ref, lo_ref, out_ref, *, T: int, width: int, seed: int,
                  draws: int = 3):
    i = pl.program_id(0)
    # per-tile base group = stream base + i * (T // GROUP_ROWS)
    base = jnp.int32(i) * jnp.int32(T // GROUP_ROWS)
    lo = lo_ref[0]
    glo = lo + base
    wrapped = (glo ^ jnp.int32(-0x80000000)) < (lo ^ jnp.int32(-0x80000000))
    ghi = hi_ref[0] + wrapped.astype(jnp.int32)
    out_ref[:, :] = gen_rows(jnp.int32(seed), ghi, glo, T, width, draws=draws)


@functools.partial(jax.jit, static_argnames=("n_rows", "width", "seed",
                                             "tile", "interpret", "draws"))
def gaussian_rows(g0_hi, g0_lo, *, n_rows: int, width: int, seed: int,
                  tile: int = 512, interpret: bool = False, draws: int = 3):
    """(n_rows, width) f32 standard-normal rows for the absolute row span
    starting at group G = (g0_hi, g0_lo) — the GROUP_ROWS-row group index
    as two int32 halves (a 64-bit stream position; int32 alone overflows
    in minutes at flagship rates).

    The standalone producer behind ``blocks.vector_dsp
    .noise_planes_source(method="pallas")``; scale by amplitude outside
    (XLA fuses the multiply into the consumer).
    """
    if n_rows % GROUP_ROWS:
        raise ValueError(f"n_rows {n_rows} not a multiple of {GROUP_ROWS}")
    if width % 128 and not interpret:
        raise ValueError(f"width {width} must be a multiple of 128 lanes")
    tile = min(tile, n_rows)
    while n_rows % tile:
        tile -= GROUP_ROWS
    kernel = functools.partial(_noise_kernel, T=tile, width=width, seed=seed,
                               draws=draws)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, width), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * n_rows * width,
            bytes_accessed=n_rows * width * 4,
            transcendentals=0),
        interpret=interpret,
    )(g0_hi.reshape(1).astype(jnp.int32), g0_lo.reshape(1).astype(jnp.int32))


def advance_groups(hi, lo, n_groups: int):
    """64-bit group-counter advance as two int32 halves (uint32 wraparound
    semantics) — the source block's per-batch state update."""
    glo = lo + jnp.int32(n_groups)
    wrapped = (glo ^ jnp.int32(-0x80000000)) < (lo ^ jnp.int32(-0x80000000))
    return hi + wrapped.astype(jnp.int32), glo
