"""The FM channelizer chain as ONE Pallas kernel.

Fuses the entire per-device pipeline of the flagship model (BASELINE
config #2/#4: M-channel PFB -> per-channel quadrature demod -> per-channel
decimating audio FIR) into a single pass over the input:

    DMA window -> arm fold (VPU) -> DFT matmul (MXU)
                -> demod (VPU, polynomial atan2 — Mosaic has no atan2)
                -> audio FIR as a Toeplitz matmul (MXU) -> tiny output

The two-stage XLA path writes/reads Y (16 MB) and aud (8 MB) between
stages; this kernel's only HBM traffic is the input window read and a
(B/M/decim, 2M) output write — an ~4x traffic reduction at M=64/decim=8.

Layout: separate re/im *planes* side by side in the lane dimension
([re(M) | im(M)] = 2M = 128 lanes for M=64) — the natural form of the
framework's ComplexParts boundary encoding, no interleave pass needed.
Complex arithmetic pairs lane c with lane c+M via a 64-lane roll:

    fold:   per-lane real taps, duplicated per half
    DFT:    Y = acc @ [[Wr, Wi], [-Wi, Wr]]     (one real MXU matmul)
    demod:  A = rows shifted down one (prev batch row carried between
            tiles in scratch — the TPU grid is sequential);
            t1 = A*Y;  PR = t1 + roll64(t1)          (= ar*br + ai*bi)
            t2 = A*roll64(Y); PI = s*(t2 - roll64(t2)) (= ar*bi - ai*br)
            aud = atan2(PI, PR) * gain   (duplicated in both halves)
    audio:  y = H_aud @ [tail; aud]   (64 x (T+A-1) Toeplitz, stride=decim)

Streaming state (demod prev row, audio FIR tail) is carried across grid
tiles in VMEM scratch and emitted as outputs for the next batch, so the
kernel is batch-split exact like every other kernel in ops/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsched_tpu.ops.pallas.channelizer import _round8
from newsched_tpu.ops.pallas.mathfns import atan2


def planes_taps(c: np.ndarray) -> np.ndarray:
    """(L, M) arm-fold coefficients -> (L, 2M) for the planes layout."""
    c = np.asarray(c, np.float32)
    return np.concatenate([c, c], axis=1)


def planes_dft_matrix(M: int) -> np.ndarray:
    """(2M, 2M) real matrix computing the channelizer phase combine on the
    planes layout: [ar | ai] @ [[Wr, Wi], [-Wi, Wr]] = [yr | yi]."""
    k = np.arange(M)
    W = np.exp(-2j * np.pi * np.outer(k, k) / M) * np.exp(-2j * np.pi * k / M)[None, :]
    Wr, Wi = W.real.astype(np.float32), W.imag.astype(np.float32)
    top = np.concatenate([Wr, Wi], axis=1)
    bot = np.concatenate([-Wi, Wr], axis=1)
    return np.concatenate([top, bot], axis=0)


def audio_toeplitz(ataps: np.ndarray, tile: int, decim: int) -> np.ndarray:
    """(tile//decim, A-1+tile) matrix H with H[o, s] = ataps[A-1 + o*decim - s]
    (zero outside [0, A)): y[o] = sum_s H[o, s] * [tail; aud][s] is the
    streaming decimating FIR for one tile with an (A-1)-row tail."""
    t = np.asarray(ataps, np.float32)
    A = t.shape[0]
    n_o = tile // decim
    H = np.zeros((n_o, A - 1 + tile), np.float32)
    for o in range(n_o):
        base = A - 1 + o * decim
        for tt in range(A):
            H[o, base - tt] = t[tt]
    return H


def _mm(a, b, precision=jax.lax.Precision.HIGHEST):
    """Matmul with selectable accuracy/speed trade.

    Mosaic lowers only HIGHEST (6 bf16 MXU passes) and DEFAULT (1 pass);
    "split3" is a manual 3-pass HIGH equivalent: split both operands into
    bf16 hi + bf16 lo residual and drop the lo@lo term (~2^-16 relative
    error — ~96 dB, vs ~50 dB for 1-pass bf16 and ~140 dB for HIGHEST).
    """
    if precision == "split3":
        ahi = a.astype(jnp.bfloat16)
        alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
        bhi = b.astype(jnp.bfloat16)
        blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(p, q):
            return jax.lax.dot_general(
                p, q, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        return d(ahi, bhi) + (d(ahi, blo) + d(alo, bhi))
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _kernel(vp_hbm, prev0_ref, tail0_ref, c_ref, w_ref, h_ref,
            aud_ref, prev_out_ref, tail_out_ref,
            win, carry_prev, carry_tail, sem, *,
            T: int, L: int, H8: int, M: int, A: int, gain: float,
            precision=jax.lax.Precision.HIGHEST):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # Double-buffered window DMA: tile i+1's copy is in flight while tile i
    # computes (+13% measured). One full-width (128-lane) DMA per tile:
    # narrower HBM->VMEM copies (e.g. per 64-lane plane) crash the Mosaic
    # compiler — measured, hence the XLA-side lane concat in the wrapper.
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

    # arm fold
    acc = c_ref[0][None, :] * cur[0:T, :]
    for s in range(1, L):
        acc = acc + c_ref[s][None, :] * cur[s: s + T, :]
    # phase combine (one real matmul on the planes layout)
    Y = _mm(acc, w_ref[:, :], precision)            # (T, 2M)
    # quadrature demod against the previous row
    Aprev = jnp.concatenate([carry_prev[:, :], Y[:-1, :]], axis=0)
    Yr64 = pltpu.roll(Y, M, 1)
    t1 = Aprev * Y
    t2 = Aprev * Yr64
    PR = t1 + pltpu.roll(t1, M, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * M), 1)
    sgn = jnp.where(lane < M, jnp.float32(1.0), jnp.float32(-1.0))
    PI = sgn * (t2 - pltpu.roll(t2, M, 1))
    aud = atan2(PI, PR) * jnp.float32(gain)          # (T, 2M) dup halves
    # audio FIR + decimation (Toeplitz matmul over [tail; aud])
    audfull = jnp.concatenate([carry_tail[:, :], aud], axis=0)  # (A-1+T, 2M)
    aud_ref[:, :] = _mm(h_ref[:, :], audfull, precision)  # (T//decim, 2M)
    # carry + final-state outputs
    carry_prev[:, :] = Y[T - 1:T, :]
    carry_tail[:, :] = aud[T - (A - 1):, :]

    @pl.when(i == n - 1)
    def _():
        prev_out_ref[:, :] = Y[T - 1:T, :]
        tail_out_ref[:, :] = aud[T - (A - 1):, :]


def fm_chain_step(vr: jax.Array, vi: jax.Array, prev0: jax.Array,
                  tail0: jax.Array, arm_c: np.ndarray, ataps: np.ndarray,
                  decim: int, gain: float, n_out: int, tile: int = 512,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST):
    """Run one batch of the fused chain.

    Args:
      vr/vi: (>= n_out + L - 1, M) f32 re/im planes of the commutator
        matrix V (ops/pfb.py layout) including the M*L-1-sample halo.
      prev0: (1, 2M) previous channel row [re | im] (zero on first batch).
      tail0: (A-1, 2M) audio FIR tail rows, channel values duplicated in
        both halves (zeros on first batch).
      arm_c: (L, M) fold coefficients (ops/pfb.py `c`).
      ataps: (A,) audio FIR taps; decim: audio decimation; gain: demod gain.
      n_out: channel-rate samples this batch (B // M).

    Returns (audio (n_out//decim, M) f32, prev (1, 2M), tail (A-1, 2M)).
    """
    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    A = int(np.asarray(ataps).shape[0])
    if n_out % tile != 0:
        if n_out <= tile:
            tile = n_out
        else:
            tile = next(t for t in range(tile, 0, -1) if n_out % t == 0)
    if tile % decim != 0:
        raise ValueError(f"tile {tile} not divisible by audio decim {decim}")
    if not interpret and (2 * M) % 128 != 0:
        raise ValueError(f"planes width {2*M} must be a multiple of 128")
    if A - 1 > tile:
        raise ValueError(f"audio tail {A-1} exceeds tile {tile}")
    H8 = _round8(L - 1)
    need_pad = n_out + H8

    def pad(v):
        if int(v.shape[0]) < need_pad:
            return jnp.pad(v, ((0, need_pad - int(v.shape[0])), (0, 0)))
        return v[:need_pad]

    vp = jnp.concatenate([pad(vr), pad(vi)], axis=1)  # (need_pad, 2M) planes
    c2 = planes_taps(arm_c)
    W2 = planes_dft_matrix(M)
    Haud = audio_toeplitz(ataps, tile, decim)
    kernel = functools.partial(_kernel, T=tile, L=L, H8=H8, M=M, A=A,
                               gain=float(gain), precision=precision)
    grid = (n_out // tile,)
    n_aud = n_out // decim
    aud, prev, tail = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # vp planes (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # prev0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tail0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fold taps
            pl.BlockSpec(memory_space=pltpu.VMEM),   # DFT matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),   # audio Toeplitz
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
            pltpu.VMEM((2, tile + H8, 2 * M), jnp.float32),  # 2x DMA window
            pltpu.VMEM((1, 2 * M), jnp.float32),           # demod prev carry
            pltpu.VMEM((A - 1, 2 * M), jnp.float32),       # audio tail carry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_out * 2 * M * (L + 2 * M) + 2 * n_aud * 2 * M * (A - 1 + tile),
            bytes_accessed=2 * need_pad * M * 4 + n_aud * 2 * M * 4,
            transcendentals=n_out * 2 * M,  # atan2 polynomial
        ),
        interpret=interpret,
    )(vp, prev0, tail0, jnp.asarray(c2), jnp.asarray(W2), jnp.asarray(Haud))
    return aud[:, :M], prev, tail
