"""Pallas kernel: polyphase channelizer arm fold (the PFB front end).

Computes, for the commutator matrix V[i, q] = xfull[i*M + q] (layout
preserved, see ops/pfb.py derivation):

    acc[j, q] = sum_{s=0}^{L-1} c[s, q] * V[j + s, q]

i.e. M independent L-tap FIRs down the columns of V — the bandwidth-bound
heart of the channelizer. The jnp shifted-sum re-reads V up to L times
from HBM when XLA declines to fuse all L slices; this kernel makes the
single-pass structure explicit: each grid step DMAs one overlapping
(T+L-1)-row window into VMEM (manual HBM->VMEM copy — BlockSpec tiling
cannot overlap), multiply-accumulates the L shifts on the VPU, writes one
(T,)-row output tile.

Complex handling: the kernel works on the *interleaved float32 view* of
the complex64 matrix — complex64's memory layout IS [re, im] pairs, so
``bitcast_convert_type`` gives a (need, 2M) f32 array for free, the taps
are duplicated per plane-pair host-side, and for M=64 the lane dimension
is exactly 128 (Mosaic's tiling requirement that sank the planes-first
layout)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interleave_taps(c: np.ndarray) -> np.ndarray:
    """(L, M) real taps -> (L, 2M) taps matching the interleaved view."""
    return np.repeat(np.asarray(c, np.float32), 2, axis=1)


def complex_to_interleaved(V: jax.Array) -> jax.Array:
    """(need, M) complex64 -> (need, 2M) f32 with [re, im] interleaved.
    (lax.bitcast rejects complex; stack+reshape yields the identical
    layout and XLA emits a single interleave pass.)"""
    f = jnp.stack([jnp.real(V), jnp.imag(V)], axis=-1)  # (need, M, 2)
    return f.reshape(V.shape[0], V.shape[1] * 2)


def interleaved_to_complex(A: jax.Array) -> jax.Array:
    """(n, 2M) f32 -> (n, M) complex64."""
    f = A.reshape(A.shape[0], A.shape[1] // 2, 2)
    return jax.lax.complex(f[..., 0], f[..., 1])


def arm_fold_reference(v: jax.Array, c2: jax.Array, n_out: int) -> jax.Array:
    """Pure-jnp twin: v (need, W) f32, c2 (L, W) f32 -> (n_out, W)."""
    L = c2.shape[0]
    acc = jnp.zeros((n_out, v.shape[1]), jnp.float32)
    for s in range(L):
        acc = acc + c2[s][None, :] * jax.lax.dynamic_slice_in_dim(v, s, n_out, 0)
    return acc


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _kernel(v_hbm, c_ref, out_ref, scratch, sem, *, T: int, L: int, H8: int):
    # Window rows [i*T, i*T + T + H8) of the padded input: tile + 8-aligned
    # halo in one DMA (window row count and start offset both 8-aligned,
    # which hardware DMA requires to be efficient/safe for f32 tiles).
    # Double-buffered: tile i+1's copy is in flight while tile i computes.
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(v_hbm.at[pl.ds(0, T + H8), :], scratch.at[0],
                              sem.at[0]).start()

    @pl.when(i + 1 < n)
    def _():
        pltpu.make_async_copy(v_hbm.at[pl.ds((i + 1) * T, T + H8), :],
                              scratch.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(v_hbm.at[pl.ds(i * T, T + H8), :], scratch.at[slot],
                          sem.at[slot]).wait()
    cur = scratch.at[slot]
    acc = c_ref[0][None, :] * cur[0:T, :]
    for s in range(1, L):
        acc = acc + c_ref[s][None, :] * cur[s : s + T, :]
    out_ref[:, :] = acc


def arm_fold(v: jax.Array, c2: np.ndarray, n_out: int, tile: int = 512,
             interpret: bool = False) -> jax.Array:
    """Pallas arm fold on the interleaved view.

    v: (need, W) f32, need >= n_out + L - 1, W a multiple of 128 (use
    M >= 64 channels, or pad); c2: (L, W) static taps (interleave_taps);
    returns (n_out, W) f32. The tile is auto-shrunk to a divisor of n_out.
    """
    L, W = int(c2.shape[0]), int(c2.shape[1])
    if n_out % tile != 0:
        if n_out <= tile:
            tile = n_out
        else:
            # largest divisor of n_out that is <= tile (grid must cover n_out
            # exactly)
            tile = next(t for t in range(tile, 0, -1) if n_out % t == 0)
    if not interpret and W % 128 != 0:
        raise ValueError(f"lane width {W} must be a multiple of 128 on TPU")
    H8 = _round8(L - 1)  # 8-aligned halo row count
    need_pad = n_out + H8
    if int(v.shape[0]) < need_pad:
        v = jnp.pad(v, ((0, need_pad - int(v.shape[0])), (0, 0)))
    elif int(v.shape[0]) > need_pad:
        v = v[:need_pad]
    grid = (n_out // tile,)
    kernel = functools.partial(_kernel, T=tile, L=L, H8=H8)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps resident in VMEM
        ],
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + H8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_out * W * L,
            bytes_accessed=(n_out + H8) * W * 4 + n_out * W * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(v, jnp.asarray(c2, jnp.float32))


def pfb_arm_fold_complex(V: jax.Array, c: np.ndarray, n_out: int,
                         tile: int = 512, interpret: bool = False) -> jax.Array:
    """Full complex wrapper used by ops/pfb.py: V (need, M) complex64,
    c (L, M) real arm coefficients -> acc (n_out, M) complex64."""
    vf = complex_to_interleaved(V)
    accf = arm_fold(vf, interleave_taps(c), n_out, tile=tile, interpret=interpret)
    return interleaved_to_complex(accf)


# ---------------------------------------------------------------------------
# Fused fold + DFT: the whole channelizer front end in one pass.


def interleaved_dft_matrix(M: int) -> np.ndarray:
    """Real (2M, 2M) matrix computing the complex combine
    y[:, k] = e^{-j2pi k/M} * DFT_q(acc)[:, k] directly on the
    interleaved [re, im] layout: one real matmul replaces four plane
    matmuls and the de/re-interleave relayouts.

    For y = a @ W (complex): yr = ar@Wr - ai@Wi, yi = ar@Wi + ai@Wr, so
    W2[2q, 2k] = Wr[q, k], W2[2q+1, 2k] = -Wi[q, k],
    W2[2q, 2k+1] = Wi[q, k], W2[2q+1, 2k+1] = Wr[q, k].
    """
    k = np.arange(M)
    W = np.exp(-2j * np.pi * np.outer(k, k) / M) * np.exp(-2j * np.pi * k / M)[None, :]
    W2 = np.zeros((2 * M, 2 * M), dtype=np.float32)
    W2[0::2, 0::2] = W.real
    W2[1::2, 0::2] = -W.imag
    W2[0::2, 1::2] = W.imag
    W2[1::2, 1::2] = W.real
    return W2


def _fused_kernel(v_hbm, c_ref, w_ref, out_ref, scratch, sem, *, T: int, L: int,
                  H8: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(v_hbm.at[pl.ds(0, T + H8), :], scratch.at[0],
                              sem.at[0]).start()

    @pl.when(i + 1 < n)
    def _():
        pltpu.make_async_copy(v_hbm.at[pl.ds((i + 1) * T, T + H8), :],
                              scratch.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(v_hbm.at[pl.ds(i * T, T + H8), :], scratch.at[slot],
                          sem.at[slot]).wait()
    cur = scratch.at[slot]
    acc = c_ref[0][None, :] * cur[0:T, :]
    for s in range(1, L):
        acc = acc + c_ref[s][None, :] * cur[s : s + T, :]
    # HIGHEST: the default bf16 MXU passes leave the 64-point DFT at
    # ~22 dB SNR (measured — far below the 60 dB gate)
    out_ref[:, :] = jax.lax.dot_general(
        acc, w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def arm_fold_dft(v: jax.Array, c2: np.ndarray, w2: np.ndarray, n_out: int,
                 tile: int = 512, interpret: bool = False) -> jax.Array:
    """Fold + interleaved DFT in one kernel: v (>=n_out+L-1, 2M) f32
    interleaved, c2 (L, 2M) from interleave_taps, w2 (2M, 2M) from
    interleaved_dft_matrix -> Y interleaved (n_out, 2M) f32.

    One HBM read of the window, fold on the VPU, one MXU matmul, one HBM
    write — the acc round trip of the two-step path disappears.
    """
    L, W = int(c2.shape[0]), int(c2.shape[1])
    if w2.shape != (W, W):
        raise ValueError(f"w2 shape {w2.shape} != ({W}, {W})")
    if n_out % tile != 0:
        if n_out <= tile:
            tile = n_out
        else:
            tile = next(t for t in range(tile, 0, -1) if n_out % t == 0)
    if not interpret and W % 128 != 0:
        raise ValueError(f"lane width {W} must be a multiple of 128 on TPU")
    H8 = _round8(L - 1)
    need_pad = n_out + H8
    if int(v.shape[0]) < need_pad:
        v = jnp.pad(v, ((0, need_pad - int(v.shape[0])), (0, 0)))
    elif int(v.shape[0]) > need_pad:
        v = v[:need_pad]
    kernel = functools.partial(_fused_kernel, T=tile, L=L, H8=H8)
    return pl.pallas_call(
        kernel,
        grid=(n_out // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # window source in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fold taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # DFT matrix
        ],
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + H8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_out * W * L + 2 * n_out * W * W,
            bytes_accessed=(n_out + H8) * W * 4 + n_out * W * 4 + W * W * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(v, jnp.asarray(c2, jnp.float32), jnp.asarray(w2, jnp.float32))


def pfb_channelize_fused(V: jax.Array, c: np.ndarray, n_out: int,
                         tile: int = 512, interpret: bool = False) -> jax.Array:
    """V (need, M) complex64, c (L, M) arm coefficients -> Y (n_out, M)
    complex64 — the full channelizer front end (fold + phase combine) as
    one fused kernel."""
    M = int(V.shape[1])
    vf = complex_to_interleaved(V)
    yf = arm_fold_dft(vf, interleave_taps(c), interleaved_dft_matrix(M), n_out,
                      tile=tile, interpret=interpret)
    return interleaved_to_complex(yf)
