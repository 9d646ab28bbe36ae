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
([re(M) | im(M)] = 2M = 128 lanes for M=64). Complex arithmetic pairs
lane c with lane c+M via a 64-lane roll:

    fold:   per-lane real taps, duplicated per half
    DFT:    Y = acc @ [[Wr, Wi], [-Wi, Wr]]     (one real MXU matmul)
    demod:  A = rows shifted down one (prev batch row carried between
            tiles in scratch — the TPU grid is sequential);
            t1 = A*Y;  PR = t1 + roll64(t1)          (= ar*br + ai*bi)
            t2 = A*roll64(Y); PI = s*(t2 - roll64(t2)) (= ar*bi - ai*br)
            aud = atan2(PI, PR) * gain   (duplicated in both halves)
    audio:  y = H_aud @ [tail; aud]   (64 x (T+A-1) Toeplitz, stride=decim)

Two input conventions share one kernel body:

- ``fm_chain_step`` (round-1 API): caller passes the full commutator
  matrix V re/im planes INCLUDING the L-1-row PFB halo; the wrapper pays
  an XLA lane-concat prep pass per call (hoisted by XLA when the input
  is loop-invariant — see BASELINE.md round-3 addendum for the corrected
  accounting).
- ``fm_chain_step_planes`` (round-3, the flagship/bench path): the STREAM
  format IS the planes-rows matrix — (n, 2M) f32, row k =
  [re | im] of input samples x[kM-(M-1) .. kM] ("skewed V rows", the
  exact rows ops/pfb.py's V holds). The batch and its preceding
  ``warm + H8`` halo rows arrive as TWO separate HBM refs; boundary
  tiles split their window DMA across them — NO prep pass at all.
  ``warm > 0`` additionally recomputes `warm` rows of channel output
  before the segment from the halo (zero prev/tail state) and drops
  their audio: that makes each device's computation independent of its
  neighbors' *outputs*, which is what lets the sharded flagship run the
  mega-kernel per time shard with only an input-rows ppermute
  (parallel/channelizer.py) — outputs stay time-sharded, no corner turn.

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


def _mm(a, b, precision=jax.lax.Precision.HIGHEST, b_split=None,
        a_split=None):
    """Matmul with selectable accuracy/speed trade.

    Mosaic lowers only HIGHEST (6 bf16 MXU passes) and DEFAULT (1 pass);
    "split3" is a manual 3-pass HIGH equivalent: split both operands into
    bf16 hi + bf16 lo residual and drop the lo@lo term (~2^-16 relative
    error — ~96 dB, vs ~50 dB for 1-pass bf16 and ~140 dB for HIGHEST).
    ``a_split``/``b_split`` = (hi, lo) bf16 pre-split of a CONSTANT
    operand: skips the per-call VPU split (the kernel re-splits its
    constants every grid tile otherwise — measured win, see BASELINE
    round-3 addendum).
    """
    if precision == "split3":
        if a_split is not None:
            ahi, alo = a_split
        else:
            ahi = a.astype(jnp.bfloat16)
            alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
        if b_split is not None:
            bhi, blo = b_split
        else:
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


def _presplit(m: np.ndarray):
    """Host-side bf16 hi/lo split of a constant matrix (bit-identical to
    the in-kernel split: hi = bf16(x), lo = bf16(x - f32(hi)))."""
    hi = jnp.asarray(m, jnp.float32).astype(jnp.bfloat16)
    lo = (jnp.asarray(m, jnp.float32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _issue_window(local_hbm, halo_hbm, win, sem_l, sem_h, j, dst_slot, *,
                  T, H8, s, NT):
    """Start the DMA(s) for window j into double-buffer slot dst_slot.

    Window layout: the conceptual row stream is vp = [halo(s*T + H8 rows);
    local(n_loc rows)]; window j covers vp rows [j*T, j*T + T + H8).
    Cases (``s = warm // T`` is static):
      j <  s : window entirely inside the halo ref (one copy)
      j == s : straddle — H8 halo rows + T local rows (two copies)
      j >  s : window entirely inside the local ref (one copy)
    Full-width (128-lane) copies only: narrower HBM->VMEM transfers crash
    the Mosaic compiler — measured; the planes-rows stream format exists
    so the kernel never needs one.
    """
    if s > 0:
        @pl.when(j < s)
        def _():
            pltpu.make_async_copy(
                halo_hbm.at[pl.ds(j * T, T + H8), :], win.at[dst_slot],
                sem_l.at[dst_slot]).start()

    @pl.when(j == s)
    def _():
        pltpu.make_async_copy(
            halo_hbm.at[pl.ds(s * T, H8), :],
            win.at[dst_slot, pl.ds(0, H8), :],
            sem_h.at[dst_slot]).start()
        pltpu.make_async_copy(
            local_hbm.at[pl.ds(0, T), :],
            win.at[dst_slot, pl.ds(H8, T), :],
            sem_l.at[dst_slot]).start()

    if NT > s + 1:
        @pl.when(j > s)
        def _():
            pltpu.make_async_copy(
                local_hbm.at[pl.ds((j - s) * T - H8, T + H8), :],
                win.at[dst_slot], sem_l.at[dst_slot]).start()


def _wait_window(local_hbm, halo_hbm, win, sem_l, sem_h, i, slot, *,
                 T, H8, s, NT):
    """Wait for window i's DMA(s). Descriptors must mirror the issued
    copies (the DMA semaphore counts the descriptor's bytes, and interpret
    mode replays the slice, so each branch re-states its own in-bounds
    source slice)."""
    if s > 0:
        @pl.when(i < s)
        def _():
            pltpu.make_async_copy(
                halo_hbm.at[pl.ds(i * T, T + H8), :], win.at[slot],
                sem_l.at[slot]).wait()

    @pl.when(i == s)
    def _():
        pltpu.make_async_copy(
            halo_hbm.at[pl.ds(s * T, H8), :], win.at[slot, pl.ds(0, H8), :],
            sem_h.at[slot]).wait()
        pltpu.make_async_copy(
            local_hbm.at[pl.ds(0, T), :], win.at[slot, pl.ds(H8, T), :],
            sem_l.at[slot]).wait()

    if NT > s + 1:
        @pl.when(i > s)
        def _():
            pltpu.make_async_copy(
                local_hbm.at[pl.ds((i - s) * T - H8, T + H8), :],
                win.at[slot], sem_l.at[slot]).wait()


def _compute_tile(cur, carry_prev, carry_tail, c_ref, w_ref, h_ref,
                  whi_ref, wlo_ref, hhi_ref, hlo_ref, aud_ref, *,
                  T: int, L: int, H8: int, M: int, A: int, gain: float,
                  precision, ag: int = 1):
    """The fused chain's per-tile compute: arm fold (VPU) -> DFT matmul
    (MXU) -> quadrature demod (VPU, polynomial atan2) -> audio Toeplitz
    matmul (MXU). ``cur`` is any (T+H8, 2M) window ref (DMA'd slot or
    generated scratch); shared by the DMA kernel and the gen-mode kernel."""
    off = H8 - (L - 1)
    acc = c_ref[0][None, :] * cur[off: off + T, :]
    for q in range(1, L):
        acc = acc + c_ref[q][None, :] * cur[off + q: off + q + T, :]
    # phase combine (one real matmul on the planes layout; W pre-split)
    Y = _mm(acc, w_ref[:, :], precision,
            b_split=(whi_ref[:, :], wlo_ref[:, :]))  # (T, 2M)
    # quadrature demod against the previous row
    Aprev = jnp.concatenate([carry_prev[:, :], Y[:-1, :]], axis=0)
    Yr64 = pltpu.roll(Y, M, 1)
    t1 = Aprev * Y
    t2 = Aprev * Yr64
    PR = t1 + pltpu.roll(t1, M, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * M), 1)
    sgn = jnp.where(lane < M, jnp.float32(1.0), jnp.float32(-1.0))
    PI = sgn * (t2 - pltpu.roll(t2, M, 1))
    # split3's matmul floor (~-96 dB) dwarfs the degree-5 polynomial error
    # (-113 dBc) — drop 4 FMA steps there; HIGHEST keeps degree 9.
    aud = atan2(PI, PR, deg=5 if precision == "split3" else 9) \
        * jnp.float32(gain)                           # (T, 2M) dup halves
    # audio FIR + decimation (Toeplitz matmul over [tail; aud]).
    # ag > 1 = round-5 BANDED form (same argument as the wbfm xlate,
    # ops/pallas/wbfm_chain.py _xlate_demod): output group g reads only
    # rows [g*T/ag, g*T/ag + T/ag + A-1) of audfull — free row slices of
    # the value, ONE shared shifted Toeplitz, (A-1+T)/(A-1+T/ag)x fewer
    # MXU flops, ulp-equal outputs (structural zeros dropped).
    audfull = jnp.concatenate([carry_tail[:, :], aud], axis=0)  # (A-1+T, 2M)
    if ag > 1:
        gstep = T // ag
        aud_ref[:, :] = jnp.concatenate([
            _mm(h_ref[:, :], audfull[g * gstep: g * gstep + gstep + A - 1, :],
                precision, a_split=(hhi_ref[:, :], hlo_ref[:, :]))
            for g in range(ag)], axis=0)
    else:
        aud_ref[:, :] = _mm(h_ref[:, :], audfull, precision,
                            a_split=(hhi_ref[:, :], hlo_ref[:, :]))
    # carry for the next tile
    carry_prev[:, :] = Y[T - 1:T, :]
    carry_tail[:, :] = aud[T - (A - 1):, :]


def _kernel(local_hbm, halo_hbm, prev0_ref, tail0_ref, c_ref, w_ref, h_ref,
            whi_ref, wlo_ref, hhi_ref, hlo_ref,
            aud_ref, prev_out_ref, tail_out_ref,
            win, carry_prev, carry_tail, sem_l, sem_h, *,
            T: int, L: int, H8: int, M: int, A: int, gain: float, s: int,
            NT: int, precision=jax.lax.Precision.HIGHEST, ag: int = 1):
    """One grid tile of the fused chain.

    Window layout: the conceptual row stream is vp = [halo(s*T + H8 rows);
    local(n_loc rows)]; tile j's window is vp rows [j*T, j*T + T + H8) —
    the fold for in-tile output t reads window rows
    [t + off, t + off + L) with off = H8 - (L-1), so the first ``off``
    window rows are alignment padding (DMA row granularity is 8).

    DMA cases (``s = warm // T`` is static):
      j <  s : window entirely inside the halo ref (one copy)
      j == s : straddle — H8 halo rows + T local rows (two copies)
      j >  s : window entirely inside the local ref (one copy)
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # Double-buffered window DMA: tile i+1's copy is in flight while tile i
    # computes (+13% measured); window/case layout in _issue_window.
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)
    dma = dict(T=T, H8=H8, s=s, NT=NT)

    @pl.when(i == 0)
    def _():
        _issue_window(local_hbm, halo_hbm, win, sem_l, sem_h, i, slot, **dma)
        carry_prev[:, :] = prev0_ref[:, :]
        carry_tail[:, :] = tail0_ref[:, :]

    @pl.when(i + 1 < n)
    def _():
        _issue_window(local_hbm, halo_hbm, win, sem_l, sem_h, i + 1, nslot,
                      **dma)

    _wait_window(local_hbm, halo_hbm, win, sem_l, sem_h, i, slot, **dma)
    _compute_tile(win.at[slot], carry_prev, carry_tail, c_ref, w_ref, h_ref,
                  whi_ref, wlo_ref, hhi_ref, hlo_ref, aud_ref,
                  T=T, L=L, H8=H8, M=M, A=A, gain=gain, precision=precision,
                  ag=ag)

    @pl.when(i == n - 1)
    def _():
        prev_out_ref[:, :] = carry_prev[:, :]
        tail_out_ref[:, :] = carry_tail[:, :]


def _kernel_pipe(local_hbm, halo_hbm, prev0_ref, tail0_ref, c_ref, w_ref,
                 h_ref, whi_ref, wlo_ref, hhi_ref, hlo_ref,
                 aud_ref, prev_out_ref, tail_out_ref,
                 win, carry_prev, carry_tail, yprev, sem_l, sem_h, *,
                 T: int, L: int, H8: int, M: int, A: int, gain: float,
                 s: int, NT: int, precision=jax.lax.Precision.HIGHEST):
    """Software-pipelined variant of ``_kernel``: the MXU stage of tile i
    (fold -> DFT) runs in the same grid step as the VPU stage of tile i-1
    (demod -> audio), with Y handed across steps in VMEM scratch — so the
    DFT/audio matmul passes overlap the demod's elementwise chain instead
    of serializing after it (BASELINE.md residual #3). Grid is NT+1 steps;
    step NT only drains the last tile's VPU stage. DMA double-buffering is
    identical to ``_kernel``.
    """
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)
    dma = dict(T=T, H8=H8, s=s, NT=NT)

    @pl.when(i == 0)
    def _():
        _issue_window(local_hbm, halo_hbm, win, sem_l, sem_h, i, slot, **dma)
        carry_prev[:, :] = prev0_ref[:, :]
        carry_tail[:, :] = tail0_ref[:, :]

    @pl.when(i + 1 < NT)
    def _():
        _issue_window(local_hbm, halo_hbm, win, sem_l, sem_h, i + 1, nslot,
                      **dma)

    # ---- stage A (tiles [0, NT)): DMA wait -> fold -> DFT ----------------
    @pl.when(i < NT)
    def _():
        _wait_window(local_hbm, halo_hbm, win, sem_l, sem_h, i, slot, **dma)
        cur = win.at[slot]
        off = H8 - (L - 1)
        acc = c_ref[0][None, :] * cur[off: off + T, :]
        for q in range(1, L):
            acc = acc + c_ref[q][None, :] * cur[off + q: off + q + T, :]
        Ynew = _mm(acc, w_ref[:, :], precision,
                   b_split=(whi_ref[:, :], wlo_ref[:, :]))  # (T, 2M), MXU

        # ---- stage B (tiles [1, NT]): demod -> audio of tile i-1 --------
        # Emitted BETWEEN the DFT issue and the yprev overwrite: the demod
        # chain reads yprev (tile i-1's Y), so the MXU can fill Ynew while
        # the VPU runs it.
        @pl.when(i > 0)
        def _():
            _stage_b(yprev, carry_prev, carry_tail, h_ref, hhi_ref, hlo_ref,
                     aud_ref, T=T, M=M, A=A, gain=gain, precision=precision)
        yprev[:, :] = Ynew

    @pl.when(i == NT)
    def _():
        _stage_b(yprev, carry_prev, carry_tail, h_ref, hhi_ref, hlo_ref,
                 aud_ref, T=T, M=M, A=A, gain=gain, precision=precision)
        prev_out_ref[:, :] = carry_prev[:, :]
        tail_out_ref[:, :] = carry_tail[:, :]


def _stage_b(yprev, carry_prev, carry_tail, h_ref, hhi_ref, hlo_ref,
             aud_ref, *, T, M, A, gain, precision):
    Y = yprev[:, :]
    Aprev = jnp.concatenate([carry_prev[:, :], Y[:-1, :]], axis=0)
    Yr64 = pltpu.roll(Y, M, 1)
    t1 = Aprev * Y
    t2 = Aprev * Yr64
    PR = t1 + pltpu.roll(t1, M, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * M), 1)
    sgn = jnp.where(lane < M, jnp.float32(1.0), jnp.float32(-1.0))
    PI = sgn * (t2 - pltpu.roll(t2, M, 1))
    aud = atan2(PI, PR, deg=5 if precision == "split3" else 9) \
        * jnp.float32(gain)
    audfull = jnp.concatenate([carry_tail[:, :], aud], axis=0)
    aud_ref[:, :] = _mm(h_ref[:, :], audfull, precision,
                        a_split=(hhi_ref[:, :], hlo_ref[:, :]))
    carry_prev[:, :] = Y[T - 1:T, :]
    carry_tail[:, :] = aud[T - (A - 1):, :]


def _pick_audio_groups(tile: int, decim: int, A: int) -> int:
    """Banded audio Toeplitz group count (see _compute_tile ag).

    MEASURED-REJECTED for the flagship config (v5e, 2026-08-21,
    alternating min-of-6 chain-only A/B at tile=512/decim=8/A=65):
    ag=1 98.7-99.5 us, ag=2 104.1, ag=4 106.3 — unlike the wbfm xlate
    (where banding wins 2.10x, ops/pallas/wbfm_chain.py), this stage is
    only ~10 us and its output side is just 64 rows/tile, so splitting
    into (32, 320) or (16, 192) matmuls costs more in MXU underutilization
    and concat overhead than the 1.8-3x flop cut saves. Auto therefore
    stays 1; the mechanism remains for configs with bigger audio stages
    (callers can monkeypatch/measure per the BASELINE discipline)."""
    return 1


def _pick_tile(n_out: int, tile: int, decim: int) -> int:
    if n_out % tile != 0:
        if n_out <= tile:
            tile = n_out
        else:
            tile = next(t for t in range(tile, 0, -1) if n_out % t == 0)
    if tile % decim != 0:
        raise ValueError(f"tile {tile} not divisible by audio decim {decim}")
    return tile


def fm_chain_step_planes(vb: jax.Array, halo: jax.Array, prev0: jax.Array,
                         tail0: jax.Array, arm_c: np.ndarray,
                         ataps: np.ndarray, decim: int, gain: float,
                         warm: int = 0, tile: int = 512,
                         interpret: bool = False, pipelined: bool = False,
                         precision=jax.lax.Precision.HIGHEST):
    """Run one batch of the fused chain on the planes-rows stream format.

    Args:
      vb: (n_loc, 2M) f32 — this batch/segment's planes rows. Row k holds
        [re | im] of input samples x[kM-(M-1) .. kM] — exactly the rows of
        ops/pfb.py's commutator matrix V, continued across batches (the
        first row of a zero-history stream is [0]*(M-1) + x[0]).
      halo: (warm + H8, 2M) f32 — the rows immediately PRECEDING vb in
        stream order (zeros at stream start); H8 = round8(L-1). Only the
        last L-1 of the trailing H8 rows feed the fold; the first
        H8-(L-1) are alignment padding. For streaming, next batch's halo
        is ``concat([halo, vb])[-(warm+H8):]`` — i.e. vb's own tail.
      prev0/tail0: (1, 2M) / (A-1, 2M) f32 carried demod/audio state.
        With warm > 0 pass zeros — the state is recomputed from the halo.
      warm: rows of channel output recomputed before the segment and
        dropped (0, or a multiple of `tile` >= ceil(A/decim)*decim).
      arm_c: (L, M) fold coefficients (ops/pfb.py `c`).
      ataps: (A,) audio FIR taps; decim: audio decimation; gain: demod gain.

    Returns (audio (n_loc//decim, M) f32, prev (1, 2M), tail (A-1, 2M)) —
    with warm > 0 the returned prev/tail are the true end-of-segment state
    (recomputed), same as warm == 0.
    """
    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    A = int(np.asarray(ataps).shape[0])
    n_loc = int(vb.shape[0])
    H8 = _round8(L - 1)
    warm = int(warm)
    tile = _pick_tile(n_loc, tile, decim)
    if warm:
        if warm % tile != 0:
            raise ValueError(f"warm {warm} must be a multiple of tile {tile}")
        need_warm = -(-A // decim) * decim
        if warm < need_warm:
            raise ValueError(
                f"warm {warm} too small: need >= ceil(A/decim)*decim = "
                f"{need_warm} recomputed rows to rebuild demod+audio state")
    if not interpret and (2 * M) % 128 != 0:
        raise ValueError(f"planes width {2*M} must be a multiple of 128")
    if A - 1 > tile:
        raise ValueError(f"audio tail {A-1} exceeds tile {tile}")
    if tile < H8:
        raise ValueError(
            f"tile {tile} < H8 {H8}: the boundary-tile DMA split assumes at "
            f"most one straddling window (batch rows must be >= {H8})")
    if int(halo.shape[0]) != warm + H8:
        raise ValueError(f"halo rows {halo.shape[0]} != warm+H8 = {warm + H8}")
    n_ext = n_loc + warm
    c2 = planes_taps(arm_c)
    W2 = planes_dft_matrix(M)
    ag = 1 if pipelined else _pick_audio_groups(tile, decim, A)
    Haud = audio_toeplitz(ataps, tile // ag, decim)
    Whi, Wlo = _presplit(W2)
    Hhi, Hlo = _presplit(Haud)
    NT = n_ext // tile
    scratch = [
        pltpu.VMEM((2, tile + H8, 2 * M), jnp.float32),  # 2x DMA window
        pltpu.VMEM((1, 2 * M), jnp.float32),           # demod prev carry
        pltpu.VMEM((A - 1, 2 * M), jnp.float32),       # audio tail carry
    ]
    if pipelined:
        kernel = functools.partial(_kernel_pipe, T=tile, L=L, H8=H8, M=M,
                                   A=A, gain=float(gain), s=warm // tile,
                                   NT=NT, precision=precision)
        grid = (NT + 1,)
        scratch.append(pltpu.VMEM((tile, 2 * M), jnp.float32))  # Y handoff
        # Grid step i writes tile i-1's audio block (step 0 writes block 0
        # too, but skips the store; step 1 then writes it for real).
        aud_map = lambda i: (jax.lax.max(i - 1, 0), 0)  # noqa: E731
    else:
        kernel = functools.partial(_kernel, T=tile, L=L, H8=H8, M=M, A=A,
                                   gain=float(gain), s=warm // tile,
                                   NT=NT, precision=precision, ag=ag)
        grid = (NT,)
        aud_map = lambda i: (i, 0)  # noqa: E731
    scratch += [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    n_aud = n_ext // decim
    aud, prev, tail = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # local planes (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # halo planes (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # prev0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tail0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fold taps
            pl.BlockSpec(memory_space=pltpu.VMEM),   # DFT matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),   # audio Toeplitz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # DFT bf16 hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # DFT bf16 lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Toeplitz bf16 hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Toeplitz bf16 lo
        ],
        out_specs=(
            pl.BlockSpec((tile // decim, 2 * M), aud_map,
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
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_ext * 2 * M * (L + 2 * M) + 2 * n_aud * 2 * M * (A - 1 + tile),
            # reads: local n_loc rows + halo (warm + H8) rows = n_ext + H8
            bytes_accessed=(n_ext + H8) * 2 * M * 4 + n_aud * 2 * M * 4,
            transcendentals=n_ext * 2 * M,  # atan2 polynomial
        ),
        interpret=interpret,
    )(vb, halo, prev0, tail0, jnp.asarray(c2), jnp.asarray(W2),
      jnp.asarray(Haud), Whi, Wlo, Hhi, Hlo)
    return aud[warm // decim:, :M], prev, tail


def _kernel_gen(ghi_ref, glo_ref, amp_ref, carry0_ref, prev0_ref, tail0_ref,
                c_ref, w_ref, h_ref, whi_ref, wlo_ref, hhi_ref, hlo_ref,
                aud_ref, prev_out_ref, tail_out_ref, carry_out_ref,
                win, carry_prev, carry_tail, *,
                T: int, L: int, H8: int, M: int, A: int, gain: float,
                NT: int, seed: int, precision, ag: int = 1,
                draws: int = 3):
    """Gen-mode tile: the window is GENERATED in VMEM (hardware PRNG +
    Irwin-Hall, ops/pallas/noise.py) instead of DMA'd from HBM — the
    whole live noise flagship becomes zero-input-traffic. Tile i's fresh
    rows are absolute groups g0 + i*(T/GROUP_ROWS)...; the H8-row fold
    halo is carried tile-to-tile in the same window buffer (no
    regeneration) and across batches via the carry0/carry_out state."""
    from newsched_tpu.ops.pallas.noise import GROUP_ROWS, gen_rows

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        win[0:H8, :] = carry0_ref[:, :]
        carry_prev[:, :] = prev0_ref[:, :]
        carry_tail[:, :] = tail0_ref[:, :]

    base = jnp.int32(i) * jnp.int32(T // GROUP_ROWS)
    lo = glo_ref[0]
    glo = lo + base
    wrapped = (glo ^ jnp.int32(-0x80000000)) < (lo ^ jnp.int32(-0x80000000))
    ghi = ghi_ref[0] + wrapped.astype(jnp.int32)
    win[H8:, :] = gen_rows(jnp.int32(seed), ghi, glo, T, 2 * M,
                           draws=draws) * amp_ref[0]
    _compute_tile(win, carry_prev, carry_tail, c_ref, w_ref, h_ref,
                  whi_ref, wlo_ref, hhi_ref, hlo_ref, aud_ref,
                  T=T, L=L, H8=H8, M=M, A=A, gain=gain, precision=precision,
                  ag=ag)

    @pl.when(i == NT - 1)
    def _():
        prev_out_ref[:, :] = carry_prev[:, :]
        tail_out_ref[:, :] = carry_tail[:, :]
        carry_out_ref[:, :] = win[T: T + H8, :]

    # next tile's halo = this tile's last H8 fresh rows (T >= H8 so the
    # read happens before the region is ever overwritten)
    win[0:H8, :] = win[T: T + H8, :]


def fm_chain_gen_step(ghi: jax.Array, glo: jax.Array, amp: jax.Array,
                      carry0: jax.Array, prev0: jax.Array, tail0: jax.Array,
                      arm_c: np.ndarray, ataps: np.ndarray, decim: int,
                      gain: float, n_loc: int, tile: int = 512,
                      seed: int = 0,
                      precision=jax.lax.Precision.HIGHEST,
                      noise_draws: int = 3):
    """One batch of the fused chain with the input GENERATED in-kernel:
    the live noise flagship as a single source kernel (VERDICT r3 item #1).

    Args:
      ghi/glo: absolute GROUP_ROWS-row group counter of the batch start
        (two int32 halves, see ops/pallas/noise.py) — the only stream
        state besides the chain carries.
      amp: f32 scalar noise amplitude (runtime-settable parameter).
      carry0: (H8, 2M) the previous batch's trailing generated rows
        (zeros at stream start) — the PFB fold halo.
      prev0/tail0, arm_c, ataps, decim, gain: as fm_chain_step_planes.
      n_loc: rows to generate+process this batch (multiple of tile; tile
        must be a multiple of noise.GROUP_ROWS).

    Returns (audio (n_loc//decim, M) f32, prev, tail, carry (H8, 2M)).
    Emits the BIT-IDENTICAL stream to noise_planes_source(method="pallas",
    same seed/amplitude) -> fm_channelizer_fused_planes, minus that
    graph's 2x16.8 MB HBM round trip. TPU only (no interpret lowering for
    the Mosaic PRNG).
    """
    from newsched_tpu.ops.pallas.noise import GROUP_ROWS

    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    A = int(np.asarray(ataps).shape[0])
    H8 = _round8(L - 1)
    tile = _pick_tile(n_loc, tile, decim)
    if tile % GROUP_ROWS:
        raise ValueError(f"tile {tile} not a multiple of the noise group "
                         f"({GROUP_ROWS} rows)")
    if A - 1 > tile or tile < H8:
        raise ValueError(f"tile {tile} too small for A={A}, H8={H8}")
    c2 = planes_taps(arm_c)
    W2 = planes_dft_matrix(M)
    ag = _pick_audio_groups(tile, decim, A)
    Haud = audio_toeplitz(ataps, tile // ag, decim)
    Whi, Wlo = _presplit(W2)
    Hhi, Hlo = _presplit(Haud)
    NT = n_loc // tile
    kernel = functools.partial(_kernel_gen, T=tile, L=L, H8=H8, M=M, A=A,
                               gain=float(gain), NT=NT, seed=int(seed),
                               precision=precision, ag=ag,
                               draws=int(noise_draws))
    n_aud = n_loc // decim
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    aud, prev, tail, carry = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[smem, smem, smem] + [vmem] * 10,
        out_specs=(
            pl.BlockSpec((tile // decim, 2 * M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A - 1, 2 * M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H8, 2 * M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_aud, 2 * M), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * M), jnp.float32),
            jax.ShapeDtypeStruct((A - 1, 2 * M), jnp.float32),
            jax.ShapeDtypeStruct((H8, 2 * M), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + H8, 2 * M), jnp.float32),  # gen window
            pltpu.VMEM((1, 2 * M), jnp.float32),
            pltpu.VMEM((A - 1, 2 * M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_loc * 2 * M * (L + 2 * M)
            + 2 * n_aud * 2 * M * (A - 1 + tile) + 10 * n_loc * 2 * M,
            bytes_accessed=n_aud * 2 * M * 4,
            transcendentals=n_loc * 2 * M,
        ),
    )(ghi.reshape(1).astype(jnp.int32), glo.reshape(1).astype(jnp.int32),
      amp.reshape(1).astype(jnp.float32), carry0, prev0, tail0,
      jnp.asarray(c2), jnp.asarray(W2), jnp.asarray(Haud), Whi, Wlo, Hhi, Hlo)
    return aud[:, :M], prev, tail, carry


def _kernel_gen_warm(ghi_ref, glo_ref, amp_ref,
                     c_ref, w_ref, h_ref, whi_ref, wlo_ref, hhi_ref, hlo_ref,
                     aud_ref, win, carry_prev, carry_tail, *,
                     T: int, L: int, H8: int, M: int, A: int, gain: float,
                     NT: int, warm: int, seed: int, precision, ag: int = 1,
                     draws: int = 3):
    """STATELESS gen-mode tile: like ``_kernel_gen`` but with nothing
    carried between batches — the fold halo AND the demod/audio junction
    state are REGENERATED from the position-pure stream contract
    (ops/pallas/noise.py): the kernel generates ``warm`` extra rows before
    the segment (zero junction state, outputs discarded by the caller) and
    the first tile regenerates its own H8-row fold halo from the group
    preceding the warm region. Groups before stream position 0 emit zeros
    (mask_pre), matching the zero initial state of the carried path. This
    is what lets the LIVE flagship shard: each device of a mesh runs this
    kernel on its own absolute group range with ZERO collectives."""
    from newsched_tpu.ops.pallas.noise import (GROUP_ROWS, add_groups_signed,
                                               gen_rows)

    i = pl.program_id(0)
    # fresh-row base group for tile i: segment start - warm + i*T (in rows)
    off = jnp.int32(i) * jnp.int32(T // GROUP_ROWS) \
        - jnp.int32(warm // GROUP_ROWS)
    ghi, glo = add_groups_signed(ghi_ref[0], glo_ref[0], off)

    @pl.when(i == 0)
    def _():
        # fold halo = last H8 rows of the group just before the warm region
        hhi, hlo = add_groups_signed(ghi, glo, jnp.int32(-1))
        blk = gen_rows(jnp.int32(seed), hhi, hlo, GROUP_ROWS, 2 * M,
                       mask_pre=True, draws=draws)
        win[0:H8, :] = blk[GROUP_ROWS - H8:, :] * amp_ref[0]
        carry_prev[:, :] = jnp.zeros((1, 2 * M), jnp.float32)
        carry_tail[:, :] = jnp.zeros((A - 1, 2 * M), jnp.float32)

    win[H8:, :] = gen_rows(jnp.int32(seed), ghi, glo, T, 2 * M,
                           mask_pre=True, draws=draws) * amp_ref[0]
    _compute_tile(win, carry_prev, carry_tail, c_ref, w_ref, h_ref,
                  whi_ref, wlo_ref, hhi_ref, hlo_ref, aud_ref,
                  T=T, L=L, H8=H8, M=M, A=A, gain=gain, precision=precision,
                  ag=ag)
    # next tile's halo = this tile's last H8 fresh rows
    win[0:H8, :] = win[T: T + H8, :]


def fm_chain_gen_warm_step(ghi: jax.Array, glo: jax.Array, amp: jax.Array,
                           arm_c: np.ndarray, ataps: np.ndarray, decim: int,
                           gain: float, n_loc: int, *, warm: int,
                           tile: int = 512, seed: int = 0,
                           precision=jax.lax.Precision.HIGHEST,
                           noise_draws: int = 3):
    """One SEGMENT of the gen-fused chain with no carried state at all:
    audio for stream rows [G*GROUP_ROWS, G*GROUP_ROWS + n_loc) where
    G = (ghi, glo), with the fold halo and the demod/audio junction state
    regenerated in-kernel from ``warm`` recomputed rows (discarded). The
    sharded LIVE flagship's per-device step: a device at time-shard d
    passes its own absolute group base and needs no inputs, no carries,
    and no collectives (VERDICT r4 item #1).

    Tile boundaries land at the same absolute positions as the carried
    single-device kernel whenever n_loc, warm, and the stream batch are
    all multiples of ``tile`` — making the emitted audio BIT-IDENTICAL to
    ``fm_chain_gen_step``'s, not merely close (tested on the TPU tier).

    Returns audio (n_loc//decim, M) f32. warm must be a multiple of tile
    and >= ceil(A/decim)*decim; tile a multiple of noise.GROUP_ROWS.
    """
    from newsched_tpu.ops.pallas.noise import GROUP_ROWS

    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    A = int(np.asarray(ataps).shape[0])
    H8 = _round8(L - 1)
    tile = _pick_tile(n_loc, tile, decim)
    warm = int(warm)
    if warm % tile:
        raise ValueError(f"warm {warm} must be a multiple of tile {tile}")
    need_warm = -(-A // decim) * decim
    if warm < need_warm:
        raise ValueError(
            f"warm {warm} too small: need >= ceil(A/decim)*decim = "
            f"{need_warm} recomputed rows to rebuild demod+audio state")
    if tile % GROUP_ROWS:
        raise ValueError(f"tile {tile} not a multiple of the noise group "
                         f"({GROUP_ROWS} rows)")
    if A - 1 > tile or tile < H8:
        raise ValueError(f"tile {tile} too small for A={A}, H8={H8}")
    if H8 > GROUP_ROWS:
        raise ValueError(f"H8 {H8} > one noise group ({GROUP_ROWS} rows): "
                         f"first-tile halo regeneration spans one group")
    c2 = planes_taps(arm_c)
    W2 = planes_dft_matrix(M)
    ag = _pick_audio_groups(tile, decim, A)
    Haud = audio_toeplitz(ataps, tile // ag, decim)
    Whi, Wlo = _presplit(W2)
    Hhi, Hlo = _presplit(Haud)
    NT = (warm + n_loc) // tile
    kernel = functools.partial(_kernel_gen_warm, T=tile, L=L, H8=H8, M=M,
                               A=A, gain=float(gain), NT=NT, warm=warm,
                               seed=int(seed), precision=precision, ag=ag,
                               draws=int(noise_draws))
    n_aud = (warm + n_loc) // decim
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    aud = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[smem, smem, smem] + [vmem] * 7,
        out_specs=pl.BlockSpec((tile // decim, 2 * M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_aud, 2 * M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + H8, 2 * M), jnp.float32),  # gen window
            pltpu.VMEM((1, 2 * M), jnp.float32),
            pltpu.VMEM((A - 1, 2 * M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (warm + n_loc) * 2 * M * (L + 2 * M)
            + 2 * n_aud * 2 * M * (A - 1 + tile)
            + 10 * (warm + n_loc) * 2 * M,
            bytes_accessed=n_aud * 2 * M * 4,
            transcendentals=(warm + n_loc) * 2 * M,
        ),
    )(ghi.reshape(1).astype(jnp.int32), glo.reshape(1).astype(jnp.int32),
      amp.reshape(1).astype(jnp.float32),
      jnp.asarray(c2), jnp.asarray(W2), jnp.asarray(Haud), Whi, Wlo, Hhi, Hlo)
    return aud[warm // decim:, :M]


def fm_chain_step(vr: jax.Array, vi: jax.Array, prev0: jax.Array,
                  tail0: jax.Array, arm_c: np.ndarray, ataps: np.ndarray,
                  decim: int, gain: float, n_out: int, tile: int = 512,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST):
    """Round-1 API: run one batch from separate re/im V planes.

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

    This wrapper pays an XLA lane-concat prep pass to build the planes
    stream (hoisted when the input is loop-invariant); the planes-native
    path (``fm_chain_step_planes``) avoids it unconditionally.
    """
    L, M = int(arm_c.shape[0]), int(arm_c.shape[1])
    need = L - 1 + n_out
    H8 = _round8(L - 1)

    def cut(v):
        return v[:need]

    vp = jnp.concatenate([cut(vr), cut(vi)], axis=1)  # (need, 2M) planes
    halo = jnp.concatenate(
        [jnp.zeros((H8 - (L - 1), 2 * M), jnp.float32), vp[: L - 1]], axis=0)
    return fm_chain_step_planes(vp[L - 1:], halo, prev0, tail0, arm_c, ataps,
                                decim, gain, warm=0, tile=tile,
                                interpret=interpret, precision=precision)
