"""Sharded wideband FM channelizer — the flagship multi-chip pipeline
(BASELINE config #4: N-channel channelizer + per-channel FM demod, sharded
across devices/hosts with ICI halo exchange).

Layout strategy (one batch = n_dev * seg samples of the wideband stream):

  1. **Time sharding in**: each device holds one contiguous time segment.
     The polyphase filterbank needs M*L-1 preceding samples: one
     ``ppermute`` halo exchange per batch (parallel/halo.py), device 0
     splicing the previous batch's carry.
  2. **Local channelize**: each device runs the full M-channel PFB on its
     segment (grouped conv + IDFT across arms) -> (seg/M, M) local.
  3. **Corner turn**: ``all_to_all`` re-shards from time-sharded full-band
     to channel-sharded full-time: (seg/M * n, M/n). This is the classic
     channelizer corner turn, compiled onto ICI.
  4. **Channel-parallel demod + audio**: each device now owns M/n channels
     for the WHOLE batch, so quadrature-demod history and audio-FIR tails
     are plain per-device state — no further communication, perfect
     scaling. Output stays channel-sharded (the natural layout for
     per-channel consumers).

The same code runs on any mesh size including 1 (collectives degenerate),
and on the CPU-simulated mesh for tests — mesh-size-agnostic by
construction (SURVEY.md §8 hard part #6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from newsched_tpu.ops import fir as fir_ops
from newsched_tpu.ops import pfb as pfb_ops
from newsched_tpu.parallel.halo import time_halo


class ShardedFMState(NamedTuple):
    pfb_carry: jax.Array    # (n_dev * (M*L-1),) time-sharded input tail carry
    demod_prev: jax.Array   # (M,) channel-sharded last channel sample
    audio_tail: jax.Array   # (M, A-1) channel-sharded audio FIR tails


class PlanesFMState(NamedTuple):
    """State of the planes-rows mega-kernel path (``step_planes``).

    n_dev == 1: carry = (H8, 2M) trailing stream rows, prev/tail the
    kernel's demod/audio state. n_dev > 1: carry = (n_dev*(warm+H8), 2M)
    time-sharded trailing rows (each device keeps its own tail; only
    device n-1's matters, spliced to device 0 next batch by the halo
    exchange); prev/tail are zero-size placeholders — the sharded kernel
    recomputes warm-up state from the halo instead of carrying it.
    """

    carry: jax.Array
    prev: jax.Array
    tail: jax.Array


def planes_rows(x: np.ndarray, nchans: int,
                skew_carry: np.ndarray | None = None) -> np.ndarray:
    """Host helper: complex samples -> the (n, 2M) f32 planes-rows stream
    format of the fused mega-kernel (ops/pallas/fm_chain.py): row k =
    [re | im] of x[kM-(M-1) .. kM]. ``skew_carry`` is the previous batch's
    last M-1 samples (zeros at stream start)."""
    M = int(nchans)
    x = np.asarray(x)
    if skew_carry is None:
        skew_carry = np.zeros(M - 1, x.dtype)
    full = np.concatenate([skew_carry, x])[: (len(x) // M) * M]
    rows = full.reshape(-1, M)
    return np.concatenate([rows.real, rows.imag], axis=1).astype(np.float32)


class ShardedFMChannelizer:
    """Builds the jitted sharded streaming step.

    step(x, state) -> (audio, state): x is the (B,) wideband batch sharded
    P("t"); audio is (B/M/audio_decim, M) sharded P(None, "t") — i.e.
    channel-sharded.
    """

    def __init__(self, mesh: Mesh, nchans: int, taps: np.ndarray,
                 audio_taps: np.ndarray, audio_decim: int = 8,
                 demod_gain: float = 1.0, axis: str = "t",
                 audio_method: str = "auto", pfb_method: str = "auto",
                 pfb_combine: str = "auto", chain_method: str = "auto",
                 chain_precision="split3", interpret: bool = False):
        # chain_precision: matmul accuracy for the fused mega-kernel.
        # "split3" (manual 3-pass bf16-split, ~107 dB on the flagship,
        # 1.3x faster than HIGHEST's 6 passes — bench/exp_precision.py)
        # is the default; pass jax.lax.Precision.HIGHEST for ~142 dB.
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        self.nchans = int(nchans)
        if self.nchans % self.n_dev != 0:
            raise ValueError(f"nchans {nchans} must divide by mesh size {self.n_dev}")
        self.arm_taps = pfb_ops.pfb_arm_taps(np.asarray(taps, np.float32), self.nchans)
        self.ntaps = int(self.arm_taps.size)
        self.audio_taps = np.asarray(audio_taps, np.float32)
        self.audio_decim = int(audio_decim)
        self.demod_gain = float(demod_gain)
        self.chain_precision = chain_precision
        # interpret=True runs the Pallas kernels in interpreter mode
        # (CPU tests of the mega-kernel paths; relaxes the lane-width
        # and backend constraints).
        self.interpret = bool(interpret)
        M, L = self.arm_taps.shape
        # Taps stay host-side numpy: kernels embed them as constants at trace
        # time (device jnp constants would need D2H pulls in fir_filter's
        # static-taps path, which the axon backend rejects).
        arm = self.arm_taps
        ataps = self.audio_taps

        axis_name = self.axis
        decim = self.audio_decim
        # np scalar, NOT jnp: an eagerly-created device array would be
        # embedded as an MLIR constant at lowering, which needs a D2H pull
        # the axon backend cannot do.
        gain = np.float32(self.demod_gain)

        def spmd_step(x_seg, pfb_carry, demod_prev, audio_tail):
            # x_seg: (seg,) local segment. pfb_carry: (ntaps-1,) local.
            # demod_prev: (M/n,), audio_tail: (M/n, A-1) local channel shard.
            halo, new_carry = time_halo(x_seg, pfb_carry, axis_name)
            _, Y = pfb_ops.pfb_channelize(arm, pfb_ops.PfbState(tail=halo), x_seg,
                                          method=pfb_method, combine=pfb_combine)
            # Y: (seg/M, M) local. Corner turn -> (seg/M * n, M/n).
            Yc = lax.all_to_all(Y, axis_name, split_axis=1, concat_axis=0, tiled=True)
            # Per-channel quadrature demod over full batch time.
            xprev = jnp.concatenate([demod_prev[None, :], Yc[:-1]], axis=0)
            p = jnp.conj(xprev) * Yc
            # zero history -> exactly 0 (signed-zero-free convention; see
            # bench.py numpy_reference and ops/pallas/fm_chain.py)
            aud = jnp.where((xprev == 0) | (Yc == 0), jnp.float32(0),
                            jnp.arctan2(jnp.imag(p), jnp.real(p))) * gain
            new_prev = Yc[-1]
            # Audio FIR + decimation per channel (vmap streaming kernel).
            def one(tail, ch):
                st, y = fir_ops.fir_filter(ataps, fir_ops.FirState(tail=tail), ch,
                                           decim=decim, method=audio_method)
                return st.tail, y

            new_tails, ys = jax.vmap(one)(audio_tail, aud.T.astype(jnp.float32))
            return ys.T, new_carry, new_prev, new_tails

        A = len(self.audio_taps)
        self.c_fold = arm[::-1, ::-1].T.copy()  # (L, M), ops/pfb.py layout
        self._mega_ok = ((pfb_ops._pallas_ok(M) or self.interpret)
                         and 512 % decim == 0 and A - 1 <= 512)
        if chain_method == "auto":
            # The fused full-chain kernel's native interface is the
            # planes-rows stream (step_planes, available for any n_dev);
            # the complex-sample step() keeps the staged corner-turn
            # layout for n_dev > 1, so auto only picks the mega-kernel
            # single-device. Constraints mirror the kernel's.
            chain_method = ("megakernel" if (self.n_dev == 1 and self._mega_ok)
                            else "stages")
        self.chain_method = chain_method
        self._planes_cfg: tuple[int, int, int] | None = None  # (n_rows, tile, warm)

        if self.n_dev > 1 and chain_method == "megakernel":
            if not self._mega_ok:
                raise ValueError(
                    "mega-kernel constraints not met (2*nchans % 128, "
                    "512 % decim, audio taps <= 513)")
            # Sharded mega-kernel runs through the planes-rows API only —
            # the planes stream IS the fused path's native format; the
            # complex-sample step() would need a cross-shard skew reshape
            # that defeats the no-prep design.
            def _no_complex_step(*a):
                raise NotImplementedError(
                    "chain_method='megakernel' with n_dev > 1: use "
                    "step_planes(xrows, state)/init_state_planes(n_rows) — "
                    "the planes-rows stream is the fused kernel's native "
                    "format (see planes_rows())")

            self._spmd_step = _no_complex_step
        elif self.n_dev == 1 and chain_method == "megakernel":
            from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

            H = self.ntaps - 1
            c_fold = arm[::-1, ::-1].T.copy()  # (L, M), ops/pfb.py layout

            def mega_step(x, pfb_carry, demod_prev, audio_tail):
                B = int(x.shape[0])
                n_out = B // M
                xfull = jnp.concatenate([pfb_carry, x])
                V = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
                prev_p = jnp.concatenate(
                    [jnp.real(demod_prev), jnp.imag(demod_prev)])[None, :]
                tail_p = jnp.concatenate([audio_tail.T, audio_tail.T], axis=1)
                aud, prev2, tail2 = fm_chain_step(
                    jnp.real(V).astype(jnp.float32),
                    jnp.imag(V).astype(jnp.float32),
                    prev_p.astype(jnp.float32), tail_p.astype(jnp.float32),
                    c_fold, ataps, decim, float(gain), n_out,
                    interpret=self.interpret, precision=chain_precision)
                new_prev = jax.lax.complex(prev2[0, :M], prev2[0, M:])
                new_tails = tail2[:, :M].T
                return aud, x[-H:], new_prev, new_tails

            self._spmd_step = mega_step
        elif self.n_dev == 1:
            # Single device: identical math without shard_map. The
            # collectives would be no-ops anyway, and the axon TPU backend's
            # remote compile chokes on single-device SPMD programs; this is
            # also the cleanest per-chip fast path.
            H = self.ntaps - 1

            def single_step(x, pfb_carry, demod_prev, audio_tail):
                _, Y = pfb_ops.pfb_channelize(arm, pfb_ops.PfbState(tail=pfb_carry), x,
                                              method=pfb_method, combine=pfb_combine)
                xprev = jnp.concatenate([demod_prev[None, :], Y[:-1]], axis=0)
                p = jnp.conj(xprev) * Y
                aud = jnp.where((xprev == 0) | (Y == 0), jnp.float32(0),
                                jnp.arctan2(jnp.imag(p), jnp.real(p))) * gain
                def one(tail, ch):
                    st, y = fir_ops.fir_filter(ataps, fir_ops.FirState(tail=tail), ch,
                                               decim=decim, method=audio_method)
                    return st.tail, y
                new_tails, ys = jax.vmap(one)(audio_tail, aud.T.astype(jnp.float32))
                return ys.T, x[-H:], Y[-1], new_tails

            self._spmd_step = single_step
        else:
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            Pt = P(axis_name)
            self._spmd_step = shard_map(
                spmd_step, mesh=mesh,
                in_specs=(Pt, Pt, P(axis_name), P(axis_name, None)),
                out_specs=(P(None, axis_name), Pt, P(axis_name), P(axis_name, None)),
            )

    # -- state ----------------------------------------------------------
    def init_state(self, seed: int = 0) -> ShardedFMState:
        M = self.nchans
        A = len(self.audio_taps)
        H = self.ntaps - 1
        dev = NamedSharding(self.mesh, P(self.axis))
        return ShardedFMState(
            pfb_carry=jax.device_put(jnp.zeros((self.n_dev * H,), jnp.complex64), dev),
            demod_prev=jax.device_put(jnp.zeros((M,), jnp.complex64), dev),
            audio_tail=jax.device_put(jnp.zeros((M, A - 1), jnp.float32),
                                      NamedSharding(self.mesh, P(self.axis, None))),
        )

    def step(self, x: jax.Array, state: ShardedFMState):
        """One batch. x: (B,) cf32, B a multiple of batch_multiple() and
        >= min_batch(), sharded (or shardable) over the time axis."""
        B = int(x.shape[0])
        if B % self.batch_multiple() != 0:
            raise ValueError(f"batch {B} not a multiple of {self.batch_multiple()}")
        if B < self.min_batch():
            raise ValueError(
                f"batch {B} too small: per-device segment must cover the "
                f"{self.ntaps - 1}-sample filter halo; need >= {self.min_batch()}"
            )
        audio, carry, prev, tails = self._spmd_step(
            x, state.pfb_carry, state.demod_prev, state.audio_tail
        )
        return audio, state._replace(pfb_carry=carry, demod_prev=prev, audio_tail=tails)

    # -- planes-rows mega-kernel API (round 3) ---------------------------
    # The fused kernel's native stream format: (n, 2M) f32 rows, row k =
    # [re | im] of input samples x[kM-(M-1) .. kM] (see planes_rows() and
    # ops/pallas/fm_chain.py). No prep pass; for n_dev > 1 the kernel runs
    # per time shard inside shard_map with ONE input-rows ppermute halo and
    # `warm` rows of recomputed channel output (state is derived from the
    # halo, so shards never need each other's *outputs* — no corner turn,
    # audio stays time-sharded).

    def _planes_setup(self, n_rows: int) -> tuple[int, int]:
        from newsched_tpu.ops.pallas.fm_chain import _pick_tile, _round8

        if self._planes_cfg is not None:
            if self._planes_cfg[0] != n_rows:
                raise ValueError(
                    f"planes path built for n_rows={self._planes_cfg[0]}, "
                    f"got {n_rows}")
            return self._planes_cfg[1], self._planes_cfg[2]
        if not self._mega_ok:
            raise ValueError("mega-kernel constraints not met for step_planes")
        M = self.nchans
        A = len(self.audio_taps)
        if n_rows % self.n_dev != 0:
            raise ValueError(f"n_rows {n_rows} not divisible by mesh {self.n_dev}")
        n_loc = n_rows // self.n_dev
        # n_dev > 1 needs warm (= tile) + H8 halo rows out of each device's
        # n_loc rows, so cap the tile at half the segment there.
        cap = 512 if self.n_dev == 1 else min(512, max(n_loc // 2, 1))
        tile = _pick_tile(n_loc, cap, self.audio_decim)
        H8 = _round8(self.arm_taps.shape[1] - 1)
        if tile < H8 or tile < A - 1:
            raise ValueError(
                f"per-device rows {n_loc} give tile {tile} < max(H8 {H8}, "
                f"A-1 {A-1}); use a larger batch")
        warm = 0 if self.n_dev == 1 else tile
        if warm and warm < -(-A // self.audio_decim) * self.audio_decim:
            raise ValueError(
                f"warm {warm} rows cannot rebuild the {A}-tap audio state; "
                "use a larger batch")
        self._planes_cfg = (n_rows, tile, warm)
        return tile, warm

    def planes_row_width(self) -> int:
        return 2 * self.nchans

    def init_state_planes(self, n_rows: int) -> PlanesFMState:
        """n_rows: planes rows per global batch (= batch_samples / nchans).
        Must be a multiple of n_dev * audio_decim with enough rows per
        device for one kernel tile."""
        from newsched_tpu.ops.pallas.fm_chain import _round8

        tile, warm = self._planes_setup(n_rows)
        M = self.nchans
        A = len(self.audio_taps)
        H8 = _round8(self.arm_taps.shape[1] - 1)
        hr = warm + H8
        dev2 = NamedSharding(self.mesh, P(self.axis, None))
        carry = jax.device_put(
            jnp.zeros((self.n_dev * hr, 2 * M), jnp.float32), dev2)
        if self.n_dev == 1:
            return PlanesFMState(
                carry=carry,
                prev=jnp.zeros((1, 2 * M), jnp.float32),
                tail=jnp.zeros((A - 1, 2 * M), jnp.float32),
            )
        rep = NamedSharding(self.mesh, P(None, None))
        return PlanesFMState(
            carry=carry,
            prev=jax.device_put(jnp.zeros((1, 2 * M), jnp.float32), rep),
            tail=jax.device_put(jnp.zeros((A - 1, 2 * M), jnp.float32), rep),
        )

    def step_planes(self, xrows: jax.Array, state: PlanesFMState):
        """One batch through the fused mega-kernel on the planes stream.

        xrows: (n_rows, 2M) f32 planes rows, sharded (or shardable)
        P(axis, None). Returns (audio (n_rows // audio_decim, M) f32 —
        time-sharded P(axis, None) — and the next PlanesFMState).
        """
        from newsched_tpu.ops.pallas.fm_chain import fm_chain_step_planes

        n_rows = int(xrows.shape[0])
        tile, warm = self._planes_setup(n_rows)
        M = self.nchans
        A = len(self.audio_taps)
        c_fold = self.c_fold
        ataps = self.audio_taps
        decim = self.audio_decim
        gain = np.float32(self.demod_gain)
        precision = self.chain_precision
        interp = self.interpret

        if self.n_dev == 1:
            hr = int(state.carry.shape[0])
            aud, prev, tail = fm_chain_step_planes(
                xrows, state.carry, state.prev, state.tail, c_fold, ataps,
                decim, float(gain), warm=0, tile=tile,
                interpret=self.interpret, precision=precision)
            new_carry = (xrows[-hr:] if n_rows >= hr
                         else jnp.concatenate([state.carry, xrows])[-hr:])
            return aud, PlanesFMState(carry=new_carry, prev=prev, tail=tail)

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        axis_name = self.axis

        def spmd(xr, carry):
            # xr: (n_loc, 2M) local rows; carry: (warm+H8, 2M) local.
            halo, new_carry = time_halo(xr, carry, axis_name)
            z1 = jnp.zeros((1, 2 * M), jnp.float32)
            zt = jnp.zeros((A - 1, 2 * M), jnp.float32)
            aud, _, _ = fm_chain_step_planes(
                xr, halo, z1, zt, c_fold, ataps, decim, float(gain),
                warm=warm, tile=tile, interpret=interp, precision=precision)
            return aud, new_carry

        P2 = P(axis_name, None)
        # check_vma=False: pallas_call's out_shape carries no varying-mesh-
        # axes annotation, which the default shard_map validation rejects.
        aud, new_carry = shard_map(
            spmd, mesh=self.mesh, in_specs=(P2, P2), out_specs=(P2, P2),
            check_vma=False,
        )(xrows, state.carry)
        return aud, state._replace(carry=new_carry)

    def planes_input_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis, None))

    # -- complex-encoded boundary (axon TPU: complex64 cannot cross program
    # boundaries; see utils/cplx.py) ------------------------------------
    def init_state_enc(self):
        """Encoded initial state built WITHOUT any eager complex op."""
        from newsched_tpu.utils.cplx import ComplexParts

        M = self.nchans
        A = len(self.audio_taps)
        H = self.ntaps - 1
        dev = NamedSharding(self.mesh, P(self.axis))
        dev2 = NamedSharding(self.mesh, P(self.axis, None))

        def zf(shape, shard):
            return jax.device_put(jnp.zeros(shape, jnp.float32), shard)

        return ShardedFMState(
            pfb_carry=ComplexParts(zf((self.n_dev * H,), dev), zf((self.n_dev * H,), dev)),
            demod_prev=ComplexParts(zf((M,), dev), zf((M,), dev)),
            audio_tail=zf((M, A - 1), dev2),
        )

    def step_enc(self, x_parts, state_enc):
        """Encoded-boundary step: x_parts is ComplexParts of f32 (B,) planes;
        state_enc an encoded ShardedFMState. Returns (audio f32, state_enc)."""
        from newsched_tpu.utils import cplx

        x = cplx.decode(x_parts)
        audio, new_state = self.step(x, cplx.decode(state_enc))
        return audio, cplx.encode(new_state)

    def batch_multiple(self) -> int:
        return self.n_dev * self.nchans * self.audio_decim

    def min_batch(self) -> int:
        """Smallest legal batch: each device's segment must be >= ntaps-1 (the
        halo a single ppermute can cover) and a multiple of M * audio_decim."""
        unit = self.nchans * self.audio_decim
        seg = -(-(self.ntaps - 1) // unit) * unit
        return self.n_dev * max(seg, unit)

    def input_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis))
