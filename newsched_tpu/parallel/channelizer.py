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
                 chain_precision="split3"):
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
        if chain_method == "auto":
            # The fused full-chain kernel (ops/pallas/fm_chain.py) fuses
            # demod into the per-device pass BEFORE the corner turn, so it
            # only applies single-device; multi-device keeps the staged
            # corner-turn layout. Constraints mirror the kernel's.
            chain_method = ("megakernel"
                            if (self.n_dev == 1 and pfb_ops._pallas_ok(M)
                                and 512 % decim == 0 and A - 1 <= 512)
                            else "stages")
        self.chain_method = chain_method

        if self.n_dev == 1 and chain_method == "megakernel":
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
                    precision=chain_precision)
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
