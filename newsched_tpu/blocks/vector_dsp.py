"""Vector-stream DSP blocks: per-channel kernels over (M,)-vector items.

The reference runs one block chain per channel after a channelizer (its
GRC-level fanout of M demod chains); here a single block processes all M
channels as one batched kernel — the per-channel axis IS the hardware
vector lane / mesh axis, which is the whole point of the TPU rebuild
(SURVEY.md §3.6 "channel fan-out -> data parallelism over channels").
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from newsched_tpu.ops import fir as fir_ops
from newsched_tpu.runtime.block import Block


class vector_quad_demod(Block):
    """Quadrature/FM demod applied per channel on (M,)-vector items:
    cf32[(M,)] -> rf32[(M,)]."""

    def __init__(self, nchans: int, gain: float = 1.0, name=None):
        super().__init__(name)
        self.nchans = int(nchans)
        self.add_input("in", "cf32", item_shape=(self.nchans,))
        self.add_output("out", "rf32", item_shape=(self.nchans,))
        self.declare_param("gain", gain, dtype=np.float32)

    def init_state(self, nin, nout):
        return {"prev": jnp.zeros((self.nchans,), jnp.complex64)}

    def work(self, state, ins, params, nout):
        x = ins["in"]  # (n, M)
        xprev = jnp.concatenate([state["prev"][None, :], x[:-1]], axis=0)
        p = jnp.conj(xprev) * x
        y = jnp.arctan2(jnp.imag(p), jnp.real(p)) * params["gain"]
        return {"prev": x[-1]}, {"out": y.astype(jnp.float32)}


class vector_fir(Block):
    """Shared-taps FIR (+decimation) applied per channel on vector items:
    the audio filter stage of a channelized receiver. State is a per-channel
    tail; compute vmaps the streaming FIR kernel over the channel axis."""

    def __init__(self, nchans: int, taps, decim: int = 1, dtype="rf32",
                 method: str = "auto", name=None):
        super().__init__(name)
        self.nchans = int(nchans)
        self.taps = np.asarray(taps)
        self.decim = int(decim)
        self.method = method
        self.relative_rate = Fraction(1, self.decim)
        from newsched_tpu.utils.dtypes import port_dtype

        d = port_dtype(dtype)
        self.dtype = d
        self.add_input("in", d, item_shape=(self.nchans,))
        self.add_output("out", d, item_shape=(self.nchans,))

    def init_state(self, nin, nout):
        ntaps = len(self.taps)
        return fir_ops.FirState(
            tail=jnp.zeros((self.nchans, max(ntaps - 1, 0)), self.dtype.jnp_dtype)
        )

    def work(self, state, ins, params, nout):
        x = ins["in"].T  # (M, n)
        taps = self.taps

        def one(tail, xc):
            st, y = fir_ops.fir_filter(taps, fir_ops.FirState(tail=tail), xc,
                                       decim=self.decim, method=self.method)
            return st.tail, y

        tails, ys = jax.vmap(one)(state.tail, x)
        return fir_ops.FirState(tail=tails), {"out": ys.T}


class channel_select(Block):
    """Pick one channel from a vector stream: cf32[(M,)] -> cf32 scalar
    items (utility for tests and single-channel taps off a channelizer)."""

    def __init__(self, nchans: int, channel: int, dtype="cf32", name=None):
        super().__init__(name)
        self.channel = int(channel)
        from newsched_tpu.utils.dtypes import port_dtype

        d = port_dtype(dtype)
        self.add_input("in", d, item_shape=(int(nchans),))
        self.add_output("out", d)

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"][:, self.channel]}
