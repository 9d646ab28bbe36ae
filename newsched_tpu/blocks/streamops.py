"""Stream restructuring blocks — reference blocklib/streamops: delay,
skiphead, keep_one_in_n, keep_m_in_n, repeat, interleave, deinterleave,
stream_to_vector, vector_to_stream.

All are static-shape reindexing; the interesting ones carry small state
(delay line) or change rate (declared as Fractions so the compiler sizes
batches)."""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from newsched_tpu.runtime.block import Block, SyncBlock
from newsched_tpu.utils.dtypes import port_dtype


class delay(SyncBlock):
    """Delay by d items (zeros first) — reference streamops::delay."""

    def __init__(self, d: int, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.d = int(d)
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def init_state(self, nin, nout):
        return {"line": jnp.zeros((self.d,) + self.vlen, self.dtype.jnp_dtype)}

    def work(self, state, ins, params, nout):
        x = ins["in"]
        if self.d == 0:
            return state, {"out": x}
        full = jnp.concatenate([state["line"], x])
        return {"line": full[-self.d:]}, {"out": full[: x.shape[0]]}


class skiphead(Block):
    """Drop the first n items (reference streamops::skiphead).

    Advancing a stream needs lookahead, so the block emits the advanced
    stream with one batch of latency: y_b = [x_{b-1}[n:], x_b[:n]]. The
    whole first output batch is garbage; the block declares it as
    ``lead_items`` and the compiler/runner trim it at the sinks (the
    static-shape replacement for the reference's dynamic consume-without-
    produce).
    """

    def __init__(self, n: int, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.n_skip = int(n)
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def finite_items(self, in_bound: int | None) -> int | None:
        return None if in_bound is None else max(in_bound - self.n_skip, 0)

    def lead_items(self, in_lead: int, nin: int, nout: int) -> int:
        if self.n_skip == 0:
            return in_lead
        if self.n_skip >= nin:
            raise ValueError(
                f"{self.name}: skip count {self.n_skip} must be < batch items "
                f"{nin}; raise batch_size"
            )
        return in_lead + nout  # one full batch of startup garbage

    def init_state(self, nin, nout):
        return {"tail": jnp.zeros((nin - self.n_skip,) + self.vlen, self.dtype.jnp_dtype)}

    def work(self, state, ins, params, nout):
        x = ins["in"]
        if self.n_skip == 0:
            return state, {"out": x}
        out = jnp.concatenate([state["tail"], x[: self.n_skip]])
        return {"tail": x[self.n_skip :]}, {"out": out}


class keep_one_in_n(Block):
    """Output every n-th item (reference streamops::keep_one_in_n)."""

    def __init__(self, n: int, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.n = int(n)
        self.relative_rate = Fraction(1, self.n)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def work(self, state, ins, params, nout):
        # GR keeps the LAST of each group of n.
        return state, {"out": ins["in"][self.n - 1 :: self.n]}


class keep_m_in_n(Block):
    """Keep first m of every n items (reference streamops::keep_m_in_n)."""

    def __init__(self, m: int, n: int, offset: int = 0, dtype="cf32", name=None):
        super().__init__(name)
        self.m, self.n, self.offset = int(m), int(n), int(offset)
        if not 0 < self.m <= self.n or self.offset + self.m > self.n:
            raise ValueError("need 0 < m <= n and offset+m <= n")
        self.relative_rate = Fraction(self.m, self.n)
        self.add_input("in", dtype)
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        x = ins["in"]
        groups = x.reshape(-1, self.n)
        return state, {"out": groups[:, self.offset : self.offset + self.m].reshape(-1)}


class repeat(Block):
    """Repeat each item n times (reference streamops::repeat)."""

    def __init__(self, n: int, dtype="cf32", name=None):
        super().__init__(name)
        self.n = int(n)
        self.relative_rate = Fraction(self.n, 1)
        self.add_input("in", dtype)
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.repeat(ins["in"], self.n, axis=0)}


class interleave(Block):
    """N streams -> one stream, round-robin by blocksize items
    (reference streamops::interleave)."""

    def __init__(self, nstreams: int = 2, blocksize: int = 1, dtype="cf32", name=None):
        super().__init__(name)
        self.nstreams, self.blocksize = int(nstreams), int(blocksize)
        self.relative_rate = Fraction(self.nstreams, 1)
        for k in range(self.nstreams):
            self.add_input(f"in{k}", dtype)
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        xs = [ins[f"in{k}"] for k in range(self.nstreams)]
        n = xs[0].shape[0]
        stacked = jnp.stack([x.reshape(n // self.blocksize, self.blocksize) for x in xs], axis=1)
        return state, {"out": stacked.reshape(-1)}


class deinterleave(Block):
    """One stream -> N streams, round-robin (reference
    streamops::deinterleave)."""

    def __init__(self, nstreams: int = 2, blocksize: int = 1, dtype="cf32", name=None):
        super().__init__(name)
        self.nstreams, self.blocksize = int(nstreams), int(blocksize)
        self.relative_rate = Fraction(1, self.nstreams)
        self.add_input("in", dtype)
        for k in range(self.nstreams):
            self.add_output(f"out{k}", dtype)

    def work(self, state, ins, params, nout):
        x = ins["in"]
        g = x.reshape(-1, self.nstreams, self.blocksize)
        return state, {f"out{k}": g[:, k, :].reshape(-1) for k in range(self.nstreams)}


class stream_to_vector(Block):
    """Pack vlen scalars into one vector item (reference
    streamops::stream_to_vector)."""

    def __init__(self, vlen: int, dtype="cf32", name=None):
        super().__init__(name)
        self.vlen = int(vlen)
        self.relative_rate = Fraction(1, self.vlen)
        self.add_input("in", dtype)
        self.add_output("out", dtype, item_shape=(self.vlen,))

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"].reshape(-1, self.vlen)}


class streams_to_vector(Block):
    """N parallel scalar streams -> one stream of N-vectors, item k of the
    output vector taken from input k (reference streamops::streams_to_vector)."""

    def __init__(self, nstreams: int, dtype="cf32", name=None):
        super().__init__(name)
        self.nstreams = int(nstreams)
        for k in range(self.nstreams):
            self.add_input(f"in{k}", dtype)
        self.add_output("out", dtype, item_shape=(self.nstreams,))

    def work(self, state, ins, params, nout):
        xs = [ins[f"in{k}"] for k in range(self.nstreams)]
        return state, {"out": jnp.stack(xs, axis=1)}


class vector_to_streams(Block):
    """One stream of N-vectors -> N parallel scalar streams (reference
    streamops::vector_to_streams)."""

    def __init__(self, nstreams: int, dtype="cf32", name=None):
        super().__init__(name)
        self.nstreams = int(nstreams)
        self.add_input("in", dtype, item_shape=(self.nstreams,))
        for k in range(self.nstreams):
            self.add_output(f"out{k}", dtype)

    def work(self, state, ins, params, nout):
        x = ins["in"]
        return state, {f"out{k}": x[:, k] for k in range(self.nstreams)}


class vector_to_stream(Block):
    """Unpack vector items to scalars (reference streamops::vector_to_stream)."""

    def __init__(self, vlen: int, dtype="cf32", name=None):
        super().__init__(name)
        self.vlen = int(vlen)
        self.relative_rate = Fraction(self.vlen, 1)
        self.add_input("in", dtype, item_shape=(self.vlen,))
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"].reshape(-1)}
