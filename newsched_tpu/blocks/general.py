"""General stream blocks — reference module ``blocks`` (blocklib/blocks/):
copy, head, null_source/sink, nop/nop_source/nop_sink, vector_source/sink,
throttle, load, fanout, msg_forward.

As in the reference, this module doubles as the test-fixture library
(SURVEY.md §5): vector_source -> DUT -> vector_sink is the canonical QA
pattern; null_* measure throughput; head bounds streams; copy/nop exercise
scheduler paths.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from newsched_tpu.runtime.block import Block, SyncBlock
from newsched_tpu.utils.dtypes import port_dtype


class copy(SyncBlock):
    """Pass-through (reference blocklib/blocks/copy)."""

    def __init__(self, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"]}


class nop(copy):
    """Alias of copy at the graph level; XLA erases it entirely."""


class head(SyncBlock):
    """Let at most n items through, then end the stream (reference
    blocklib/blocks/head). In this runtime the bound is consumed by the
    compiler (exact sink totals + batch count); work is identity."""

    def __init__(self, n: int, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.max_items = int(n)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def finite_items(self, in_bound: int | None) -> int:
        return self.max_items if in_bound is None else min(in_bound, self.max_items)

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"]}


class null_source(Block):
    """Infinite zeros (reference blocklib/blocks/null_source)."""

    def __init__(self, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen)
        self.add_output("out", dtype, vlen)

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.zeros((nout,) + self.vlen, dtype=self.dtype.jnp_dtype)}


class nop_source(null_source):
    pass


class null_sink(Block):
    """Discard, keeping the stream alive with a cheap checksum reduction so
    XLA cannot dead-code-eliminate the upstream chain (the reference's
    null_sink exists for exactly this throughput-measuring role)."""

    collect_is_stream = False  # per-batch checksum scalar, not stream items

    def __init__(self, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.add_input("in", dtype, vlen)
        self.checksum = None

    def work(self, state, ins, params, nout):
        x = ins["in"]
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            c = jnp.sum(jnp.real(x)) + jnp.sum(jnp.imag(x))
        else:
            c = jnp.sum(x.astype(jnp.float32))
        return state, c.astype(jnp.float32)

    def combine_collected(self, acc, collected_host):
        """Fold per-batch checksums incrementally so unbounded runs hold
        O(1) host memory for this sink (runner round-4 memory bound)."""
        s = float(np.sum([np.sum(np.asarray(c)) for c in collected_host]))
        return s if acc is None else acc + s

    def finalize(self, collected, total):
        # `collected` is either the stacked per-batch checksums (bounded
        # runs) or the folded float from combine_collected (unbounded).
        self.checksum = float(np.sum(collected))


class nop_sink(null_sink):
    pass


class vector_source(Block):
    """Emit a fixed host vector, optionally repeating (reference
    blocklib/blocks/vector_source<T>)."""

    def __init__(self, data, repeat: bool = False, dtype=None, vlen=(), tags=None,
                 name=None):
        super().__init__(name)
        self.data = np.asarray(data)
        if dtype is None:
            dtype = self.data.dtype
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen) or self.data.shape[1:]
        self.repeat = repeat
        self._tags_in = list(tags or [])
        if self._tags_in:
            from newsched_tpu.runtime import tags as tags_mod

            self.tag_aware = True
            self.tag_capacity = len(self._tags_in)
            self._tag_offsets = np.asarray([int(t[0]) for t in self._tags_in], np.int32)
            self._tag_keys = np.asarray(
                [tags_mod.REGISTRY.intern(str(t[1])) for t in self._tags_in], np.int32
            )
            vals = np.zeros((len(self._tags_in), tags_mod.VALUE_DIM), np.float32)
            pids = np.zeros((len(self._tags_in),), np.int32)
            for i, t in enumerate(self._tags_in):
                extra = tuple(t[2:])
                numeric = all(isinstance(v, (int, float, np.integer, np.floating))
                              for v in extra)
                if extra and not numeric:
                    # Rich payload (the pmtf-map analog): the object lives in
                    # the host-side registry; only its handle rides the device.
                    obj = extra[0] if len(extra) == 1 else list(extra)
                    pids[i] = tags_mod.PAYLOADS.add(obj)
                else:
                    for j, v in enumerate(extra[: tags_mod.VALUE_DIM]):
                        vals[i, j] = float(v)
            self._tag_values = vals
            self._tag_pids = pids if pids.any() else None
        self.add_output("out", self.dtype, self.vlen)

    def finite_items(self, in_bound) -> int | None:
        return None if self.repeat else len(self.data)

    def init_state(self, nin, nout):
        n = len(self.data)
        if self.repeat:
            arr = self.data
        else:
            # Pad with zeros to a batch multiple so the final partial batch
            # is a plain slice; the runner's sink trimming drops the pad.
            pad = (-n) % nout
            arr = np.concatenate(
                [self.data, np.zeros((pad,) + self.data.shape[1:], self.data.dtype)]
            ) if pad else self.data
        st = {
            "data": jnp.asarray(arr, dtype=self.dtype.jnp_dtype),
            "pos": jnp.zeros((), jnp.int32),
        }
        if self._tags_in:
            st["abs_pos"] = jnp.zeros((), jnp.int32)
        return st

    def work(self, state, ins, params, nout, in_tags=None):
        data, pos = state["data"], state["pos"]
        n = data.shape[0]
        if self.repeat:
            if len(self.data) == nout:
                # Whole buffer per batch: emit it as-is (zero-copy — the
                # bench replay source depends on this).
                out = data
            elif len(self.data) % nout == 0:
                # Batch divides the buffer: pos only ever lands on batch
                # boundaries, so a plain dynamic slice replaces the modular
                # gather (a full-batch gather costs ~3x a contiguous read).
                out = jax.lax.dynamic_slice_in_dim(data, pos, nout, 0)
            else:
                idx = (pos + jnp.arange(nout, dtype=jnp.int32)) % jnp.int32(len(self.data))
                out = jnp.take(data, idx, axis=0)
            new_pos = (pos + nout) % jnp.int32(len(self.data))
        else:
            out = jax.lax.dynamic_slice_in_dim(data, pos, nout, 0)
            new_pos = jnp.minimum(pos + nout, jnp.int32(max(n - nout, 0)))
        new_state = {"data": data, "pos": new_pos}
        if not self._tags_in:
            return new_state, {"out": out}
        # Emit tags whose absolute offset falls in this batch's window.
        # NB: non-repeat pos clamps at the end, so use the true batch start
        # carried via an explicit counter for tag windows.
        start = state["abs_pos"]
        offs = jnp.asarray(self._tag_offsets)
        valid = (offs >= start) & (offs < start + nout)
        from newsched_tpu.runtime.tags import TagBatch

        otags = TagBatch(
            offsets=(offs - start).astype(jnp.int32),
            keys=jnp.asarray(self._tag_keys),
            values=jnp.asarray(self._tag_values),
            valid=valid,
            pids=None if self._tag_pids is None else jnp.asarray(self._tag_pids),
        )
        new_state["abs_pos"] = start + jnp.int32(nout)
        return new_state, {"out": out}, otags


class vector_sink(Block):
    """Collect the stream (and its tags) into host memory (reference
    vector_sink<T> with data()/tags() accessors)."""

    collects_tags = True

    def __init__(self, dtype="cf32", vlen=(), name=None, capacity: int | None = None):
        super().__init__(name)
        self.add_input("in", dtype, vlen)
        # Ring collection: under an UNBOUNDED stream (start()/stop()) the
        # runner retains only enough batches to cover the last `capacity`
        # items and data() returns that trailing window (tag offsets are
        # then relative to the window start). Without a capacity, the
        # runner rejects this sink on unbounded streams — the reference
        # never buffers unboundedly anywhere (SURVEY.md §3.2).
        self.collect_capacity = None if capacity is None else int(capacity)
        self._data: np.ndarray | None = None
        self._tags: list = []

    def work(self, state, ins, params, nout):
        return state, ins["in"]

    def finalize(self, collected, total):
        if isinstance(collected, dict):
            self._tags = collected["tags"]
            collected = collected["data"]
        arr = np.asarray(collected)
        arr = arr[:total] if total is not None else arr
        if self.collect_capacity is not None and total is None:
            arr = arr[-self.collect_capacity:]
        self._data = arr

    def data(self) -> np.ndarray:
        if self._data is None:
            raise RuntimeError(f"{self.name}: flowgraph has not run")
        return self._data

    def tags(self) -> list:
        return self._tags


class throttle(SyncBlock):
    """Pace the stream to items_per_sec on the host (reference
    blocklib/blocks/throttle). Forces loop mode; a no-op on device."""

    def __init__(self, items_per_sec: float, dtype="cf32", vlen=(), name=None):
        super().__init__(name)
        self.pacing = float(items_per_sec)
        self.add_input("in", dtype, vlen)
        self.add_output("out", dtype, vlen)

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"]}


class load(SyncBlock):
    """Synthetic compute load: `iterations` fused multiply-adds per item
    (reference blocklib/blocks/load — scheduler overhead benchmarking)."""

    def __init__(self, iterations: int = 1, dtype="cf32", name=None):
        super().__init__(name)
        self.iterations = int(iterations)
        self.add_input("in", dtype)
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        x = ins["in"]
        y = x
        for _ in range(self.iterations):
            y = y * jnp.asarray(1.0000001, x.dtype) + jnp.asarray(1e-9, x.dtype)
        return state, {"out": y}


class fanout(SyncBlock):
    """1-to-N explicit fanout (reference bench graphs). In this runtime any
    output port may feed multiple edges, so fanout is only needed for
    parity with reference benchmarks."""

    def __init__(self, n: int = 2, dtype="cf32", name=None):
        super().__init__(name)
        self.add_input("in", dtype)
        for k in range(n):
            self.add_output(f"out{k}", dtype)

    def work(self, state, ins, params, nout):
        return state, {p.name: ins["in"] for p in self.outputs}


class msg_forward(Block):
    """Forward messages in -> out (reference blocklib/blocks/msg_forward);
    host-side control-plane block used by message tests."""

    def __init__(self, name=None):
        super().__init__(name)
        self.received: list = []
        self.add_msg_port_in("in", self._handle)
        self.add_msg_port_out("out")

    def _handle(self, msg):
        self.received.append(msg)
        self.post_msg("out", msg)

    def work(self, state, ins, params, nout):
        return state, None
