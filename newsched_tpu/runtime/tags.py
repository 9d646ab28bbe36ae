"""Stream tags — metadata pinned to absolute item offsets.

The reference (runtime/include/gnuradio/tag.h + buffer-side add_tag /
get_tags_in_range + executor propagation per tag_propagation_policy_t)
attaches {offset, pmtf map} tags to ring-buffer positions and remaps them
as the executor crosses rate changes.

TPU-native design: tags travel as a fixed-capacity, mask-validated
TagBatch pytree alongside each batch — SPMD-friendly static shapes, no
dynamic lists on device:

  offsets: int32[K]  item offset RELATIVE to the batch start (absolute
                     offsets are reconstructed on the host as
                     batch_index * items_per_batch + offset, keeping
                     device arithmetic in int32 — streams of any length
                     never overflow because the per-batch offset is small)
  keys:    int32[K]  interned key ids (host-side registry)
  values:  f32[K,VP] small numeric payload (richer payloads live host-side
                     keyed by (key, emission index) — the pmtf analog at
                     the boundary is plain Python)
  valid:   bool[K]

Rate remapping is exact rational arithmetic on offsets:
offset' = offset * num // den (the reference's decimator/interpolator tag
placement convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

VALUE_DIM = 2


class TagBatch(NamedTuple):
    offsets: jax.Array  # int32[K]
    keys: jax.Array  # int32[K]
    values: jax.Array  # f32[K, VALUE_DIM]
    valid: jax.Array  # bool[K]

    @property
    def capacity(self) -> int:
        return self.offsets.shape[0]


def empty(capacity: int) -> TagBatch:
    return TagBatch(
        offsets=jnp.zeros((capacity,), jnp.int32),
        keys=jnp.zeros((capacity,), jnp.int32),
        values=jnp.zeros((capacity, VALUE_DIM), jnp.float32),
        valid=jnp.zeros((capacity,), jnp.bool_),
    )


def remap(tags: TagBatch, num: int, den: int) -> TagBatch:
    """Rational offset remap across a rate change (out = in * num / den)."""
    if num == den:
        return tags
    off = (tags.offsets * num) // den  # int32 safe: offsets are batch-relative
    return tags._replace(offsets=off.astype(jnp.int32))


def shift(tags: TagBatch, delta) -> TagBatch:
    return tags._replace(offsets=(tags.offsets + jnp.int32(delta)).astype(jnp.int32))


def merge(a: TagBatch, b: TagBatch) -> TagBatch:
    """Concatenate two tag batches (capacity grows; compile-time static)."""
    return TagBatch(
        offsets=jnp.concatenate([a.offsets, b.offsets]),
        keys=jnp.concatenate([a.keys, b.keys]),
        values=jnp.concatenate([a.values, b.values]),
        valid=jnp.concatenate([a.valid, b.valid]),
    )


class KeyRegistry:
    """Host-side interning of tag keys (the pmtf-symbol analog)."""

    def __init__(self):
        self._to_id: dict[str, int] = {}
        self._to_key: list[str] = []

    def intern(self, key: str) -> int:
        if key not in self._to_id:
            self._to_id[key] = len(self._to_key)
            self._to_key.append(key)
        return self._to_id[key]

    def name(self, kid: int) -> str:
        return self._to_key[kid]


REGISTRY = KeyRegistry()


class Tag(NamedTuple):
    """Host-side tag: absolute offset + key + payload vector."""

    offset: int
    key: str
    value: tuple


def decode_batches(stacked: TagBatch, items_per_batch: int,
                   registry: KeyRegistry = REGISTRY) -> list[Tag]:
    """Host: stacked per-batch TagBatch (leading n_batches axis) -> absolute
    tags list."""
    offs = np.asarray(stacked.offsets)
    keys = np.asarray(stacked.keys)
    vals = np.asarray(stacked.values)
    valid = np.asarray(stacked.valid)
    out: list[Tag] = []
    n_batches = offs.shape[0]
    for b in range(n_batches):
        for i in np.nonzero(valid[b])[0]:
            out.append(Tag(int(offs[b, i]) + b * items_per_batch,
                           registry.name(int(keys[b, i])),
                           tuple(float(v) for v in vals[b, i])))
    out.sort(key=lambda t: t.offset)
    return out
