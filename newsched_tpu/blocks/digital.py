"""Digital blocks — reference blocklib/digital (minimal/partial upstream,
SURVEY.md §3.4): constellation objects, symbol mapping/slicing, and a
differential codec. All vectorized; the constellation decoder's
nearest-point search is one small matmul-style distance reduction.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from newsched_tpu.runtime.block import Block, SyncBlock


class Constellation:
    """Constellation object (reference digital::constellation): points +
    bits-per-symbol + nearest-point decision."""

    def __init__(self, points, name: str = "custom"):
        self.points = np.asarray(points, dtype=np.complex64)
        self.name = name
        self.bits_per_symbol = int(np.log2(len(self.points)))
        if 2 ** self.bits_per_symbol != len(self.points):
            raise ValueError("constellation size must be a power of 2")

    @classmethod
    def bpsk(cls):
        return cls([-1 + 0j, 1 + 0j], "bpsk")

    @classmethod
    def qpsk(cls):
        s = 1 / np.sqrt(2)
        return cls([s * (-1 - 1j), s * (-1 + 1j), s * (1 - 1j), s * (1 + 1j)], "qpsk")

    @classmethod
    def psk(cls, m: int):
        k = np.arange(m)
        return cls(np.exp(2j * np.pi * k / m), f"{m}psk")

    @classmethod
    def qam16(cls):
        re, im = np.meshgrid([-3, -1, 1, 3], [-3, -1, 1, 3])
        pts = (re + 1j * im).reshape(-1) / np.sqrt(10)
        return cls(pts, "qam16")

    def decide(self, x):
        """Nearest-point indices for a batch of samples (device)."""
        pts = jnp.asarray(self.points)
        d = jnp.abs(x[:, None] - pts[None, :]) ** 2
        return jnp.argmin(d, axis=1).astype(jnp.int32)


class chunks_to_symbols(SyncBlock):
    """Map symbol indices to constellation points (reference
    digital::chunks_to_symbols / math-level lookup)."""

    def __init__(self, constellation: Constellation, name=None):
        super().__init__(name)
        self.constellation = constellation
        self.add_input("in", "ri32")
        self.add_output("out", "cf32")

    def work(self, state, ins, params, nout):
        pts = jnp.asarray(self.constellation.points)
        return state, {"out": jnp.take(pts, ins["in"].astype(jnp.int32), axis=0)}


class constellation_decoder(SyncBlock):
    """Hard-decision nearest-point decoder (reference
    digital::constellation_decoder_cb)."""

    def __init__(self, constellation: Constellation, name=None):
        super().__init__(name)
        self.constellation = constellation
        self.add_input("in", "cf32")
        self.add_output("out", "ri32")

    def work(self, state, ins, params, nout):
        return state, {"out": self.constellation.decide(ins["in"])}


class binary_slicer(SyncBlock):
    """rf32 -> 0/1 by sign (reference digital::binary_slicer_fb)."""

    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "rf32")
        self.add_output("out", "ri32")

    def work(self, state, ins, params, nout):
        return state, {"out": (ins["in"] >= 0).astype(jnp.int32)}


class diff_encoder(Block):
    """Differential encoder y[n] = (x[n] + y[n-1]) mod M (reference
    digital::diff_encoder). Parallelized: with modular arithmetic the
    recurrence is a prefix sum: y[n] = (cumsum(x)[n] + y[-1]) mod M."""

    def __init__(self, modulus: int, name=None):
        super().__init__(name)
        self.modulus = int(modulus)
        self.add_input("in", "ri32")
        self.add_output("out", "ri32")

    def init_state(self, nin, nout):
        return {"prev": jnp.zeros((), jnp.int32)}

    def work(self, state, ins, params, nout):
        c = jnp.cumsum(ins["in"], dtype=jnp.int32) + state["prev"]
        y = jnp.mod(c, self.modulus).astype(jnp.int32)
        return {"prev": y[-1]}, {"out": y}


class diff_decoder(Block):
    """y[n] = (x[n] - x[n-1]) mod M (reference digital::diff_decoder)."""

    def __init__(self, modulus: int, name=None):
        super().__init__(name)
        self.modulus = int(modulus)
        self.add_input("in", "ri32")
        self.add_output("out", "ri32")

    def init_state(self, nin, nout):
        return {"prev": jnp.zeros((), jnp.int32)}

    def work(self, state, ins, params, nout):
        x = ins["in"]
        xprev = jnp.concatenate([state["prev"][None], x[:-1]])
        y = jnp.mod(x - xprev, self.modulus).astype(jnp.int32)
        return {"prev": x[-1]}, {"out": y}
