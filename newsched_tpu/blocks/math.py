"""Math blocks — reference blocklib/math: add, multiply, add_const,
multiply_const, conjugate, plus the type-converting complex_to_* family
(reference spread these across math/streamops). All elementwise; XLA fuses
them into neighbors, so a chain of these costs one memory pass."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from newsched_tpu.runtime.block import SyncBlock
from newsched_tpu.utils.dtypes import port_dtype


class _elementwise_nary(SyncBlock):
    def __init__(self, nports: int, dtype, name=None):
        super().__init__(name)
        self.nports = nports
        for k in range(nports):
            self.add_input(f"in{k}", dtype)
        self.add_output("out", dtype)


class add(_elementwise_nary):
    """out = sum(inputs) (reference math::add<T>)."""

    def __init__(self, nports: int = 2, dtype="cf32", name=None):
        super().__init__(nports, dtype, name)

    def work(self, state, ins, params, nout):
        acc = ins["in0"]
        for k in range(1, self.nports):
            acc = acc + ins[f"in{k}"]
        return state, {"out": acc}


class multiply(_elementwise_nary):
    """out = prod(inputs) (reference math::multiply<T>)."""

    def __init__(self, nports: int = 2, dtype="cf32", name=None):
        super().__init__(nports, dtype, name)

    def work(self, state, ins, params, nout):
        acc = ins["in0"]
        for k in range(1, self.nports):
            acc = acc * ins[f"in{k}"]
        return state, {"out": acc}


class _const_op(SyncBlock):
    def __init__(self, k, dtype, name=None):
        super().__init__(name)
        d = port_dtype(dtype)
        self.add_input("in", d)
        self.add_output("out", d)
        self.declare_param("k", k, dtype=d.np_dtype, doc="constant operand")


class add_const(_const_op):
    """out = in + k; k settable at runtime without recompile (reference
    math::add_const, the canonical param-change demo block)."""

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"] + params["k"]}


class multiply_const(_const_op):
    """out = in * k (reference math::multiply_const — the canonical
    cpu/cuda dual-impl demo; here one impl serves every backend)."""

    def work(self, state, ins, params, nout):
        return state, {"out": ins["in"] * params["k"]}


class conjugate(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "cf32")

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.conj(ins["in"])}


class complex_to_mag(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "rf32")

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.abs(ins["in"]).astype(jnp.float32)}


class complex_to_mag_squared(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "rf32")

    def work(self, state, ins, params, nout):
        x = ins["in"]
        return state, {"out": (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(jnp.float32)}


class complex_to_real(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "rf32")

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.real(ins["in"]).astype(jnp.float32)}


class complex_to_imag(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "rf32")

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.imag(ins["in"]).astype(jnp.float32)}


class float_to_complex(SyncBlock):
    def __init__(self, name=None):
        super().__init__(name)
        self.add_input("re", "rf32")
        self.add_input("im", "rf32")
        self.add_output("out", "cf32")

    def work(self, state, ins, params, nout):
        import jax

        return state, {"out": jax.lax.complex(ins["re"], ins["im"])}


class abs_blk(SyncBlock):
    """|x| for real streams (reference math::abs)."""

    def __init__(self, dtype="rf32", name=None):
        super().__init__(name)
        self.add_input("in", dtype)
        self.add_output("out", dtype)

    def work(self, state, ins, params, nout):
        return state, {"out": jnp.abs(ins["in"])}
