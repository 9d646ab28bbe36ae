"""Ambient mesh scope for ops compiled under a graph mesh.

The graph compiler (compile.py) pins every stream EDGE to a time-sharded
layout and lets XLA's SPMD partitioner handle the kernels' interiors. A few
kernels need one extra interior annotation — e.g. overlap-save's segment
matrix must be re-pinned before the FFT or XLA's CPU backend assigns the
FFT operand a non-dim0-major layout its fft thunk rejects. Ops consult this
scope (active only while the compiler traces a mesh-bound step) instead of
threading mesh arguments through every kernel signature.
"""

from __future__ import annotations

import contextlib
import threading

_tls = threading.local()


@contextlib.contextmanager
def mesh_scope(mesh, axis: str):
    prev = getattr(_tls, "scope", None)
    _tls.scope = (mesh, axis)
    try:
        yield
    finally:
        _tls.scope = prev


def current() -> tuple | None:
    """(mesh, time_axis) if tracing under a graph mesh, else None."""
    return getattr(_tls, "scope", None)


def pin_leading(a):
    """Constrain `a` to be sharded over the ambient time axis on dim 0
    (no-op outside a mesh scope or when dim 0 doesn't divide)."""
    scope = current()
    if scope is None:
        return a
    mesh, axis = scope
    n = mesh.shape[axis]
    if getattr(a, "ndim", 0) < 1:
        return a
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    # Indivisible leading dim: pin replicated — still forces the partitioner
    # to materialize a fresh default-layout buffer, which is the point.
    lead = axis if a.shape[0] % n == 0 else None
    spec = PartitionSpec(lead, *([None] * (a.ndim - 1)))
    return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))
