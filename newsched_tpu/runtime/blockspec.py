"""Declarative YAML block descriptors — the analog of the reference's
blockbuilder codegen pipeline (utils/blockbuilder + per-block .yml,
SURVEY.md §3.5).

The reference parses a YAML descriptor and Jinja2-generates the public
class, factory, pybind bindings, and GRC metadata, leaving only work() to
hand-write. Here the descriptor IS the runtime spec: ``block_from_yaml``
builds a Block subclass at import time — ports, parameters, rate — and
takes the work kernel either as a Python callable or, for elementwise
blocks, as a jnp expression string in the descriptor itself (covering the
large class of generated one-liner blocks: add_const, multiply_const,
conjugate, ...).

Descriptor shape (mirrors the reference's file_format 1):

    module: math
    block: scale_offset
    label: Scale & Offset
    blocktype: sync_block
    parameters:
      - id: k
        dtype: rf32
        default: 2.0
        settable: true
    ports:
      - {domain: stream, id: in,  direction: input,  type: cf32}
      - {domain: stream, id: out, direction: output, type: cf32}
    relative_rate: "1"          # optional Fraction string
    expr: "in_ * k"             # optional elementwise kernel
"""

from __future__ import annotations

from fractions import Fraction
from typing import Callable

import numpy as np
import yaml

import jax.numpy as jnp

from newsched_tpu.runtime.block import Block
from newsched_tpu.utils.dtypes import port_dtype

_DTYPES = {
    "rf32": np.float32,
    "cf32": np.complex64,
    "ri32": np.int32,
    "ri16": np.int16,
    "size": np.int32,
    "float": np.float32,
    "double": np.float32,
}


def _make_expr_work(expr: str, out_port: str):
    code = compile(expr, "<block expr>", "eval")

    def work(self, state, ins, params, nout):
        ns = {"jnp": jnp, "np": np}
        for k, v in ins.items():
            ns[k] = v
            ns[k + "_"] = v  # `in` is a keyword; expose `in_`
        ns.update(params)
        return state, {out_port: eval(code, ns)}

    return work


def block_from_yaml(descriptor: str, work: Callable | None = None) -> type[Block]:
    """Build a Block subclass from a YAML descriptor string or file path.

    `work(self, state, ins, params, nout)` overrides any `expr` in the
    descriptor; one of the two must be provided.
    """
    if "\n" not in descriptor and descriptor.endswith((".yml", ".yaml")):
        with open(descriptor) as fh:
            spec = yaml.safe_load(fh)
    else:
        spec = yaml.safe_load(descriptor)

    name = spec["block"]
    ports = spec.get("ports", [])
    params = spec.get("parameters", [])
    rate = Fraction(str(spec.get("relative_rate", "1")))
    expr = spec.get("expr")
    if work is None and expr is None:
        raise ValueError(f"block {name}: provide a work callable or an expr")

    out_ports = [p for p in ports if p["direction"] == "output"]
    work_fn = work or _make_expr_work(expr, out_ports[0]["id"])

    def __init__(self, name_=None, **overrides):
        Block.__init__(self, name_)
        for p in ports:
            vlen = tuple(p.get("shape", ()) or ())
            if p["direction"] == "input":
                self.add_input(p["id"], port_dtype(p["type"]), vlen)
            else:
                self.add_output(p["id"], port_dtype(p["type"]), vlen)
        for prm in params:
            default = overrides.get(prm["id"], prm.get("default"))
            if default is None:
                raise ValueError(f"{name}: parameter {prm['id']} needs a value")
            self.declare_param(
                prm["id"], default,
                dtype=_DTYPES.get(prm.get("dtype", "float"), np.float32),
                settable=bool(prm.get("settable", True)),
                doc=prm.get("label", ""),
            )

    cls = type(name, (Block,), {
        "__init__": __init__,
        "work": work_fn,
        "relative_rate": rate,
        "__doc__": spec.get("label", name),
        "yaml_spec": spec,
    })
    return cls


def load_module(yaml_dir: str) -> dict[str, type[Block]]:
    """Load every .yml descriptor in a directory (the reference's per-module
    build step)."""
    import glob
    import os

    out = {}
    for path in sorted(glob.glob(os.path.join(yaml_dir, "*.yml"))):
        cls = block_from_yaml(path)
        out[cls.__name__] = cls
    return out
