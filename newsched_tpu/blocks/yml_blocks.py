"""Blocks built from shipped YAML descriptors at import time — the
runtime analog of the reference's blockbuilder step (per-block .yml in
blocklib/<module>/<name>/<name>.yml compiled by utils/blockbuilder at
build time; SURVEY.md §3.5). The descriptors live in blocks/yml/ and are
turned into Block classes by runtime/blockspec.py; `expr:` kernels cover
the generated-elementwise class of blocks exactly as the reference's
templates did.

    from newsched_tpu.blocks import yml_blocks
    blk = yml_blocks.multiply_const_y(k=2.0)
"""

from __future__ import annotations

import os

from newsched_tpu.runtime.blockspec import load_module

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "yml")

_CLASSES = load_module(_DIR)
globals().update(_CLASSES)

__all__ = sorted(_CLASSES)
