"""Graph model, compiler, and streaming runtime.

This package replaces the reference's runtime/ + schedulers/nbt/ layers
(block.h, graph.h, flowgraph.h, scheduler_nbt, thread_wrapper,
graph_executor): instead of OS threads exchanging notifications around ring
buffers, a flowgraph compiles to ONE jitted XLA step per fixed-size time
batch; streaming is `lax.scan` (on-device) or a double-buffered host loop.
"""

from newsched_tpu.runtime.block import Block, Port, param  # noqa: F401
from newsched_tpu.runtime.graph import Flowgraph, Graph, HierBlock  # noqa: F401
from newsched_tpu.runtime.compile import compile_flowgraph  # noqa: F401
