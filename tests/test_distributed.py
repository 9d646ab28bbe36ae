"""Distributed runtime tests (reference: localhost ZMQ multi-process tests,
SURVEY.md §5 'Distributed' tier — loopback sockets stand in for hosts)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from newsched_tpu import Flowgraph
from newsched_tpu.blocks import general, math as gmath
from newsched_tpu.runtime.distributed import Runtime, partition_flowgraph
from tests.test_ops_fir import _rand_complex


def test_partition_two_groups_threads():
    """One logical graph split across two execution contexts over loopback
    zmq edges, run concurrently; results identical to the fused graph."""
    data = _rand_complex(4096, seed=50)
    fg = Flowgraph(batch_size=512)
    src = general.vector_source(data)
    cp = general.copy()
    mc = gmath.multiply_const(2.0 + 1.0j, dtype="cf32")
    snk = general.vector_sink()
    fg.connect(src, 0, cp, 0)
    fg.connect(cp, 0, mc, 0)
    fg.connect(mc, 0, snk, 0)

    parts = partition_flowgraph(fg, {"head": [src, cp], "tail": [mc, snk]})
    assert len(parts["head"].blocks) == 3  # src, cp, xfer_out
    assert len(parts["tail"].blocks) == 3  # xfer_in, mc, snk
    rt = Runtime(parts, total_items={"tail": len(data)})
    rt.run()
    np.testing.assert_allclose(snk.data(), data * (2.0 + 1.0j), rtol=1e-6)


def test_partition_rejects_unassigned():
    fg = Flowgraph(batch_size=64)
    src = general.null_source()
    snk = general.null_sink()
    fg.connect(src, 0, snk, 0)
    with pytest.raises(ValueError, match="not assigned"):
        partition_flowgraph(fg, {"a": [src]})


RECEIVER_SCRIPT = r"""
import sys, numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from newsched_tpu import Flowgraph
from newsched_tpu.blocks import general, zmq as zb
addr, n, outpath = sys.argv[1], int(sys.argv[2]), sys.argv[3]
fg = Flowgraph(batch_size=512)
src = zb.pull_source(addr, bind=False)
hd = general.head(n)
snk = general.vector_sink()
fg.connect(src, 0, hd, 0)
fg.connect(hd, 0, snk, 0)
fg.run()
np.save(outpath, snk.data())
"""


def test_true_multiprocess_stream():
    """Real process boundary: a child process pulls the stream and writes
    the result; the parent pushes (reference: runtime_proxy two-process
    flowgraph over localhost)."""
    data = _rand_complex(8192, seed=51)
    addr = "tcp://127.0.0.1:53411"
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "rx.npy")
        child = subprocess.Popen(
            [sys.executable, "-c", RECEIVER_SCRIPT, addr, str(len(data)), out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        try:
            from newsched_tpu.blocks import zmq as zb

            fg = Flowgraph(batch_size=512)
            src = general.vector_source(data)
            snk = zb.push_sink(addr, bind=True)
            fg.connect(src, 0, snk, 0)
            fg.run()
            rc = child.wait(timeout=120)
            assert rc == 0, child.stderr.read().decode()[-800:]
            got = np.load(out)
        finally:
            if child.poll() is None:
                child.kill()
    np.testing.assert_array_equal(got, data)
