"""File IO blocks + the native vmcirc ring (reference: fileio QA +
buffer_cpu_vmcirc unit tests: wrap semantics, pump at EOF)."""

import os
import tempfile

import numpy as np
import pytest

from newsched_tpu import Flowgraph
from newsched_tpu.blocks import fileio, general
from newsched_tpu.io import VmcircRing, native_available
from tests.test_ops_fir import _rand_complex


@pytest.fixture
def tmpfile():
    fd, path = tempfile.mkstemp(suffix=".bin")
    os.close(fd)
    yield path
    os.unlink(path)


def test_native_ring_basic():
    if not native_available():
        pytest.skip("no native toolchain")
    r = VmcircRing(1 << 16)
    assert r.capacity >= 1 << 16
    data = np.arange(1000, dtype=np.float32)
    assert r.write(data) == data.nbytes
    out = np.empty(1000, np.float32)
    assert r.read_into(out) == data.nbytes
    assert np.array_equal(out, data)


def test_native_ring_wrap():
    if not native_available():
        pytest.skip("no native toolchain")
    r = VmcircRing(1 << 12)  # one page
    cap = r.capacity
    chunk = np.arange(cap // 8, dtype=np.float32)  # half capacity in bytes? f32
    total_written = 0
    out_all = []
    # write/read more than 3x capacity to exercise the wrap repeatedly
    for i in range(12):
        block = (chunk + i * len(chunk)).astype(np.float32)
        w = r.write(block)
        assert w == block.nbytes
        out = np.empty(len(block), np.float32)
        assert r.read_into(out) == block.nbytes
        out_all.append(out)
        total_written += w
    got = np.concatenate(out_all)
    expect = np.arange(12 * len(chunk), dtype=np.float32)
    assert np.array_equal(got, expect)
    assert total_written > 3 * cap


def test_file_roundtrip_graph(tmpfile):
    data = _rand_complex(10_000)
    data.tofile(tmpfile)
    fg = Flowgraph(batch_size=2048)
    src = fileio.file_source(tmpfile)
    snk = general.vector_sink()
    fg.connect(src, 0, snk, 0)
    fg.run()
    assert np.array_equal(snk.data(), data)


def test_file_roundtrip_graph_memmap_fallback(tmpfile):
    data = _rand_complex(5_000)
    data.tofile(tmpfile)
    fg = Flowgraph(batch_size=1024)
    src = fileio.file_source(tmpfile, use_native=False)
    snk = general.vector_sink()
    fg.connect(src, 0, snk, 0)
    fg.run()
    assert np.array_equal(snk.data(), data)


def test_file_sink(tmpfile):
    data = _rand_complex(4_000)
    fg = Flowgraph(batch_size=1024)
    src = general.vector_source(data)
    snk = fileio.file_sink(tmpfile)
    fg.connect(src, 0, snk, 0)
    fg.run()
    back = np.fromfile(tmpfile, dtype=np.complex64)
    assert np.array_equal(back, data)


def test_file_pump_streams_large(tmpfile):
    """Pump a file bigger than the ring through it."""
    if not native_available():
        pytest.skip("no native toolchain")
    data = np.arange(1 << 18, dtype=np.float32)  # 1 MB
    data.tofile(tmpfile)
    r = VmcircRing(1 << 14)  # 16 KB ring << file size
    r.start_file_pump(tmpfile, loop=False)
    out = np.empty_like(data)
    ok = r.read_exact(out, timeout=30.0)
    assert ok
    assert np.array_equal(out, data)
    r.stop_pump()
