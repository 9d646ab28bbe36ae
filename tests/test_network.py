"""Raw TCP/UDP stream block tests — loopback sockets stand in for the
network (SURVEY.md §5 distributed-test pattern), native pump/drain threads
exercised when the toolchain is available."""

import threading
import time

import numpy as np
import pytest

from newsched_tpu import Flowgraph
from newsched_tpu.blocks import general, network


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_tcp_roundtrip():
    n, batch = 8192, 1024
    port = _free_port()
    rng = np.random.default_rng(0)
    data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    rx_snk = general.vector_sink()
    rx_err = []

    def rx_body():
        try:
            fg = Flowgraph(batch_size=batch)
            src = network.tcp_source(port, mode="server")
            hd = general.head(n)
            fg.connect(src, 0, hd, 0)
            fg.connect(hd, 0, rx_snk, 0)
            fg.run()
        except Exception as e:  # surfaced below
            rx_err.append(e)

    rx = threading.Thread(target=rx_body, daemon=True)
    rx.start()

    fg = Flowgraph(batch_size=batch)
    src = general.vector_source(data)
    snk = network.tcp_sink(port, mode="client")
    fg.connect(src, 0, snk, 0)
    fg.run()

    rx.join(timeout=30)
    assert not rx.is_alive(), "receiver did not finish"
    if rx_err:
        raise rx_err[0]
    np.testing.assert_array_equal(rx_snk.data(), data)


def test_udp_roundtrip():
    n, batch = 4096, 512
    port = _free_port()
    rng = np.random.default_rng(1)
    data = rng.standard_normal(n).astype(np.float32)

    rx_snk = general.vector_sink(dtype="rf32")
    rx_err = []
    rx_src = network.udp_source(port, dtype="rf32")

    def rx_body():
        try:
            fg = Flowgraph(batch_size=batch)
            hd = general.head(n, dtype="rf32")
            fg.connect(rx_src, 0, hd, 0)
            fg.connect(hd, 0, rx_snk, 0)
            fg.run()
        except Exception as e:
            rx_err.append(e)

    rx = threading.Thread(target=rx_body, daemon=True)
    rx.start()
    # wait for the receiver socket to be bound before sending (UDP has no
    # handshake; loopback delivery is reliable once bound)
    deadline = time.monotonic() + 10
    while rx_src._sock is None:
        if time.monotonic() > deadline:
            pytest.fail("udp_source never bound")
        time.sleep(0.01)

    fg = Flowgraph(batch_size=batch)
    src = general.vector_source(data, dtype="rf32")
    snk = network.udp_sink(port, dtype="rf32", payload_bytes=1024)
    fg.connect(src, 0, snk, 0)
    fg.run()

    rx.join(timeout=30)
    assert not rx.is_alive(), "receiver did not finish"
    if rx_err:
        raise rx_err[0]
    np.testing.assert_array_equal(rx_snk.data(), data)


def test_native_ring_fd_pump_and_drain():
    """Native layer unit test: pipe -> ring (pump), ring -> file (drain),
    paced drain rate."""
    from newsched_tpu.io import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    import os
    import tempfile

    from newsched_tpu.io import VmcircRing

    data = np.arange(10000, dtype=np.int32)

    # fd pump: pipe -> ring
    r = VmcircRing(1 << 16)
    rd, wr = os.pipe()
    r.start_fd_pump(rd, owns_fd=True)
    os.write(wr, data.tobytes())
    os.close(wr)
    out = np.empty(10000, np.int32)
    assert r.read_exact(out)
    np.testing.assert_array_equal(out, data)

    # drain with backpressure (ring much smaller than payload)
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        r2 = VmcircRing(1 << 14)
        r2.start_file_drain(f.name)
        for _ in range(4):
            r2.write_all(data)
        r2.set_eof()
        r2.wait_drained()
        assert r2.drain_bytes == 4 * data.nbytes
        got = np.fromfile(f.name, np.int32)
        np.testing.assert_array_equal(got, np.tile(data, 4))
