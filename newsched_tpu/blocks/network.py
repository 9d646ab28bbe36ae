"""Raw socket stream blocks: tcp_source/tcp_sink, udp_source/udp_sink.

The reference's cross-process data plane is ZMQ (blocklib/zmq +
buffer_net_zmq); GNU Radio proper also ships raw TCP/UDP sample transports,
and high-rate SDR front ends commonly deliver IQ over UDP. These blocks
cover that layer with the native host-IO runtime doing the byte moving:

- sources hand their connected socket fd to a C++ pump thread that streams
  it into a double-mapped vmcirc ring (io/native/vmcirc_ring.cpp);
  ``host_pull`` drains fixed-size batches for device staging. Socket IO
  never touches the Python thread.
- sinks push each produced batch into a ring that a C++ drain thread
  writes to the socket (``max_chunk`` = one datagram for UDP), with
  ring-full backpressure (``write_all``).

Falls back to plain Python socket IO when the native toolchain is absent.
Streams are raw little-endian item bytes — no framing; peers agree on
dtype out of band (same contract as GR's udp/tcp blocks). TCP peer close
is EOF; UDP is lossy by nature (a head block bounds the stream).
"""

from __future__ import annotations

import socket

import numpy as np

from newsched_tpu.runtime.block import Block
from newsched_tpu.utils.dtypes import port_dtype

_UDP_PAYLOAD = 32768  # bytes per datagram (safe under the 64 KiB UDP cap)


def _native_ring(ring_bytes):
    from newsched_tpu.io import native_available

    if not native_available():
        return None
    from newsched_tpu.io import VmcircRing

    return VmcircRing(ring_bytes)


class _socket_source(Block):
    host_io = True

    def __init__(self, dtype, ring_bytes, name):
        super().__init__(name)
        self.dtype = port_dtype(dtype)
        self.ring_bytes = ring_bytes
        self.add_output("out", self.dtype)
        self._sock = None
        self._ring = None
        self._leftover = b""

    def _make_socket(self):  # -> connected/bound socket
        raise NotImplementedError

    def start(self):
        self._sock = self._make_socket()
        self._ring = _native_ring(self.ring_bytes)
        if self._ring is not None:
            self._ring.start_fd_pump(self._sock.fileno(), owns_fd=False)

    def stop(self):
        if self._ring is not None:
            self._ring.stop_pump()
            self._ring = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def host_pull(self, nout: int) -> np.ndarray:
        out = np.empty(nout, dtype=self.dtype.np_dtype)
        if self._ring is not None:
            self._ring.read_exact(out)
            return out
        # Python fallback: blocking recv loop
        buf = out.view(np.uint8).reshape(-1)
        want = buf.nbytes
        mv = memoryview(buf)
        got = 0
        if self._leftover:
            take = min(len(self._leftover), want)
            mv[:take] = self._leftover[:take]
            self._leftover = self._leftover[take:]
            got = take
        while got < want:
            chunk = self._sock.recv(min(want - got, 1 << 20))
            if not chunk:
                mv[got:] = b"\x00" * (want - got)
                break
            take = min(len(chunk), want - got)
            mv[got : got + take] = chunk[:take]
            if take < len(chunk):
                self._leftover = chunk[take:]
            got += take
        return out

    def work(self, state, ins, params, nout):
        return state, {"out": ins["host_in"]}


class tcp_source(_socket_source):
    """Receive a raw item stream over TCP.

    mode="server" binds and accepts one peer (start() blocks until the
    sender connects); mode="client" connects out. Peer close = EOF
    (remaining samples zero-filled, totals bounded by head/total_items).
    """

    def __init__(self, port: int, host: str = "127.0.0.1", mode: str = "server",
                 dtype="cf32", ring_bytes: int = 1 << 24, name=None):
        super().__init__(dtype, ring_bytes, name)
        self.port, self.host, self.mode = int(port), host, mode

    def _make_socket(self):
        if self.mode == "server":
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((self.host, self.port))
            srv.listen(1)
            conn, _ = srv.accept()
            srv.close()
            return conn
        s = socket.create_connection((self.host, self.port), timeout=10)
        s.settimeout(None)
        return s


class udp_source(_socket_source):
    """Receive raw item datagrams over UDP (reference analog: GR's
    udp_source; SDR front-end IQ feeds). Datagram payloads are
    concatenated into the stream — no sequence numbers (UDP loss shows up
    as missing samples, exactly like GR)."""

    def __init__(self, port: int, host: str = "0.0.0.0", dtype="cf32",
                 ring_bytes: int = 1 << 24, name=None):
        super().__init__(dtype, ring_bytes, name)
        self.port, self.host = int(port), host

    def _make_socket(self):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
        s.bind((self.host, self.port))
        return s


class _socket_sink(Block):
    host_io = True
    collect_is_stream = True

    def __init__(self, dtype, ring_bytes, max_chunk, name):
        super().__init__(name)
        self.dtype = port_dtype(dtype)
        self.ring_bytes = ring_bytes
        self.max_chunk = max_chunk
        self.add_input("in", self.dtype)
        self._sock = None
        self._ring = None

    def _make_socket(self):
        raise NotImplementedError

    def start(self):
        self._sock = self._make_socket()
        self._ring = _native_ring(self.ring_bytes)
        if self._ring is not None:
            self._ring.start_fd_drain(self._sock.fileno(), owns_fd=False,
                                      max_chunk=self.max_chunk)

    def stop(self):
        if self._ring is not None:
            self._ring.set_eof()
            try:
                self._ring.wait_drained(timeout=10)
            finally:
                self._ring.stop_drain()
                self._ring = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def work(self, state, ins, params, nout):
        return state, ins["in"]

    def host_push(self, batch: np.ndarray) -> None:
        arr = np.ascontiguousarray(batch, dtype=self.dtype.np_dtype)
        if self._ring is not None:
            self._ring.write_all(arr)
            return
        buf = arr.view(np.uint8).reshape(-1).tobytes()
        if self.max_chunk:
            for i in range(0, len(buf), self.max_chunk):
                self._sock.send(buf[i : i + self.max_chunk])
        else:
            self._sock.sendall(buf)

    def finalize(self, collected, total):
        pass  # streamed already via host_push


class tcp_sink(_socket_sink):
    """Send the stream over TCP (mode mirrors tcp_source)."""

    def __init__(self, port: int, host: str = "127.0.0.1", mode: str = "client",
                 dtype="cf32", ring_bytes: int = 1 << 24, name=None):
        super().__init__(dtype, ring_bytes, 0, name)
        self.port, self.host, self.mode = int(port), host, mode

    def _make_socket(self):
        if self.mode == "server":
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((self.host, self.port))
            srv.listen(1)
            conn, _ = srv.accept()
            srv.close()
            return conn
        deadline_tries = 50
        for i in range(deadline_tries):
            try:
                s = socket.create_connection((self.host, self.port), timeout=10)
                s.settimeout(None)
                return s
            except ConnectionRefusedError:
                if i == deadline_tries - 1:
                    raise
                import time

                time.sleep(0.1)


class udp_sink(_socket_sink):
    """Send the stream as UDP datagrams of payload_bytes each."""

    def __init__(self, port: int, host: str = "127.0.0.1",
                 payload_bytes: int = _UDP_PAYLOAD, dtype="cf32",
                 ring_bytes: int = 1 << 24, name=None):
        super().__init__(dtype, ring_bytes, int(payload_bytes), name)
        self.port, self.host = int(port), host

    def _make_socket(self):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 22)
        s.connect((self.host, self.port))  # fixes the peer so write() works
        return s
