"""ctypes binding for the native double-mapped ring (io/native/vmcirc_ring.cpp).

The shared library is built on first use with the system g++ (no pip, no
pybind11 — plain C ABI + ctypes per the environment's constraints) and
cached next to the source. If no compiler is available the import still
succeeds; callers check native_available().
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_DIR, "vmcirc_ring.cpp")
_SO = os.path.join(_DIR, "libvmcirc.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-500:]}"
    return None


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return
        err = _build()
        if err:
            _build_error = err
            return
        lib = ctypes.CDLL(_SO)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_size_t]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_capacity.restype = ctypes.c_size_t
        lib.ring_capacity.argtypes = [ctypes.c_void_p]
        for f in ("ring_read_avail", "ring_write_avail"):
            getattr(lib, f).restype = ctypes.c_size_t
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        for f in ("ring_read_ptr", "ring_write_ptr"):
            getattr(lib, f).restype = ctypes.POINTER(ctypes.c_uint8)
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.ring_read_commit.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.ring_write_commit.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.ring_read.restype = ctypes.c_size_t
        lib.ring_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_size_t]
        lib.ring_write.restype = ctypes.c_size_t
        lib.ring_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_size_t]
        lib.ring_start_file_pump.restype = ctypes.c_int
        lib.ring_start_file_pump.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                             ctypes.c_int]
        lib.ring_pump_eof.restype = ctypes.c_int
        lib.ring_pump_eof.argtypes = [ctypes.c_void_p]
        lib.ring_stop_pump.argtypes = [ctypes.c_void_p]
        lib.ring_start_fd_pump.restype = ctypes.c_int
        lib.ring_start_fd_pump.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_int]
        lib.ring_set_eof.argtypes = [ctypes.c_void_p]
        lib.ring_start_fd_drain.restype = ctypes.c_int
        lib.ring_start_fd_drain.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_double,
                                            ctypes.c_size_t]
        lib.ring_start_file_drain.restype = ctypes.c_int
        lib.ring_start_file_drain.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                              ctypes.c_double]
        lib.ring_drain_done.restype = ctypes.c_int
        lib.ring_drain_done.argtypes = [ctypes.c_void_p]
        lib.ring_drain_bytes.restype = ctypes.c_uint64
        lib.ring_drain_bytes.argtypes = [ctypes.c_void_p]
        lib.ring_stop_drain.argtypes = [ctypes.c_void_p]
        lib.staging_alloc.restype = ctypes.c_void_p
        lib.staging_alloc.argtypes = [ctypes.c_size_t]
        lib.staging_free.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        _lib = lib


def native_available() -> bool:
    _load()
    return _lib is not None


class VmcircRing:
    """Python handle on the native double-mapped SPSC ring."""

    def __init__(self, min_size: int):
        _load()
        if _lib is None:
            raise RuntimeError(f"native ring unavailable: {_build_error}")
        self._h = _lib.ring_create(min_size)
        if not self._h:
            raise RuntimeError("ring_create failed")
        self.capacity = _lib.ring_capacity(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and _lib is not None:
            _lib.ring_destroy(h)
            self._h = None

    # -- producer --------------------------------------------------------
    def write(self, data: np.ndarray) -> int:
        buf = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        return _lib.ring_write(self._h, ptr, buf.nbytes)

    def write_all(self, data: np.ndarray, timeout: float = 10.0) -> None:
        """Block until every byte is in the ring (backpressure against a
        slow consumer/drain — the reference's blocking write_info path)."""
        import time as _time

        buf = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        want, done = buf.nbytes, 0
        deadline = _time.monotonic() + timeout
        while done < want:
            ptr = buf[done:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            done += _lib.ring_write(self._h, ptr, want - done)
            if done >= want:
                return
            if _time.monotonic() > deadline:
                raise TimeoutError("ring write timed out (consumer stalled)")
            _time.sleep(0.0005)

    def start_file_pump(self, path: str, loop: bool = False) -> None:
        rc = _lib.ring_start_file_pump(self._h, path.encode(), int(loop))
        if rc != 0:
            raise OSError(f"ring_start_file_pump({path}) -> {rc}")

    def start_fd_pump(self, fd: int, owns_fd: bool = False) -> None:
        """Pump an already-open fd (socket, pipe, device) into the ring on a
        native thread. Python keeps fd ownership unless owns_fd."""
        rc = _lib.ring_start_fd_pump(self._h, fd, int(owns_fd))
        if rc != 0:
            raise OSError(f"ring_start_fd_pump(fd={fd}) -> {rc}")

    def set_eof(self) -> None:
        """Producer signals end-of-stream (lets a drain pump finish)."""
        _lib.ring_set_eof(self._h)

    def stop_pump(self) -> None:
        _lib.ring_stop_pump(self._h)

    # -- drain (ring -> fd) -----------------------------------------------
    def start_file_drain(self, path: str, rate_bps: float = 0.0) -> None:
        """Native thread drains the ring into a file, optionally paced to
        rate_bps bytes/s (the egress analog of the throttle block)."""
        rc = _lib.ring_start_file_drain(self._h, path.encode(), float(rate_bps))
        if rc != 0:
            raise OSError(f"ring_start_file_drain({path}) -> {rc}")

    def start_fd_drain(self, fd: int, owns_fd: bool = False,
                       rate_bps: float = 0.0, max_chunk: int = 0) -> None:
        """max_chunk bounds bytes per write() call — set it for datagram
        sockets so each write is one UDP packet."""
        rc = _lib.ring_start_fd_drain(self._h, fd, int(owns_fd), float(rate_bps),
                                      int(max_chunk))
        if rc != 0:
            raise OSError(f"ring_start_fd_drain(fd={fd}) -> {rc}")

    @property
    def drain_done(self) -> bool:
        return bool(_lib.ring_drain_done(self._h))

    @property
    def drain_bytes(self) -> int:
        return int(_lib.ring_drain_bytes(self._h))

    def stop_drain(self) -> None:
        _lib.ring_stop_drain(self._h)

    def wait_drained(self, timeout: float = 10.0) -> None:
        """Block until the drain pump has written everything (after set_eof)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while not self.drain_done:
            if _time.monotonic() > deadline:
                raise TimeoutError("ring drain timed out")
            _time.sleep(0.0005)

    @property
    def pump_eof(self) -> bool:
        return bool(_lib.ring_pump_eof(self._h))

    # -- consumer --------------------------------------------------------
    def read_avail(self) -> int:
        return _lib.ring_read_avail(self._h)

    def read_into(self, out: np.ndarray) -> int:
        """Copy up to len(out) bytes worth of items; returns bytes copied."""
        buf = out.view(np.uint8).reshape(-1)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        return _lib.ring_read(self._h, ptr, buf.nbytes)

    def read_exact(self, out: np.ndarray, timeout: float = 10.0) -> bool:
        """Block (spin/sleep) until len(out) bytes are read or EOF/timeout.
        Remaining bytes are zero-filled on EOF."""
        import time as _time

        buf = out.view(np.uint8).reshape(-1)
        want = buf.nbytes
        got = 0
        deadline = _time.monotonic() + timeout
        while got < want:
            ptr = buf[got:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            got += _lib.ring_read(self._h, ptr, want - got)
            if got >= want:
                return True
            if self.pump_eof and self.read_avail() == 0:
                buf[got:] = 0
                return False
            if _time.monotonic() > deadline:
                raise TimeoutError("ring read timed out")
            _time.sleep(0.0005)
        return True

class StagingBuffer:
    """Page-aligned, pre-faulted host buffer for device staging — the
    native allocator tier (reference analog: buffer_properties-driven
    allocation / buffer_cuda_pinned). MAP_POPULATE + MADV_HUGEPAGE keep the
    hot ingest loop free of first-touch faults and TLB churn.

    Exposes a numpy view; reuse one per edge and fill in place
    (``buf.array[:] = ...``) before ``jax.device_put``.
    """

    def __init__(self, shape, dtype):
        _load()
        if _lib is None:
            raise RuntimeError(f"native allocator unavailable: {_build_error}")
        self._dtype = np.dtype(dtype)
        self._shape = tuple(shape) if not isinstance(shape, int) else (shape,)
        self._nbytes = int(np.prod(self._shape)) * self._dtype.itemsize
        self._ptr = _lib.staging_alloc(self._nbytes)
        if not self._ptr:
            raise MemoryError(f"staging_alloc({self._nbytes}) failed")
        raw = (ctypes.c_uint8 * self._nbytes).from_address(self._ptr)
        self.array = np.frombuffer(raw, dtype=self._dtype).reshape(self._shape)

    def __del__(self):
        ptr = getattr(self, "_ptr", None)
        if ptr and _lib is not None:
            self.array = None
            _lib.staging_free(ptr, self._nbytes)
            self._ptr = None
