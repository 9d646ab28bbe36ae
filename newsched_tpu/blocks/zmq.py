"""ZMQ stream transport blocks — reference blocklib/zmq (pub_sink,
sub_source, push_sink, pull_source) and the data plane of the distributed
runtime (buffer_net_zmq).

Wire format (the pmtf-serialization analog, host-side): each batch is one
zmq message of [json header][raw item bytes]. The header carries dtype,
count, an eof flag (the in-band DONE of the reference's flowgraph_monitor
protocol), and the batch's tags as (offset, key, values) triples — which
is exactly how the reference serializes tags across process boundaries.

These are host-boundary blocks: the sending graph's push/pub sink streams
every batch as it is produced (runner host_push hook); the receiving
graph's pull/sub source feeds host_pull. Back-pressure: PUSH/PULL blocks
when the peer's high-water mark is reached — the cross-process analog of
ring-buffer back-pressure.
"""

from __future__ import annotations

import json

import numpy as np

from newsched_tpu.runtime.block import Block
from newsched_tpu.utils.dtypes import port_dtype


def _encode_batch(arr: np.ndarray, tags=None, eof: bool = False) -> bytes:
    header = {
        "dtype": arr.dtype.str,
        "count": int(arr.shape[0]),
        "shape": list(arr.shape),
        "eof": bool(eof),
        "tags": [[int(t[0]), str(t[1]), list(map(float, t[2]))] for t in (tags or [])],
    }
    hb = json.dumps(header).encode()
    return len(hb).to_bytes(4, "little") + hb + arr.tobytes()


def _decode_batch(msg: bytes):
    hlen = int.from_bytes(msg[:4], "little")
    header = json.loads(msg[4 : 4 + hlen].decode())
    payload = np.frombuffer(msg[4 + hlen :], dtype=np.dtype(header["dtype"]))
    payload = payload.reshape(header["shape"]) if header["shape"] else payload
    return header, payload


class _zmq_sink_base(Block):
    host_io = True
    collect_is_stream = True

    def __init__(self, address: str, sock_type: str, bind: bool, dtype, vlen, name):
        super().__init__(name)
        self.address = address
        self.sock_type = sock_type
        self.bind = bind
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen)
        self.add_input("in", self.dtype, self.vlen)
        self._sock = None
        self._ctx = None

    def start(self):
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(getattr(zmq, self.sock_type))
        if self.bind:
            self._sock.bind(self.address)
        else:
            self._sock.connect(self.address)

    def stop(self):
        if self._sock is not None:
            try:
                self._sock.send(_encode_batch(
                    np.empty((0,) + self.vlen, self.dtype.np_dtype), eof=True))
            except Exception:
                pass
            self._sock.close(linger=1000)
            self._sock = None

    def work(self, state, ins, params, nout):
        return state, ins["in"]

    def host_push(self, batch: np.ndarray) -> None:
        self._sock.send(_encode_batch(np.asarray(batch)))

    def finalize(self, collected, total):
        pass  # streamed already via host_push


class push_sink(_zmq_sink_base):
    """PUSH socket sink (reference zmq::push_sink); pairs with pull_source."""

    def __init__(self, address: str, bind: bool = True, dtype="cf32", vlen=(), name=None):
        super().__init__(address, "PUSH", bind, dtype, vlen, name)


class pub_sink(_zmq_sink_base):
    """PUB socket sink (reference zmq::pub_sink)."""

    def __init__(self, address: str, bind: bool = True, dtype="cf32", vlen=(), name=None):
        super().__init__(address, "PUB", bind, dtype, vlen, name)


class _zmq_source_base(Block):
    host_io = True

    def __init__(self, address: str, sock_type: str, bind: bool, dtype, vlen, name,
                 timeout_s: float = 30.0):
        super().__init__(name)
        self.address = address
        self.sock_type = sock_type
        self.bind = bind
        self.timeout_s = timeout_s
        self.dtype = port_dtype(dtype)
        self.vlen = tuple(vlen)
        self.add_output("out", self.dtype, self.vlen)
        self._sock = None
        self._residual: np.ndarray | None = None
        self._eof = False

    def start(self):
        import zmq

        ctx = zmq.Context.instance()
        self._sock = ctx.socket(getattr(zmq, self.sock_type))
        self._sock.RCVTIMEO = int(self.timeout_s * 1000)
        if self.sock_type == "SUB":
            self._sock.setsockopt(zmq.SUBSCRIBE, b"")
        if self.bind:
            self._sock.bind(self.address)
        else:
            self._sock.connect(self.address)
        self._residual = np.empty((0,) + self.vlen, self.dtype.np_dtype)
        self._eof = False

    def stop(self):
        if self._sock is not None:
            self._sock.close(linger=0)
            self._sock = None

    def host_pull(self, nout: int) -> np.ndarray:
        out = np.zeros((nout,) + self.vlen, self.dtype.np_dtype)
        got = 0
        res = self._residual
        while got < nout:
            if res.shape[0] > 0:
                take = min(nout - got, res.shape[0])
                out[got : got + take] = res[:take]
                res = res[take:]
                got += take
                continue
            if self._eof:
                break
            header, payload = _decode_batch(self._sock.recv())
            if header["eof"]:
                self._eof = True
                continue
            res = payload.astype(self.dtype.np_dtype, copy=False)
        self._residual = res
        return out

    def work(self, state, ins, params, nout):
        return state, {"out": ins["host_in"]}


class pull_source(_zmq_source_base):
    """PULL socket source (reference zmq::pull_source)."""

    def __init__(self, address: str, bind: bool = False, dtype="cf32", vlen=(),
                 timeout_s: float = 30.0, name=None):
        super().__init__(address, "PULL", bind, dtype, vlen, name, timeout_s)


class sub_source(_zmq_source_base):
    """SUB socket source (reference zmq::sub_source)."""

    def __init__(self, address: str, bind: bool = False, dtype="cf32", vlen=(),
                 timeout_s: float = 30.0, name=None):
        super().__init__(address, "SUB", bind, dtype, vlen, name, timeout_s)
