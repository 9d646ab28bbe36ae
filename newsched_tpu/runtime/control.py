"""Cross-process control plane for distributed flowgraphs (round 4).

The reference's runtime_proxy mirrors scheduler messages — including
param_change actions and msgport_message — between processes over its
custom zmq protocol (SURVEY.md §4.5, §3.1 scheduler-messages row), so a
block living in another process stays reachable mid-run. Here the same
capability is one REP socket per partition:

    process B (runs partition "tail"):
        rt = Runtime(parts, control_addresses={"tail": "tcp://*:5701"})
        rt.run()                # control server thread starts with it

    process A (anyone holding the address):
        ctl = RuntimeClient("tcp://hostB:5701")
        ctl.set_param("mc0", "k", 3.0)      # applied before the next batch
        ctl.post_msg("fwd0", "in", {"cmd": "retune"})
        ctl.stop()

Every request is acknowledged; set_param/post_msg resolve the block BY
NAME inside the partition and go through the ordinary control plane
(Block.set_param -> runner param rebind between batches; runner message
queue -> handler drain), so remote and local control have identical
batch-boundary semantics. Values ride as pickle — the control socket
trusts its peers exactly as the reference's runtime_proxy trusts its
remote runtimes; bind it to loopback/private interfaces.
"""

from __future__ import annotations

import pickle
import threading
import time
from typing import Any

from newsched_tpu.utils.logger import get_logger

log = get_logger("control")


class ControlServer:
    """REP socket serving set_param/post_msg/stop/ping for one partition.

    Runs on its own thread; requests mutate host-side block/runner state,
    which the runner consumes at its existing batch/chunk boundaries."""

    def __init__(self, address: str, resolve_runner, resolve_block):
        """resolve_runner() -> Runner | None (None while starting up);
        resolve_block(name) -> Block | None."""
        import zmq

        self.address = address
        self._resolve_runner = resolve_runner
        self._resolve_block = resolve_block
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(address)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name=f"control-{address}")
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)
        self._sock.close(0)

    def _serve(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(100)):
                continue
            try:
                req = pickle.loads(self._sock.recv())
                rep = self._handle(req)
            except Exception as e:  # malformed frame / handler error
                rep = {"ok": False, "error": repr(e)}
            try:
                self._sock.send(pickle.dumps(rep))
            except Exception:
                log.exception("control reply failed")

    def _wait_runner(self, timeout: float = 10.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            r = self._resolve_runner()
            if r is not None:
                return r
            time.sleep(0.01)
        return None

    def _handle(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True}
        if op == "stop":
            r = self._wait_runner()
            if r is None:
                return {"ok": False, "error": "no runner"}
            r.request_stop()
            return {"ok": True}
        blk = self._resolve_block(req.get("block", ""))
        if blk is None:
            return {"ok": False,
                    "error": f"no block named {req.get('block')!r} here"}
        if op == "set_param":
            blk.set_param(req["param"], req["value"])
            return {"ok": True}
        if op == "get_param":
            return {"ok": True, "value": blk.get_param(req["param"])}
        if op == "post_msg":
            r = self._wait_runner()
            if r is None:
                return {"ok": False, "error": "no runner"}
            r.enqueue_msg(blk, req["port"], req["msg"])
            return {"ok": True}
        return {"ok": False, "error": f"unknown op {op!r}"}


class RuntimeClient:
    """REQ-side handle to a remote partition's ControlServer."""

    def __init__(self, address: str, timeout_ms: int = 5000):
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.setsockopt(zmq.RCVTIMEO, timeout_ms)
        self._sock.setsockopt(zmq.SNDTIMEO, timeout_ms)
        self._sock.setsockopt(zmq.LINGER, 0)
        self._sock.connect(address)

    def _call(self, **req) -> Any:
        self._sock.send(pickle.dumps(req))
        rep = pickle.loads(self._sock.recv())
        if not rep.get("ok"):
            raise RuntimeError(f"remote control failed: {rep.get('error')}")
        return rep.get("value")

    def ping(self) -> None:
        self._call(op="ping")

    def set_param(self, block: str, param: str, value) -> None:
        """Set a runtime parameter on a block in the remote partition;
        applied by its runner before the next batch (same semantics as a
        local Block.set_param mid-run)."""
        self._call(op="set_param", block=block, param=param, value=value)

    def get_param(self, block: str, param: str):
        return self._call(op="get_param", block=block, param=param)

    def post_msg(self, block: str, port: str, msg) -> None:
        """Deliver a message to a remote block's input message port
        (drained by its runner between batches, like local enqueue_msg)."""
        self._call(op="post_msg", block=block, port=port, msg=msg)

    def stop(self) -> None:
        self._call(op="stop")

    def close(self) -> None:
        self._sock.close(0)
