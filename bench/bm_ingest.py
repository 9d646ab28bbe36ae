"""Host ingest benchmark — SURVEY.md §8 hard part #5: 100 MS/s complex64
(800 MB/s) from storage into the device.

Pipeline measured: file --(native C++ pump thread)--> double-mapped vmcirc
ring --(read_exact)--> page-aligned staging buffer --(device_put)--> TPU,
with a trivial on-device checksum forcing the transfer. This is the
production path of blocks/fileio.file_source.

Prints one JSON line per stage: ring-only, ring+staging, full-to-device.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILE_MB = 256
BATCH = 1 << 21  # complex64 items per device batch (16 MB)


def main():
    from newsched_tpu.io import StagingBuffer, VmcircRing, native_available

    if not native_available():
        print(json.dumps({"bench": "ingest", "error": "no native toolchain"}))
        return

    path = "/tmp/bm_ingest.bin"
    nbytes = FILE_MB << 20
    if not (os.path.exists(path) and os.path.getsize(path) == nbytes):
        rng = np.random.default_rng(0)
        with open(path, "wb") as fh:
            chunk = rng.standard_normal(1 << 20).astype(np.float32).tobytes()
            for _ in range(nbytes // len(chunk)):
                fh.write(chunk)
    # warm page cache (ingest-at-rate assumes storage keeps up; this
    # measures the framework path, not the disk)
    with open(path, "rb") as fh:
        while fh.read(1 << 24):
            pass

    n_items = nbytes // 8  # complex64

    def run(stage: str) -> float:
        ring = VmcircRing(1 << 26)
        staging = StagingBuffer((BATCH,), np.complex64)
        if stage == "device":
            import jax
            import jax.numpy as jnp

            from newsched_tpu.utils.cplx import ComplexParts

            @jax.jit
            def consume(re, im):
                return jnp.sum(re) + jnp.sum(im)

        t0 = time.perf_counter()
        ring.start_file_pump(path)
        done = 0
        acc = 0.0
        while done < n_items:
            take = min(BATCH, n_items - done)
            ok = ring.read_exact(staging.array[:take].view(np.complex64))
            done += take
            if stage == "ring":
                continue
            re = np.ascontiguousarray(staging.array[:take].real)
            im = np.ascontiguousarray(staging.array[:take].imag)
            if stage == "device":
                acc = consume(jnp.asarray(re), jnp.asarray(im))
        if stage == "device":
            import jax

            jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
        ring.stop_pump()
        return nbytes / dt

    import jax.numpy as jnp  # noqa: F401 (imported in run for the device stage)

    for stage in ("ring", "staging", "device"):
        bps = min(run(stage) for _ in range(2))
        print(json.dumps({
            "bench": f"ingest_{stage}",
            "MBps": round(bps / 1e6, 1),
            "Msps_cf32": round(bps / 8e6, 1),
            "target_MBps": 800.0,
        }), flush=True)


if __name__ == "__main__":
    main()
