"""The LIVE flagship (round 4): the whole 64-channel FM channelizer chain
as ONE source kernel that generates its own Gaussian input per batch with
the chip's hardware PRNG — no replay buffer, zero input HBM traffic
(`models.fm_channelizer(source="live", fused=True)`).

Requires a TPU backend (the Mosaic PRNG has no CPU lowering); on CPU this
example falls back to the threefry noise source feeding the same fused
chain in interpret mode, so it stays runnable everywhere.

`python examples/live_flagship.py` — prints the audio stats of a short
live run and, on TPU, a rough throughput figure.
"""

import time

import numpy as np

import jax

from newsched_tpu.models import fm_channelizer

NCHANS = 64
N_OUT = 2048  # audio-rate vector samples


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        fg, blocks = fm_channelizer(nchans=NCHANS, n_samples=N_OUT,
                                    sink="vector", batch_size=1 << 18,
                                    source="live", fused=True)
    else:
        print("no TPU attached: threefry live source, interpret mode")
        fg, blocks = fm_channelizer(nchans=NCHANS, n_samples=N_OUT,
                                    sink="vector", batch_size=1 << 18,
                                    fused=True, interpret=True)
    t0 = time.perf_counter()
    fg.run()
    dt = time.perf_counter() - t0
    audio = blocks["sink"].data()
    assert audio.shape == (N_OUT, NCHANS) and np.isfinite(audio).all()
    wideband = N_OUT * NCHANS * 8  # audio_decim=8
    print(f"live flagship: {audio.shape} audio in {dt:.2f}s "
          f"(~{wideband / dt / 1e6:.0f} Msps incl. compile; the bench.py "
          f"two-point fit reports the true on-device rate)")
    print(f"audio rms per channel (first 8): "
          f"{np.sqrt(np.mean(audio**2, axis=0))[:8].round(3)}")


if __name__ == "__main__":
    main()
