"""FFT block — reference blocklib/fft: stream of (fft_size,) vector items
in, transformed vector items out, with optional window and shift."""

from __future__ import annotations

import numpy as np

from newsched_tpu.ops import fftops
from newsched_tpu.runtime.block import SyncBlock


class fft(SyncBlock):
    def __init__(self, fft_size: int, forward: bool = True, window=None,
                 shift: bool = False, name=None):
        super().__init__(name)
        self.fft_size = int(fft_size)
        self.forward = forward
        self.window = None if window is None else np.asarray(window, dtype=np.float32)
        self.shift = shift
        self.add_input("in", "cf32", item_shape=(self.fft_size,))
        self.add_output("out", "cf32", item_shape=(self.fft_size,))

    def work(self, state, ins, params, nout):
        return state, {"out": fftops.fft(ins["in"], self.forward, self.window, self.shift)}
