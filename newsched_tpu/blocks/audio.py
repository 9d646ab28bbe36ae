"""Audio blocks — reference blocklib/audio (ALSA sink/source).

TPU pods have no sound hardware; the portable capability is WAV-file
backed audio (scipy.io.wavfile), with live playback delegated to whatever
`sounddevice`-style stack exists on the host (import-gated like soapy).
"""

from __future__ import annotations

import numpy as np

from newsched_tpu.blocks.fileio import file_sink, file_source
from newsched_tpu.runtime.block import Block
from newsched_tpu.utils.dtypes import port_dtype


class wav_sink(Block):
    """Write rf32 audio to a WAV file at finalize (reference audio::sink's
    persistent cousin)."""

    def __init__(self, path: str, sample_rate: int = 48000, name=None):
        super().__init__(name)
        self.path = path
        self.sample_rate = int(sample_rate)
        self.add_input("in", "rf32")

    def work(self, state, ins, params, nout):
        return state, ins["in"]

    def finalize(self, collected, total):
        import scipy.io.wavfile as wf

        arr = np.asarray(collected, dtype=np.float32)
        arr = np.clip(arr, -1.0, 1.0)
        wf.write(self.path, self.sample_rate, arr)


class wav_source(Block):
    """Stream a WAV file as rf32 (reference audio::source's file mode)."""

    def __init__(self, path: str, repeat: bool = False, name=None):
        super().__init__(name)
        import scipy.io.wavfile as wf

        self.sample_rate, data = wf.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        data = data.astype(np.float32)
        if data.ndim > 1:
            data = data[:, 0].copy()
        self._data = data
        self.repeat = repeat
        self.add_output("out", "rf32")
        # delegate streaming to vector_source-style state
        from newsched_tpu.blocks.general import vector_source

        self._inner = vector_source(data, repeat=repeat, dtype="rf32")

    def finite_items(self, in_bound):
        return None if self.repeat else len(self._data)

    def init_state(self, nin, nout):
        return self._inner.init_state(nin, nout)

    def work(self, state, ins, params, nout):
        return self._inner.work(state, ins, {}, nout)
