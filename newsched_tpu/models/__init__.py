"""Prebuilt flagship flowgraphs — the BASELINE.json configs as reusable
models. (The reference has no models layer; its users hand-build these
graphs in GRC/python. Packaging them here is the framework's 'model family'
surface: wbfm_receiver (config #1), fm_channelizer (configs #2/#4),
fir_chain (config #0).)"""

from newsched_tpu.models.wbfm import (  # noqa: F401
    fir_chain,
    fm_channelizer,
    wbfm_receiver,
)
