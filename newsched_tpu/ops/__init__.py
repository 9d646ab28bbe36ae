"""Pure DSP kernels — the analog of the reference's kernel/ library
(gr::kernel::*) and its CUDA twin cusp, rebuilt as jnp/Pallas functions.

Everything here is runtime-free: plain functions over arrays (plus explicit
state pytrees for streaming kernels), usable standalone or wrapped by blocks.
"""

from newsched_tpu.ops import fftops, firdes, window  # noqa: F401
# NB: the agc *function* is not re-exported — it would shadow the ops.agc
# submodule; use ops.agc.agc().
from newsched_tpu.ops.agc import AgcState, agc_init_state  # noqa: F401
from newsched_tpu.ops.analog import (  # noqa: F401
    QuadDemodState,
    RotatorState,
    quad_demod_init_state,
    quadrature_demod,
    rotate,
    rotator_init_state,
)
from newsched_tpu.ops.fir import (  # noqa: F401
    FirState,
    fir_filter,
    fir_init_state,
    fir_interp_filter,
    fft_filter_full,
    resampler_init_state,
)
from newsched_tpu.ops.iir import (  # noqa: F401
    IirState,
    iir_filter,
    iir_init_state,
    lfilter_taps,
)
from newsched_tpu.ops.nco import nco_phase, nco_cexp, NCO_SCALE  # noqa: F401
from newsched_tpu.ops.pfb import (  # noqa: F401
    PfbState,
    pfb_arm_taps,
    pfb_channelize,
    pfb_decimate,
    pfb_init_state,
)
