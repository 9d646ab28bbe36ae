"""Pallas (Mosaic) TPU kernels for the hot ops — the native-kernel layer
the reference implements in C++/VOLK (kernel/) and CUDA (cusp).

Kernels here are drop-in replacements for specific jnp formulations in
ops/, selected via the NEWSCHED_TPU_PALLAS=1 environment flag or explicit
arguments; every kernel has a pure-jnp twin and an interpret-mode test so
correctness is checked on any backend.
"""

from newsched_tpu.ops.pallas.channelizer import arm_fold, arm_fold_reference  # noqa: F401
