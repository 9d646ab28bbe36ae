from newsched_tpu.utils.dtypes import (  # noqa: F401
    cf32,
    rf32,
    ri16,
    ri32,
    ru8,
    port_dtype,
)
from newsched_tpu.utils.logger import get_logger  # noqa: F401
