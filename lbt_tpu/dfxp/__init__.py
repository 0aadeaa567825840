"""DFXP core: dynamic fixed-point quantization primitives."""

from lbt_tpu.dfxp.quantize import (  # noqa: F401
    EXP_MIN,
    dequantize,
    multiplier,
    overflow_rates,
    quantize,
    quantize_int,
    quantize_ste,
    update_exponent,
)
from lbt_tpu.dfxp.barrier import grad_quant_barrier, make_sink, SINK_SHAPE  # noqa: F401
