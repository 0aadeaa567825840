"""Hand-written Pallas (Mosaic) TPU kernels — the framework's native tier.

The reference has no native code at all (SURVEY.md §2: 100% Python TF1
graphs); here the hot quantization ops are fused VMEM-resident kernels:

* ``quantize_pallas``      — scale + clip + (stochastic) round + pack to
  int8 in one pass, stochastic rounding fed by the TPU hardware PRNG
  (``pltpu.prng_random_bits``) instead of XLA's multi-op threefry;
* ``qmatmul_pallas``       — fused quantize(x) x quantize(w) -> int8 MXU
  matmul (int32 accumulation) -> dequantized f32 tile, never
  materializing the int8 codes in HBM.
"""

from lbt_tpu.ops.pallas.quant_kernels import (  # noqa: F401
    qmatmul_pallas,
    quantize_pallas,
)
