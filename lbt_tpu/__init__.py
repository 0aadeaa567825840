"""lbt-tpu: a TPU-native dynamic fixed-point (DFXP) low-bit training framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference ``freudh/lbt`` codebase (TF1 graph-mode DFXP quantized training,
see /root/reference): per-tensor shared-exponent fixed-point quantization of
weights, activations, biases and backward gradients, with a dynamic
overflow-driven controller adapting each tensor's binary-point position
during training.

Design (TPU-first, nothing is a port):

* quantizer state (one int32 exponent per quantized tensor) is a pure
  functional pytree threaded through a single jitted train step — the
  reference's mutable TF variables + 'update_range' collection side channel
  (reference dynamic_fixed_point.py:40-41, trainer.py:63) become explicit
  inputs/outputs;
* backward-gradient quantization is expressed with ``jax.custom_vjp``
  barriers and fused quantized ops instead of a hand-written backward chain
  (reference models.py:47-51);
* the compute path runs real int8 integer arithmetic on the MXU (with exact
  int32 accumulation) instead of the reference's float32 fake-quant
  simulation, with Pallas kernels fusing scale/quantize/matmul/dequant;
* scaling is mesh-based (``jax.sharding``) data/tensor parallelism with an
  optional low-bit (shared-exponent int8, error-feedback) gradient
  all-reduce.
"""

__version__ = "0.1.0"

from lbt_tpu.config import QuantConfig, TrainConfig  # noqa: F401
