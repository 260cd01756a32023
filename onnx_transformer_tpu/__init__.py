"""onnx_transformer_tpu — a TPU-native quantized-inference transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``gebegebegebe/onnx-transformer`` (reference mounted read-only at /root/reference):

- encoder-decoder transformer (Annotated-Transformer family) for IWSLT14 de-en
  (reference ``model.py:15-37``) as a pure-functional JAX pytree model,
- SmoothQuant-style INT8 PTQ (activation calibration, LN->Linear scale
  migration, W8A8 linears; reference ``get_quantized_scales.py``,
  ``get_quantized_model.py``, ``quant_linear.py``) with *real* int8 storage and
  fused Pallas dequant+matmul kernels,
- INT4 QAT path (reference Brevitas configs) via straight-through estimators,
- KV-cached greedy/beam decode and a continuous-batching serving engine
  (the reference re-executes the full decoder graph per token,
  ``onnx_optimized_custom_inference.py:624-671``),
- data-parallel / tensor-parallel training and serving over a
  ``jax.sharding.Mesh`` (reference: NCCL DDP, ``distributed/iwslt14_train.py``),
- a named-activation tap/injection system replacing the reference's
  node-by-node ONNX interpreter (``onnx_optimized_inference.py``) for
  bit-level fault-injection campaigns (``inject_utils/``).
"""

__version__ = "0.1.0"

from onnx_transformer_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    Transformer,
)
