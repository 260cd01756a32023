from onnx_transformer_tpu.quant.core import (  # noqa: F401
    absmax_scale,
    dequantize,
    fake_quant_act_per_token,
    fake_quant_weight_per_channel,
    pack_int4,
    quantize,
    quantize_act_per_token,
    quantize_weight_per_channel,
    ste_round,
    unpack_int4,
)
from onnx_transformer_tpu.quant.w8a8 import (  # noqa: F401
    make_w8a8_linear_impl,
    quantize_model_params,
    quantize_transformer,
)
