from onnx_transformer_tpu.serving.decode import (  # noqa: F401
    beam_decode,
    greedy_decode,
    greedy_decode_nocache,
    ids_to_tokens,
)
from onnx_transformer_tpu.serving.engine import (  # noqa: F401
    BucketedEngineFleet,
    TranslationEngine,
)
