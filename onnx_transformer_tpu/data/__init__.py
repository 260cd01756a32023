from onnx_transformer_tpu.data.dataset import (  # noqa: F401
    Batch,
    BucketedLoader,
    collate,
    load_pairs,
    load_split,
    unbpe,
)
from onnx_transformer_tpu.data.vocab import (  # noqa: F401
    BOS_ID,
    EOS_ID,
    PAD_ID,
    UNK_ID,
    Vocab,
    build_vocab,
    load_iwslt14_vocab,
)
