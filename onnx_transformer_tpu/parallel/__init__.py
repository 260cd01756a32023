"""Parallelism: device meshes, TP param shardings, pipeline parallelism.

TPU-native replacement for the reference's NCCL/DataParallel layer
(SURVEY.md §2.6): DP = batch sharding over ``data``; TP = Megatron-style
param shardings over ``model`` (sharding.py); PP = GPipe microbatch
pipelining over ``pipe`` via shard_map + ppermute (pipeline.py); SP =
sequence-dim activation sharding between TP blocks (pipeline.sp_constrain).
"""

from onnx_transformer_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, data_sharding, initialize_distributed, make_mesh,
    replicated,
)
from onnx_transformer_tpu.parallel.pipeline import (
    PIPE_AXIS, make_pipeline_mesh, make_pipeline_train_step, pipeline_apply,
    pipelined_forward_logits, shard_pipeline_state, sp_constrain,
    stack_pipeline_params, unstack_pipeline_params,
)
from onnx_transformer_tpu.parallel.sharding import (
    param_pspecs, param_shardings, shard_params,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS",
    "data_sharding", "initialize_distributed", "make_mesh", "replicated",
    "make_pipeline_mesh", "make_pipeline_train_step", "pipeline_apply",
    "pipelined_forward_logits", "shard_pipeline_state", "sp_constrain",
    "stack_pipeline_params", "unstack_pipeline_params",
    "param_pspecs", "param_shardings", "shard_params",
]
