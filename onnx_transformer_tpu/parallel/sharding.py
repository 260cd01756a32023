"""Parameter sharding rules for tensor parallelism.

The reference has no TP (SURVEY.md §2.6); this is the north-star serving
axis: attention heads and the FFN hidden dim shard over the ``model`` mesh
axis (Megatron-style column/row split), so each TP rank holds h/TP heads and
d_ff/TP hidden units.  XLA then inserts the all-reduce after the row-parallel
matmuls (out-proj, ffn.w2) — the collective rides ICI, overlapping with
compute; no hand-written NCCL.

Layout (weights stored (in, out)):
- q/k/v projections:  column-parallel  -> P(None, 'model'), bias P('model')
- attention out-proj: row-parallel     -> P('model', None), bias replicated
- ffn w1:             column-parallel  -> P(None, 'model'), bias P('model')
- ffn w2:             row-parallel     -> P('model', None), bias replicated
- embeddings / layernorms / generator: replicated (d_model=512 is small; the
  vocab projection is latency-bound, not memory-bound, at this scale)
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onnx_transformer_tpu.parallel.mesh import MODEL_AXIS


def _attn_pspec() -> dict:
    col = {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)}
    row = {"w": P(MODEL_AXIS, None), "b": P()}
    return {"q": col, "k": col, "v": col, "o": row}


def _ffn_pspec() -> dict:
    return {
        "w1": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        "w2": {"w": P(MODEL_AXIS, None), "b": P()},
    }


def _ln_pspec() -> dict:
    return {"scale": P(), "bias": P()}


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching the Transformer param tree."""
    def enc_layer(_):
        return {"self_attn": _attn_pspec(), "ffn": _ffn_pspec(),
                "ln0": _ln_pspec(), "ln1": _ln_pspec()}

    def dec_layer(_):
        return {"self_attn": _attn_pspec(), "src_attn": _attn_pspec(),
                "ffn": _ffn_pspec(), "ln0": _ln_pspec(), "ln1": _ln_pspec(),
                "ln2": _ln_pspec()}

    return {
        "src_embed": {"lut": P()},
        "tgt_embed": {"lut": P()},
        "encoder": {
            "layers": [enc_layer(i) for i in range(len(params["encoder"]["layers"]))],
            "ln": _ln_pspec(),
        },
        "decoder": {
            "layers": [dec_layer(i) for i in range(len(params["decoder"]["layers"]))],
            "ln": _ln_pspec(),
        },
        "generator": {"w": P(), "b": P()},
    }


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh per the TP layout."""
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_pspecs(params),
                        is_leaf=lambda x: isinstance(x, P))
