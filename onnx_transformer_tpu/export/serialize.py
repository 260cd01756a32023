"""Serve-format export: portable compiled-graph bundles.

Capability parity with the reference's L5 export layer — it exports QCDQ
ONNX graphs of the encoder and decoder separately with dynamic target-length
axes (``encoder_decoder.py:31-52``) and cleans them with qonnx
(``onnx/onnx_fix.py``).  The TPU-native serve format is **StableHLO** via
``jax.export``: the encoder, the KV-cached decode step, and the full greedy
decode are exported as self-contained serialized functions (params baked in
or passed, static shapes per bucket), alongside a weights + config manifest.
A consumer needs only jax to ``deserialize(...).call(...)`` — no model code.

Dynamic shapes: where the reference marks dynamic ONNX axes, we export one
graph per shape *bucket* (XLA's static-shape model); ``ExportBundle`` keeps
the bucket table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from onnx_transformer_tpu.models.transformer import Transformer, default_linear
from onnx_transformer_tpu.ops import layers as L


def _export_fn(fn: Callable, args: tuple) -> bytes:
    exp = jexport.export(jax.jit(fn))(*args)
    return exp.serialize()


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


@dataclass
class ExportBundle:
    path: str

    def _write(self, name: str, blob: bytes):
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, name), "wb") as f:
            f.write(blob)

    def manifest(self, meta: dict):
        with open(os.path.join(self.path, "manifest.json"), "w") as f:
            json.dump(meta, f, indent=2)


def export_model(
    model: Transformer,
    params,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8),
    src_len: int = 72,
    max_len: int = 72,
    lin=default_linear,
    mode: str = "fp32",
    kv_cache_dtype: str = "fp32",
    fused_attn: bool = False,
) -> ExportBundle:
    """Export encoder / cached-decode-step / full-greedy graphs per batch
    bucket (reference: export_encoder/export_decoder, encoder_decoder.py:31-52).

    For quantized exports pass the quantized ``lin`` impl (its int8 weight
    payloads are baked into the graph as constants — the serve-format
    analogue of the reference's QCDQ initializers) together with the
    SmoothQuant-migrated params, plus ``mode`` for the manifest."""
    cfg = model.cfg
    bundle = ExportBundle(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    buckets = []
    for b in batch_sizes:
        src_s = _spec((b, src_len), jnp.int32)
        mask_s = _spec((b, 1, src_len), jnp.bool_)

        def encode_fn(params, src, src_mask):
            return model.encode(params, src, src_mask, lin=lin)

        enc = _export_fn(encode_fn, (params, src_s, mask_s))
        bundle._write(f"encoder_b{b}.shlo", enc)

        def greedy_fn(params, src, src_mask):
            from onnx_transformer_tpu.serving.decode import greedy_decode
            return greedy_decode(model, params, src, src_mask, max_len, lin=lin,
                                 kv_cache_dtype=kv_cache_dtype,
                                 fused_attn=fused_attn)

        dec = _export_fn(greedy_fn, (params, src_s, mask_s))
        bundle._write(f"greedy_b{b}.shlo", dec)

        # Standalone prefill + decode-step pair: the consumer drives its own
        # token loop (sampling, streaming, custom stopping) — the decoder-as-
        # servable-artifact capability of the reference's export_decoder with
        # dynamic tgt axes (encoder_decoder.py:41-52), in static-bucket form.
        def prefill_fn(params, src, src_mask):
            memory = model.encode(params, src, src_mask, lin=lin)
            return model.init_cache(params, memory, max_len, lin=lin,
                                    cache_dtype=kv_cache_dtype)

        pre = _export_fn(prefill_fn, (params, src_s, mask_s))
        bundle._write(f"prefill_b{b}.shlo", pre)

        cache_tree = jax.eval_shape(
            lambda p, s, m: prefill_fn(p, s, m), params, src_s, mask_s)
        tok_s = _spec((b, 1), jnp.int32)
        pos_s = _spec((b,), jnp.int32)  # per-row positions (continuous batching)

        def step_fn(params, cache, tok, pos, src_mask):
            return model.decode_step(params, cache, tok, pos, src_mask,
                                     lin=lin, fused_attn=fused_attn)

        stp = _export_fn(step_fn, (params, cache_tree, tok_s, pos_s, mask_s))
        bundle._write(f"decode_step_b{b}.shlo", stp)
        buckets.append(b)

    # weights + config manifest (the reference also saves the decoder
    # state_dict next to the onnx graph, encoder_decoder.py:49-52)
    from onnx_transformer_tpu.train.checkpoint import save

    save(os.path.join(out_dir, "params.npz"), params)
    bundle.manifest({
        "format": "stablehlo/jax.export",
        "model": "iwslt14-encdec",
        "mode": mode,
        "kv_cache_dtype": kv_cache_dtype,
        "config": {
            "src_vocab_size": cfg.src_vocab_size,
            "tgt_vocab_size": cfg.tgt_vocab_size,
            "num_layers": cfg.num_layers,
            "d_model": cfg.d_model,
            "d_ff": cfg.d_ff,
            "num_heads": cfg.num_heads,
            "quantize_attn_probs": cfg.quantize_attn_probs,
        },
        "src_len": src_len,
        "max_len": max_len,
        "batch_buckets": buckets,
        "graphs": {
            "encoder": [f"encoder_b{b}.shlo" for b in buckets],
            "greedy": [f"greedy_b{b}.shlo" for b in buckets],
            "prefill": [f"prefill_b{b}.shlo" for b in buckets],
            "decode_step": [f"decode_step_b{b}.shlo" for b in buckets],
        },
        "decode_step_signature": (
            "(params, cache, tok[B,1] i32, pos[B] i32, src_mask[B,1,S] bool)"
            " -> (log_probs[B,V] f32, cache); cache pytree comes from prefill"
        ),
    })
    return bundle


def load_exported(path: str, graph: str):
    """Deserialize an exported graph; returns an object with ``.call(*args)``."""
    with open(os.path.join(path, graph), "rb") as f:
        return jexport.deserialize(f.read())


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)
