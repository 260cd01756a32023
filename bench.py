"""Benchmark: INT8 KV-cached greedy decode throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The headline metric is output tokens/sec/chip of the INT8 W8A8 quantized
model with KV cache under batched greedy decode (the reference's serving
path re-executes the full decoder ONNX graph per token on CPU with no cache,
``onnx_optimized_custom_inference.py:624-671`` — it publishes no numbers, so
``vs_baseline`` is the speedup over our own FP32 KV-cached decode of the
same model on the same chip).  Extras report FP32 throughput and the
INT8-vs-FP32 BLEU delta on real test data when a trained checkpoint is
present.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.evaluation.bleu import corpus_bleu
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.serving import decode as D

CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "checkpoints/iwslt14/model_final.npz")
BATCH = 512
MAX_LEN = 72
DECODE_STEPS = MAX_LEN - 1


def load_params(model):
    if os.path.exists(CKPT):
        from onnx_transformer_tpu.train import trainer as T
        from onnx_transformer_tpu.train import checkpoint as C

        tx = T.make_optimizer(model.cfg.d_model)
        template = T.init_state(model, tx, jax.random.key(0)).tree()
        state = C.restore(CKPT, template)
        return state["params"], True
    return model.init(jax.random.key(0)), False


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    params, trained = load_params(model)
    # checkpoint restore yields host numpy arrays; pin them on device or
    # every jit call re-uploads ~170MB over the device link (measured 50x
    # decode slowdown)
    params = jax.device_put(params)

    data_dir = "/root/reference/data"
    if os.path.exists(data_dir):
        pairs = load_split(data_dir, "test")[: BATCH * 2]
    else:
        pairs = [("ein test .", "a test .")] * (BATCH * 2)
    src_np, _ = collate(pairs[:BATCH], vs, vt, MAX_LEN)
    src = jnp.asarray(src_np)
    sm = jnp.asarray(L.make_src_mask(src))

    # INT8 quantized serving path (KV cache, batched, jitted).  Reuse the
    # saved calibration artifact when present — calibrating in-bench would
    # recompile the big tap-forward graph and dominate bench wall-clock.
    scales_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "scales", "transformer_scales.npz")
    if os.path.exists(scales_path):
        from onnx_transformer_tpu.quant.smoothquant import load_reference_scales
        scales = load_reference_scales(scales_path)
    else:
        from onnx_transformer_tpu.quant.calibrate import get_act_scales
        from onnx_transformer_tpu.data.dataset import BucketedLoader

        calib = BucketedLoader(pairs, vs, vt, batch_size=BATCH, max_padding=MAX_LEN,
                               shuffle=False, seed=0, drop_last=False)
        scales = get_act_scales(model, params, calib, num_samples=4)
    sp, lin8 = W.quantize_transformer(model, params, scales, mode="int8")

    dec_int8 = jax.jit(lambda p, s, m: D.greedy_decode(model, p, s, m, MAX_LEN,
                                                       lin=lin8, kv_cache_dtype="int8"))
    t_int8, ys_q = timed(dec_int8, sp, src, sm)
    toks_int8 = BATCH * DECODE_STEPS / t_int8

    # FP32 cached decode (for BLEU delta + fp reference)
    dec_fp = jax.jit(lambda p, s, m: D.greedy_decode(model, p, s, m, MAX_LEN))
    t_fp, ys_fp = timed(dec_fp, params, src, sm)
    toks_fp = BATCH * DECODE_STEPS / t_fp

    out = {
        "metric": "w8a8_int8kv_greedy_decode_tokens_per_sec_per_chip",
        "value": round(toks_int8, 1),
        "unit": "tokens/s",
        # baseline = our own FP32 KV-cached decode of the same model on the
        # same chip (the reference publishes no numbers; its actual serving
        # path — per-token ONNX session rebuilds on CPU — is orders of
        # magnitude slower and not meaningfully comparable)
        "vs_baseline": round(toks_int8 / toks_fp, 2),
        "fp32_kv_cache_tokens_per_sec": round(toks_fp, 1),
        "batch": BATCH,
        "decode_len": DECODE_STEPS,
        "trained_checkpoint": trained,
    }

    if trained and os.path.exists(data_dir):
        refs = [[t.split()] for _, t in pairs[:BATCH]]
        bleu_fp = corpus_bleu(refs, D.ids_to_tokens(np.array(ys_fp), vt), smoothing="method4")
        bleu_q = corpus_bleu(refs, D.ids_to_tokens(np.array(ys_q), vt), smoothing="method4")
        out["bleu_fp32"] = round(bleu_fp, 4)
        out["bleu_int8"] = round(bleu_q, 4)
        out["bleu_delta_int8_vs_fp32"] = round(bleu_q - bleu_fp, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
