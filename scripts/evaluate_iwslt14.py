"""Full-test-set BLEU evaluation: FP32 / INT8 / INT4, greedy or beam.

The reference's eval drivers (``batch_output.py`` quantized CPU eval,
``batch_gpu_output.py`` FP32 eval, ``test.py``) in one CLI with a KV-cached,
jitted decode.

  python scripts/evaluate_iwslt14.py --ckpt checkpoints/iwslt14/model_final.npz \
      --mode int8 --scales scales/transformer_scales.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.evaluation.bleu import corpus_bleu
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.serving import decode as D
from onnx_transformer_tpu.train import checkpoint as CKPT
from onnx_transformer_tpu.train import trainer as T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--split", default="test")
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--mode", choices=["fp32", "int8", "pallas", "int4"], default="fp32")
    ap.add_argument("--scales", default=None, help="calibrated scales .npz for SmoothQuant")
    ap.add_argument("--kv-dtype", choices=["fp32", "int8"], default=None,
                    help="KV cache dtype (default: int8 for quantized modes)")
    ap.add_argument("--fused-attn", action="store_true",
                    help="fused Pallas int8-cache attention kernel")
    ap.add_argument("--beam", type=int, default=0, help="beam size (0 = greedy)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--max-padding", type=int, default=72)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dump", default=None, help="write 'hyp \\t||\\t ref' lines (test.py format)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model)
    template = T.init_state(model, tx, jax.random.key(0)).tree()
    params = jax.device_put(CKPT.restore(args.ckpt, template)["params"])

    lin = None
    if args.mode in ("int8", "pallas"):
        from onnx_transformer_tpu.quant.smoothquant import load_reference_scales
        from onnx_transformer_tpu.quant.w8a8 import quantize_transformer

        scales = load_reference_scales(args.scales) if args.scales else None
        params, lin = quantize_transformer(model, params, scales, mode=args.mode)
    elif args.mode == "int4":
        from onnx_transformer_tpu.quant.int4 import (
            make_w4a8_linear_impl, quantize_model_params_int4)

        payloads = quantize_model_params_int4(model, params)
        lin = make_w4a8_linear_impl(payloads)

    from onnx_transformer_tpu.models.transformer import default_linear

    lin = lin or default_linear
    pairs = load_split(args.data, args.split)
    if args.limit:
        pairs = pairs[: args.limit]
    bsz, ml = args.batch_size, args.max_padding

    kv = args.kv_dtype or ("int8" if args.mode in ("int8", "pallas") else "fp32")
    # pass quantized payloads as jit args, not closure consts (quant/w8a8.py:
    # closure device arrays force a ~28ms-per-sync runtime slow path)
    payloads = getattr(lin, "payloads", None) or {}
    rebind = getattr(lin, "rebind", None)

    def lin_of(pl):
        return rebind(pl) if rebind and pl else lin

    if args.beam:
        dec = jax.jit(lambda p, pl, s, m: D.beam_decode(
            model, p, s, m, ml, beam_size=args.beam, lin=lin_of(pl),
            kv_cache_dtype=kv, fused_attn=args.fused_attn))
    else:
        dec = jax.jit(lambda p, pl, s, m: D.greedy_decode(
            model, p, s, m, ml, lin=lin_of(pl),
            kv_cache_dtype=kv, fused_attn=args.fused_attn))

    hyps, refs = [], []
    t0 = time.time()
    n_batches = len(pairs) // bsz
    for i in range(n_batches):
        chunk = pairs[i * bsz : (i + 1) * bsz]
        src, _ = collate(chunk, vs, vt, ml)
        sm = np.asarray(L.make_src_mask(np.asarray(src)))
        ys = np.array(dec(params, payloads, jnp.asarray(src), jnp.asarray(sm)))
        hyps.extend(D.ids_to_tokens(ys, vt))
        refs.extend([[t.split()] for _, t in chunk])
        if i % 10 == 0:
            print(f"batch {i}/{n_batches}", file=sys.stderr, flush=True)
    dt = time.time() - t0

    bleu = corpus_bleu(refs, hyps, smoothing="method4")
    bleu_plain = corpus_bleu(refs, hyps)
    if args.dump:
        from onnx_transformer_tpu.data.dataset import unbpe
        with open(args.dump, "w") as f:
            for h, r in zip(hyps, refs):
                f.write(f"{unbpe(h)} \t||\t {unbpe(r[0])}\n")
    print(json.dumps({
        "mode": args.mode,
        "beam": args.beam,
        "sentences": len(hyps),
        "bleu_method4": round(bleu, 4),
        "bleu": round(bleu_plain, 4),
        "seconds": round(dt, 1),
        "sentences_per_sec": round(len(hyps) / dt, 1),
    }))


if __name__ == "__main__":
    main()
