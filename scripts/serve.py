"""Continuous-batching translation server CLI.

Reads BPE-tokenised German source sentences (file or stdin), runs them
through the slot-based :class:`TranslationEngine` (the TPU-native
replacement for the reference's per-token whole-graph ONNX re-execution,
``onnx_optimized_custom_inference.py:624-671``), and writes translations.

Modes mirror scripts/evaluate_iwslt14.py: fp32 / int8 (W8A8 PTQ with
calibrated scales) / int4 (W4A8 packed nibbles), plus --kv-dtype int8 for
the quantized KV cache.

Usage:
  echo "das ist ein test" | python scripts/serve.py --mode fp32
  python scripts/serve.py --input src.bpe --mode int8 \
      --scales scales/transformer_scales.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# honour --platform before any backend initialisation (sitecustomize
# registers the TPU tunnel at interpreter start; env vars alone are too late)
if "--platform" in sys.argv:
    jax.config.update(
        "jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import encode_sentence, unbpe
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.models.transformer import default_linear
from onnx_transformer_tpu.serving.engine import TranslationEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--mode", choices=["fp32", "int8", "pallas", "int4"], default="fp32")
    ap.add_argument("--scales", default="scales/transformer_scales.npz")
    ap.add_argument("--kv-dtype", choices=["fp32", "int8"], default="fp32")
    ap.add_argument("--fused-attn", action="store_true",
                    help="fused Pallas int8-cache attention (needs --kv-dtype int8)")
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel width: shard weights + KV cache over "
                         "a model mesh axis of this size")
    ap.add_argument("--input", default="-", help="source file of BPE lines, or - for stdin")
    ap.add_argument("--num-slots", type=int, default=32)
    ap.add_argument("--beam", type=int, default=1,
                    help="slot-group beam width K (K consecutive slots per "
                         "request; GNMT length-normalised best hypothesis — "
                         "the reference has no beam, greedy_decoding.py:6-19)")
    ap.add_argument("--src-len", type=int, default=72)
    ap.add_argument("--max-len", type=int, default=72)
    ap.add_argument("--raw", action="store_true", help="print BPE tokens, no @@-unmerge")
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)

    from onnx_transformer_tpu.train import checkpoint as C
    from onnx_transformer_tpu.train import trainer as T

    tx = T.make_optimizer(cfg.d_model)
    template = T.init_state(model, tx, jax.random.key(0)).tree()
    if os.path.exists(args.ckpt):
        state = C.restore(args.ckpt, template)
        params = jax.device_put(state["params"])
    else:
        print(f"warning: {args.ckpt} missing, random params", file=sys.stderr)
        params = jax.device_put(template["params"])

    lin = default_linear
    if args.mode in ("int8", "pallas"):
        from onnx_transformer_tpu.quant.smoothquant import load_reference_scales
        from onnx_transformer_tpu.quant.w8a8 import quantize_transformer
        scales_path = args.scales
        if not (scales_path and os.path.exists(scales_path)):
            scales_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "onnx_transformer_tpu", "artifacts", "transformer_scales.npz")
        scales = (load_reference_scales(scales_path)
                  if os.path.exists(scales_path) else None)
        params, lin = quantize_transformer(model, params, scales, mode=args.mode)
    elif args.mode == "int4":
        from onnx_transformer_tpu.quant.int4 import (
            make_w4a8_linear_impl, quantize_model_params_int4)
        payloads = quantize_model_params_int4(model, params)
        lin = make_w4a8_linear_impl(payloads)

    mesh = None
    if args.tp:
        from onnx_transformer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(model=args.tp)
    eng = TranslationEngine(
        model, params, lin=lin, num_slots=args.num_slots,
        src_len=args.src_len, max_len=args.max_len,
        kv_cache_dtype=args.kv_dtype, fused_attn=args.fused_attn, mesh=mesh,
        beam_size=args.beam)

    lines = (sys.stdin if args.input == "-" else open(args.input)).read().splitlines()
    order = {}
    for n, line in enumerate(lines):
        ids = encode_sentence(line, vs, args.src_len)
        order[eng.submit(np.asarray(ids, np.int32))] = n

    t0 = time.time()
    done = eng.run()
    dt = time.time() - t0

    out = [""] * len(lines)
    ntok = 0
    for req in done:
        toks = [vt.itos[t] for t in req.out_tokens]
        ntok += len(toks)
        out[order[req.req_id]] = " ".join(toks) if args.raw else unbpe(toks)
    for line in out:
        print(line)
    print(f"# {len(lines)} sentences, {ntok} tokens in {dt:.2f}s "
          f"({ntok/max(dt,1e-9):.0f} tok/s, mode={args.mode}, "
          f"kv={args.kv_dtype})", file=sys.stderr)


if __name__ == "__main__":
    main()
