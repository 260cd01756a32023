"""Continuous-batching engine throughput on the real chip, with knob sweep.

  python scripts/engine_bench.py [--slots 512] [--chunk 16] [--refill 32]
                                 [--prefill 128] [--reqs 1536] [--buckets 24,48,72]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.serving.engine import TranslationEngine

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--refill", type=int, default=32)
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--reqs", type=int, default=1536)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--drain-every", type=int, default=4)
    ap.add_argument("--buckets", type=str, default="24,48,72")
    ap.add_argument("--max-len", type=int, default=72)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-ckpt", action="store_true")
    ap.add_argument("--fleet", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    ckpt = os.path.join(HERE, "checkpoints/iwslt14/model_final.npz")
    if os.path.exists(ckpt) and not args.no_ckpt:
        from onnx_transformer_tpu.train import trainer as T
        from onnx_transformer_tpu.train import checkpoint as C

        tx = T.make_optimizer(cfg.d_model)
        template = T.init_state(model, tx, jax.random.key(0)).tree()
        params = C.restore(ckpt, template)["params"]
    else:
        params = model.init(jax.random.key(0))
    params = jax.device_put(params)

    from onnx_transformer_tpu.quant.smoothquant import load_reference_scales

    scales = None
    p = os.path.join(HERE, "onnx_transformer_tpu/artifacts/transformer_scales.npz")
    if os.path.exists(p):
        scales = load_reference_scales(p)
    sp, lin8 = W.quantize_transformer(model, params, scales, mode="int8")

    data_dir = "/root/reference/data"
    if os.path.exists(data_dir):
        pairs = load_split(data_dir, "test")[: args.reqs]
    else:
        pairs = [("ein kleiner test .", "a small test .")] * args.reqs

    S = args.max_len
    reqs = []
    for s, _ in pairs:
        src, _tgt = collate([(s, "")], vs, vt, S)
        reqs.append(np.asarray(src[0]))

    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets else None
    if args.fleet:
        from onnx_transformer_tpu.serving.engine import BucketedEngineFleet

        eng = BucketedEngineFleet(
            model, sp, lin=lin8,
            pools=tuple((b, args.slots, S) for b in (buckets or (S,))),
            chunk_steps=args.chunk, kv_cache_dtype="int8",
            prefill_chunk=args.prefill, refill_per_step=args.refill,
            stage_capacity=args.stage,
        )
    else:
        eng = TranslationEngine(
            model, sp, lin=lin8, num_slots=args.slots, src_len=S, max_len=S,
            chunk_steps=args.chunk, kv_cache_dtype="int8",
            prefill_chunk=args.prefill, refill_per_step=args.refill,
            stage_capacity=args.stage, buckets=buckets,
        )
    # warm-up: compile prefill(s) + chunk
    for r in reqs[: min(256, len(reqs))]:
        eng.submit(r)
    eng.run(pipeline_depth=args.depth, drain_every=args.drain_every)

    t0 = time.perf_counter()
    for r in reqs:
        eng.submit(r)
    done = eng.run(pipeline_depth=args.depth, drain_every=args.drain_every)
    dt = time.perf_counter() - t0
    useful = sum(len(r.out_tokens) + 1 for r in done)
    print(json.dumps({
        "engine_useful_tokens_per_sec": round(useful / dt, 1),
        "requests": len(done),
        "requests_per_sec": round(len(done) / dt, 1),
        "wall_s": round(dt, 3),
        "mean_out_len": round(useful / max(len(done), 1), 2),
        "slots": args.slots, "chunk": args.chunk, "refill": args.refill,
        "prefill": args.prefill, "buckets": args.buckets,
        "depth": args.depth, "drain_every": args.drain_every,
        "fleet": args.fleet,
    }))


if __name__ == "__main__":
    main()
