"""Time the engine's jitted pieces (prefill per bucket, decode chunk) in
isolation on the chip, to find what the run loop is actually paying for.

  python scripts/engine_profile.py [--slots 512] [--chunk 16] [--refill 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.serving.engine import TranslationEngine

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--refill", type=int, default=32)
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--buckets", type=str, default="24,48,72")
    args = ap.parse_args()

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    params = jax.device_put(model.init(jax.random.key(0)))
    sp, lin8 = W.quantize_transformer(model, params, mode="int8")

    S = 72
    buckets = tuple(int(b) for b in args.buckets.split(","))
    eng = TranslationEngine(
        model, sp, lin=lin8, num_slots=args.slots, src_len=S, max_len=S,
        chunk_steps=args.chunk, kv_cache_dtype="int8",
        prefill_chunk=args.prefill, refill_per_step=args.refill,
        buckets=buckets,
    )
    state = eng._blank_state()   # one dict; the staging ring is state["stage"]

    data_dir = "/root/reference/data"
    pairs = load_split(data_dir, "test")[: args.prefill] if os.path.exists(data_dir) \
        else [("ein kleiner test .", "x .")] * args.prefill
    k = args.prefill

    for sb in buckets:
        src = np.full((k, sb), cfg.pad_id, np.int32)
        for j, (s, _) in enumerate(pairs):
            row, _t = collate([(s, "")], vs, vt, S)
            src[j] = np.asarray(row[0])[:sb]
        ring_pos = np.arange(k, dtype=np.int32) % eng.R
        tags = np.arange(k, dtype=np.int32)
        sa, ra, ta = jnp.asarray(src), jnp.asarray(ring_pos), jnp.asarray(tags)

        def call(sa=sa, ra=ra, ta=ta, sb=sb):
            # prefill donates+returns the whole state (stage embedded)
            nonlocal state
            state = eng._prefill[sb](eng.params, eng._payloads, state, sa, ra, ta)
            return state["tag"]

        dt, _ = timed(call, warmup=1, iters=3)
        print(f"prefill bucket S={sb:3d} k={k}: {dt*1e3:8.2f} ms "
              f"({dt/k*1e3:.3f} ms/req)")

    head = jnp.asarray(eng.R, jnp.int32)

    # NOTE: state is donated by _chunk; time with fresh state copies.
    def chunk_fresh():
        st = jax.tree.map(lambda x: x.copy() if hasattr(x, "dtype") else x, state)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st2 = eng._dispatch_chunk(st, head)
        jax.block_until_ready(st2["cur"])
        return time.perf_counter() - t0

    chunk_fresh()  # compile
    ts = [chunk_fresh() for _ in range(5)]
    dt = min(ts)
    print(f"chunk ({args.chunk} steps, B={args.slots}, U={args.refill}): "
          f"{dt*1e3:8.2f} ms ({dt/args.chunk*1e3:.3f} ms/step)")


if __name__ == "__main__":
    main()
