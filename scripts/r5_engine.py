"""Round-5 engine tuning on the trained request stream (VERDICT r4 #4):
measure useful tok/s + occupancy + the NEW starvation attribution across
configs (refill cadence, completion capacity, drain cadence).

  python scripts/r5_engine.py [--requests 6144] [--configs ...]
"""
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
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.serving.engine import TranslationEngine

B, MAX_LEN = 512, 72


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=6144)
    ap.add_argument("--configs", default="base,re4,cc8k,re4cc8k,de6")
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    args = ap.parse_args()

    vs, vt = load_iwslt14_vocab()
    model = Transformer(TransformerConfig(len(vs), len(vt)))
    from onnx_transformer_tpu.train import checkpoint as CK
    from onnx_transformer_tpu.train import trainer as T

    tx = T.make_optimizer(model.cfg.d_model)
    tmpl = T.init_state(model, tx, jax.random.key(0)).tree()
    params = jax.device_put(CK.restore(args.ckpt, tmpl)["params"])
    from onnx_transformer_tpu.quant.smoothquant import load_reference_scales

    scales = load_reference_scales(
        "onnx_transformer_tpu/artifacts/transformer_scales.npz")
    sp, _lin8 = W.quantize_transformer(model, params, scales, mode="int8")
    linf = W.make_w8a8_linear_impl(_lin8.payloads, mode="fused")

    pairs = load_split("/root/reference/data", "test")[: args.requests]
    if os.environ.get("LPT"):
        # longest-source-first batch scheduling (LPT): long outputs start
        # while the pool is busy, so the drain tail holds only short
        # stragglers instead of 71-step cap-runners
        pairs = sorted(pairs, key=lambda p: -len(p[0].split()))
    elif os.environ.get("HEADLPT"):
        # head-LPT: only the longest B requests go first (they bound the
        # makespan); the rest keep stream order so death times stay mixed
        # (full LPT groups equal lengths -> synchronized death waves)
        order = sorted(range(len(pairs)), key=lambda i: -len(pairs[i][0].split()))
        head = set(order[:512])
        pairs = ([pairs[i] for i in order[:512]]
                 + [p for i, p in enumerate(pairs) if i not in head])
    reqs = []
    for s, _ in pairs:
        src, _t = collate([(s, "")], vs, vt, MAX_LEN)
        reqs.append(np.asarray(src[0]))

    CONFIGS = {
        "base":    dict(chunk_steps=12, refill_every=6),
        "re4":     dict(chunk_steps=12, refill_every=4),
        "re3":     dict(chunk_steps=12, refill_every=3),
        "cc8k":    dict(chunk_steps=12, refill_every=6, comp_capacity=8192),
        "re4cc8k": dict(chunk_steps=12, refill_every=4, comp_capacity=8192),
        "de6":     dict(chunk_steps=12, refill_every=6, drain_every=6),
        "c16":     dict(chunk_steps=16, refill_every=8, comp_capacity=8192,
                    stage_capacity=6656),
        "c18":     dict(chunk_steps=18, refill_every=6, comp_capacity=8192,
                    stage_capacity=6656),
        # full-stream staging ring: every request stages up front, admission
        # never waits on tail feedback (R ~ stream depth; ~2.9 GB stage)
        "bigR":    dict(chunk_steps=12, refill_every=6, comp_capacity=8192,
                        stage_capacity=6656),
        "bigRpc256": dict(chunk_steps=12, refill_every=6, comp_capacity=8192,
                          stage_capacity=6656, prefill_chunk=256),
        "bigRde8": dict(chunk_steps=12, refill_every=6, comp_capacity=8192,
                        stage_capacity=6656, drain_every=8),
        "re3u256": dict(chunk_steps=12, refill_every=3, comp_capacity=8192,
                        stage_capacity=6656, refill_per_step=256),
        "re2u256": dict(chunk_steps=12, refill_every=2, comp_capacity=8192,
                        stage_capacity=6656, refill_per_step=256),
        "re6u256": dict(chunk_steps=12, refill_every=6, comp_capacity=8192,
                        stage_capacity=6656, refill_per_step=256),
    }
    for name in args.configs.split(","):
        kw = dict(CONFIGS[name])
        drain_every = kw.pop("drain_every", 4)
        kw.setdefault("prefill_chunk", 512)
        kw.setdefault("stage_capacity", 4096)
        eng = TranslationEngine(
            model, sp, lin=linf, num_slots=B, src_len=MAX_LEN,
            max_len=MAX_LEN, kv_cache_dtype="int8",
            buckets=(24, 48, 72), **kw)
        for r in reqs[:256]:
            eng.submit(r)
        eng.run(pipeline_depth=2, drain_every=drain_every)
        eng.occ_live_steps = eng.occ_slot_steps = 0
        eng.starved_slots = eng.gated_slots = 0
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        done = eng.run(pipeline_depth=2, drain_every=drain_every)
        dt = time.perf_counter() - t0
        useful = sum(len(r.out_tokens) + 1 for r in done)
        occ = eng.occ_live_steps / max(eng.occ_slot_steps, 1)
        print(f"{name:8s}: useful {useful/dt:9,.0f} tok/s  occ {occ:.3f}  "
              f"done {len(done)}  starved {eng.starved_slots}  "
              f"gated {eng.gated_slots}  wall {dt:.2f}s", flush=True)
        del eng
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
