"""HLO evidence for the int8 KV-cache claim (VERDICT r1 weak #3).

Lowers one KV-cached decode step at the flagship serving shape and inspects
the optimized HLO for fp32 materializations of the cache:

- jnp path: the per-step dequant ``cache.astype(f32) * scale`` shows up as
  f32 tensors of the full cache shape [B, H, T, dk];
- fused path: the cache enters the Pallas custom-call as s8 operands and no
  full-cache f32 buffer exists anywhere in the program.

Prints a JSON verdict and (with --dump) writes both HLO texts under
results_perf/ for inspection.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.quant import w8a8 as W

B, T, DK, H = 512, 72, 64, 8


def lower_step(model, params, lin, fused):
    D = H * DK
    cache_shape = {
        "k": jax.ShapeDtypeStruct((B, T, D), jnp.int8),
        "v": jax.ShapeDtypeStruct((B, T, D), jnp.int8),
        "k_scale": jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
        "v_scale": jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
        "cross_k": jax.ShapeDtypeStruct((B, T, D), jnp.int8),
        "cross_v": jax.ShapeDtypeStruct((B, T, D), jnp.int8),
        "cross_k_scale": jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
        "cross_v_scale": jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
    }
    cache = {"layers": [dict(cache_shape) for _ in range(model.cfg.num_layers)]}
    tok = jax.ShapeDtypeStruct((B, 1), jnp.int32)
    sm = jax.ShapeDtypeStruct((B, 1, T), jnp.bool_)

    def step(params, cache, tok, sm):
        logp, cache = model.decode_step(params, cache, tok, jnp.int32(5), sm,
                                        lin=lin, fused_attn=fused)
        return logp, cache

    return jax.jit(step).lower(params, cache, tok, sm).compile().as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", action="store_true")
    args = ap.parse_args()

    cfg = TransformerConfig(5337, 4444)
    model = Transformer(cfg)
    params = model.init(jax.random.key(0))
    _, lin8 = W.quantize_transformer(model, params, mode="int8")

    # any f32 tensor of the full per-layer cache shape = materialized dequant
    # (either merged [B,T,D] or split [B,H,T,dk] form)
    pat = re.compile(rf"f32\[{B},{T},{H * DK}\]|f32\[{B},{H},{T},{DK}\]")
    out = {}
    for fused in (False, True):
        hlo = lower_step(model, params, lin8, fused)
        hits = len(pat.findall(hlo))
        out["fused" if fused else "jnp"] = {
            "f32_fullcache_tensors": hits,
            "pallas_custom_calls": hlo.count("tpu_custom_call"),
            "hlo_bytes": len(hlo),
        }
        if args.dump:
            os.makedirs("results_perf", exist_ok=True)
            name = f"results_perf/decode_step_{'fused' if fused else 'jnp'}.hlo.txt"
            with open(name, "w") as f:
                f.write(hlo)
    out["verdict"] = ("PASS: fused path has no f32 full-cache tensors"
                      if out["fused"]["f32_fullcache_tensors"] == 0
                      else "FAIL: fused path still materializes f32 cache")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
