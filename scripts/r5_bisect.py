"""Bisect the in-bench engine slowdown: run bench.py's setup, optionally
its train probe and/or one chunked-decode call, then the engine stream.

  python scripts/r5_bisect.py [--train] [--decode] [--beamfirst]
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

import bench as BN
from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.models import stacked_decode as SD
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--decode", action="store_true")
    args = ap.parse_args()

    vs, vt = load_iwslt14_vocab()
    model = Transformer(TransformerConfig(len(vs), len(vt)))
    params, trained = BN.load_params(model)
    params = jax.device_put(params)
    pairs = load_split("/root/reference/data", "test")[: BN.BATCH * 12]
    scales = BN.load_scales()
    sp, lin8 = W.quantize_transformer(model, params, scales, mode="int8")
    linf = W.make_w8a8_linear_impl(lin8.payloads, mode="fused")
    pl8 = lin8.payloads
    stacked = jax.device_put(SD.build_stacked(model, sp, pl8))

    if args.train:
        t0 = time.perf_counter()
        rate, mfu, ms = BN.run_train_probe(vs, vt)
        print(f"train probe: {rate:,.0f} tok/s ({time.perf_counter()-t0:.0f}s)",
              flush=True)

    if args.decode:
        src_np, _ = collate(pairs[: BN.BATCH], vs, vt, BN.MAX_LEN)
        src = jnp.asarray(src_np)
        sm = jnp.asarray(L.make_src_mask(src))
        dec = jax.jit(lambda p, pl, st, s, m: SD.greedy_decode_chunked(
            model, p, st, s, m, BN.MAX_LEN, chunk=8, lin=linf.rebind(pl)))
        t, _ = BN.timed(dec, sp, pl8, stacked, src, sm)
        print(f"decode: {BN.BATCH*BN.MAX_LEN/t:,.0f} tok/s", flush=True)

    rate, done, occ, stv, gat = BN.run_engine_stream(
        model, sp, linf, pairs, vs, vt)
    print(f"engine: useful {rate:,.0f} tok/s occ {occ:.3f} "
          f"starved {stv} gated {gat}", flush=True)


if __name__ == "__main__":
    main()
