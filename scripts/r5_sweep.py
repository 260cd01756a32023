"""Round-5 decode-loop sweep on the real chip (VERDICT r4 #1):

- chunk C x segments grid for the chunk-staged decode;
- int8-generator variant measured in BOTH run orders (r4 recorded it
  slower than the fp32-generator headline — order-bias suspicion);
- prefill probe per lin mode so the loop time = t(decode) - t(prefill)
  differencing stays honest.

  python scripts/r5_sweep.py [--configs 8:1,8:3,12:1,...]
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
from onnx_transformer_tpu.models import stacked_decode as SD
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W

MAX_LEN = 72
STEPS = MAX_LEN - 1


def timed(f, *a, it=5):
    o = f(*a)
    jax.tree.map(np.asarray, o)
    t0 = time.perf_counter()
    for _ in range(it):
        o = f(*a)
    o = jax.tree.map(np.asarray, o)
    return (time.perf_counter() - t0) / it, o


def main():
    global B
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8:1,18:1,24:1")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    args = ap.parse_args()
    B = args.batch

    vs, vt = load_iwslt14_vocab()
    model = Transformer(TransformerConfig(len(vs), len(vt)))
    if os.path.exists(args.ckpt):
        from onnx_transformer_tpu.train import checkpoint as CK
        from onnx_transformer_tpu.train import trainer as T

        tx = T.make_optimizer(model.cfg.d_model)
        tmpl = T.init_state(model, tx, jax.random.key(0)).tree()
        params = jax.device_put(CK.restore(args.ckpt, tmpl)["params"])
    else:
        params = jax.device_put(model.init(jax.random.key(0)))
    pairs = load_split("/root/reference/data", "test")[:B]
    src = jnp.asarray(collate(pairs, vs, vt, MAX_LEN)[0])
    sm = jnp.asarray(L.make_src_mask(src))

    from onnx_transformer_tpu.quant.smoothquant import load_reference_scales
    scales = load_reference_scales(
        "onnx_transformer_tpu/artifacts/transformer_scales.npz")
    sp, lin8 = W.quantize_transformer(model, params, scales, mode="int8")
    sp_g, lin8g = W.quantize_transformer(model, params, scales, mode="int8",
                                         include_generator=True)
    linf = W.make_w8a8_linear_impl(lin8.payloads, mode="fused")
    pl8, pl8g = lin8.payloads, lin8g.payloads
    rbf = linf.rebind
    rbg = lin8g.rebind
    stacked = jax.device_put(SD.build_stacked(model, sp, pl8))
    stacked_g = jax.device_put(SD.build_stacked(model, sp_g, pl8g))

    def prefill_probe(p, pl, s, m):
        cross = model.cross_kv(p, model.encode(p, s, m, lin=rbf(pl)),
                               lin=rbf(pl), cache_dtype="int8")
        return sum(jnp.sum(lc["cross_k"].astype(jnp.int32))
                   + jnp.sum(lc["cross_v"].astype(jnp.int32)) for lc in cross)

    t_pre, _ = timed(jax.jit(prefill_probe), sp, pl8, src, sm)
    print(f"prefill(fused lin): {t_pre*1e3:7.2f} ms", flush=True)

    ys_ref = None
    results = []
    for cfgstr in args.configs.split(","):
        c, seg = (int(v) for v in cfgstr.split(":"))
        dec = jax.jit(lambda p, pl, st, s, m, c=c, seg=seg:
                      SD.greedy_decode_chunked(model, p, st, s, m, MAX_LEN,
                                               chunk=c, lin=rbf(pl),
                                               segments=seg))
        tc0 = time.perf_counter()
        t, ys = timed(dec, sp, pl8, stacked, src, sm)
        compile_s = time.perf_counter() - tc0 - 5 * t
        if ys_ref is None:
            ys_ref = np.array(ys)
            mism = 0
        else:
            mism = int(np.sum(np.array(ys) != ys_ref))
        loop = max(t - t_pre, 1e-9) / MAX_LEN
        results.append((cfgstr, t, loop))
        print(f"C={c:2d} seg={seg}: e2e {t*1e3:7.2f} ms  "
              f"{B*MAX_LEN/t:9,.0f} tok/s  loop {loop*1e3:.3f} ms/step  "
              f"mismatch {mism}  (compile ~{compile_s:.0f}s)", flush=True)

    # int8 generator at the best config, measured twice (order bias probe)
    best = min(results, key=lambda r: r[1])[0]
    c, seg = (int(v) for v in best.split(":"))
    dec_g = jax.jit(lambda p, pl, st, s, m:
                    SD.greedy_decode_chunked(model, p, st, s, m, MAX_LEN,
                                             chunk=c, lin=rbg(pl),
                                             segments=seg))
    dec_f = jax.jit(lambda p, pl, st, s, m:
                    SD.greedy_decode_chunked(model, p, st, s, m, MAX_LEN,
                                             chunk=c, lin=rbf(pl),
                                             segments=seg))
    for label, fn, a in (("gen8 #1", dec_g, (sp_g, pl8g, stacked_g)),
                         ("fp32g#1", dec_f, (sp, pl8, stacked)),
                         ("gen8 #2", dec_g, (sp_g, pl8g, stacked_g)),
                         ("fp32g#2", dec_f, (sp, pl8, stacked))):
        t, _ = timed(fn, *a, src, sm)
        print(f"{label} @C={c},seg={seg}: e2e {t*1e3:7.2f} ms  "
              f"{B*MAX_LEN/t:9,.0f} tok/s  "
              f"loop {(max(t-t_pre,1e-9))/MAX_LEN*1e3:.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
