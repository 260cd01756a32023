"""Fast-path decode benchmark: general int8 vs chunk-staged decode with
fused-quantize Pallas prefill, on the real chip.

  python scripts/fastpath_bench.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.models import stacked_decode as SD
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W

B, MAX_LEN = 512, 72
vs, vt = load_iwslt14_vocab()
model = Transformer(TransformerConfig(len(vs), len(vt)))
params = jax.device_put(model.init(jax.random.key(0)))
pairs = load_split("/root/reference/data", "test")[:B]
src = jnp.asarray(collate(pairs, vs, vt, MAX_LEN)[0]); sm = jnp.asarray(L.make_src_mask(src))
sp, lin8 = W.quantize_transformer(model, params, mode="int8")
linf = W.make_w8a8_linear_impl(lin8.payloads, mode="fused")
stacked = jax.device_put(SD.build_stacked(model, sp, lin8.payloads))
pl8 = lin8.payloads
rb8, rbf = lin8.rebind, linf.rebind

def timed(f, *a, it=5):
    o = f(*a); jax.tree.map(np.asarray, o)
    t0=time.perf_counter()
    for _ in range(it): o=f(*a)
    o = jax.tree.map(np.asarray, o)
    return (time.perf_counter()-t0)/it, o

def probe(p, pl, s, m, rb):
    cache = model.init_cache(p, model.encode(p, s, m, lin=rb(pl)), MAX_LEN, lin=rb(pl), cache_dtype="int8")
    return sum(jnp.sum(lc["cross_k"].astype(jnp.int32)) + jnp.sum(lc["cross_v"].astype(jnp.int32)) for lc in cache["layers"])

t_pre_x, o1 = timed(jax.jit(lambda p,pl,s,m: probe(p,pl,s,m,rb8)), sp, pl8, src, sm)
t_pre_f, o2 = timed(jax.jit(lambda p,pl,s,m: probe(p,pl,s,m,rbf)), sp, pl8, src, sm)
print(f"prefill XLA   : {t_pre_x*1e3:7.2f} ms")
print(f"prefill fused : {t_pre_f*1e3:7.2f} ms   (cross-KV checksum equal: {np.array_equal(o1, o2)})")

dec_x = jax.jit(lambda p, pl, st, s, m: SD.greedy_decode_chunked(model, p, st, s, m, MAX_LEN, chunk=8, lin=rb8(pl)))
t_x, ys_x = timed(dec_x, sp, pl8, stacked, src, sm)
dec_f = jax.jit(lambda p, pl, st, s, m: SD.greedy_decode_chunked(model, p, st, s, m, MAX_LEN, chunk=8, lin=rbf(pl)))
t_f, ys_f = timed(dec_f, sp, pl8, stacked, src, sm)
STEPS = MAX_LEN-1
print(f"chunked8 + XLA encode  : e2e {t_x*1e3:7.2f} ms  {B*STEPS/t_x:,.0f} tok/s")
print(f"chunked8 + fused encode: e2e {t_f*1e3:7.2f} ms  {B*STEPS/t_f:,.0f} tok/s  loop {max(t_f-t_pre_f,1e-9)/STEPS*1e3:.3f} ms/step")
print("token mismatch fused-vs-xla:", int(np.sum(np.array(ys_x)!=np.array(ys_f))), "/", ys_x.size)
