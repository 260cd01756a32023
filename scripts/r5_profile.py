"""Profile the chunk-staged decode on-chip: jax.profiler trace -> chrome
trace json -> per-fusion device-time aggregation.  Answers where the
~0.4 ms/step above the dot floor goes (VERDICT r4 #1).

  python scripts/r5_profile.py [--batch 512] [--chunk 8] [--what decode|prefill]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--what", default="decode")
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    B = args.batch

    vs, vt = load_iwslt14_vocab()
    model = Transformer(TransformerConfig(len(vs), len(vt)))
    from onnx_transformer_tpu.train import checkpoint as CK
    from onnx_transformer_tpu.train import trainer as T

    tx = T.make_optimizer(model.cfg.d_model)
    tmpl = T.init_state(model, tx, jax.random.key(0)).tree()
    params = jax.device_put(CK.restore(args.ckpt, tmpl)["params"])
    pairs = load_split("/root/reference/data", "test")[:B]
    src = jnp.asarray(collate(pairs, vs, vt, MAX_LEN)[0])
    sm = jnp.asarray(L.make_src_mask(src))
    from onnx_transformer_tpu.quant.smoothquant import load_reference_scales

    scales = load_reference_scales(
        "onnx_transformer_tpu/artifacts/transformer_scales.npz")
    sp, lin8 = W.quantize_transformer(model, params, scales, mode="int8")
    linf = W.make_w8a8_linear_impl(lin8.payloads, mode="fused")
    pl8 = lin8.payloads
    rbf = linf.rebind
    stacked = jax.device_put(SD.build_stacked(model, sp, pl8))

    if args.what == "decode":
        fn = jax.jit(lambda p, pl, st, s, m: SD.greedy_decode_chunked(
            model, p, st, s, m, MAX_LEN, chunk=args.chunk, lin=rbf(pl)))
        fargs = (sp, pl8, stacked, src, sm)
    else:
        def prefill(p, pl, s, m):
            cross = model.cross_kv(p, model.encode(p, s, m, lin=rbf(pl)),
                                   lin=rbf(pl), cache_dtype="int8")
            return sum(jnp.sum(lc["cross_k"].astype(jnp.int32))
                       + jnp.sum(lc["cross_v"].astype(jnp.int32))
                       for lc in cross)
        fn = jax.jit(prefill)
        fargs = (sp, pl8, src, sm)

    out = fn(*fargs)
    jax.tree.map(np.asarray, out)          # compile + complete
    t0 = time.perf_counter()
    out = fn(*fargs)
    jax.tree.map(np.asarray, out)
    wall = time.perf_counter() - t0
    print(f"wall (1 call): {wall*1e3:.1f} ms")

    logdir = "/tmp/r5_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = fn(*fargs)
    jax.tree.map(np.asarray, out)
    jax.profiler.stop_trace()

    tr = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert tr, os.popen(f"find {logdir} -type f").read()
    with gzip.open(tr[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device lanes: pick pids whose process name mentions TPU/TensorCore
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in name_by_pid.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and (not dev_pids or e.get("pid") in dev_pids):
            d = float(e.get("dur", 0.0))
            nm = e["name"]
            agg[nm] += d
            count[nm] += 1
            total += d
    print(f"pids: { {pid: name_by_pid.get(pid,'') for pid in dev_pids} }")
    print(f"total device-event time: {total/1e3:.1f} ms over {len(agg)} op names")
    for nm, d in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d/1e3:9.3f} ms  x{count[nm]:5d}  {nm[:110]}")


if __name__ == "__main__":
    main()
