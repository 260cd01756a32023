"""Device-op time breakdown for the decode paths, from jax.profiler xplane
traces (the round-3 'profiler-verified' methodology, now scripted).

Traces a jitted call on the real chip, parses the xplane.pb with TF's
bundled proto, and prints top ops by total self time on the TPU device
plane, with a category rollup (dots / DUS / fusion / convert / copy...).

  python scripts/trace_ops.py --which general|chunked_<C>|prefill_general|prefill_fused
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def summarize(logdir: str, top: int = 25, steps: int = 1):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    by_name = collections.Counter()
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and line.name != "" and "op" not in line.name.lower():
                continue
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9   # ms
                by_name[nm] += dur
                total += dur
    cats = collections.Counter()
    for nm, ms in by_name.items():
        base = re.sub(r"[.\d]+$", "", nm)
        if "dynamic-update-slice" in nm:
            c = "dynamic-update-slice"
        elif nm.startswith("fusion") or base == "fusion":
            c = "fusion(elementwise)"
        elif "convolution" in nm or nm.startswith("dot") or "dot" in base:
            c = "dot"
        elif "copy" in nm:
            c = "copy"
        elif "convert" in nm:
            c = "convert"
        elif "slice" in nm:
            c = "slice"
        elif "transpose" in nm:
            c = "transpose"
        elif "broadcast" in nm:
            c = "broadcast"
        else:
            c = base
        cats[c] += ms
    print(f"== total device op time: {total:.2f} ms over trace "
          f"({total/steps:.3f} ms/step-equivalent)")
    print("-- categories:")
    for c, ms in cats.most_common(14):
        print(f"   {c:28s} {ms:9.3f} ms  ({ms/steps:8.4f}/step)")
    print(f"-- top {top} ops:")
    for nm, ms in by_name.most_common(top):
        print(f"   {nm:52s} {ms:9.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="stacked_unroll")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--len", type=int, default=72)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    B, MAX_LEN = args.batch, args.len

    from onnx_transformer_tpu import Transformer, TransformerConfig
    from onnx_transformer_tpu.data.dataset import collate, load_split
    from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
    from onnx_transformer_tpu.models import stacked_decode as SD
    from onnx_transformer_tpu.ops import layers as L
    from onnx_transformer_tpu.quant import w8a8 as W
    from onnx_transformer_tpu.serving import decode as D

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    params = jax.device_put(model.init(jax.random.key(0)))
    pairs = (load_split("/root/reference/data", "test")[:B]
             if os.path.exists("/root/reference/data")
             else [("ein test .", "a test .")] * B)
    src_np, _ = collate(pairs, vs, vt, MAX_LEN)
    src = jnp.asarray(src_np)
    sm = jnp.asarray(L.make_src_mask(src))
    sp, lin8 = W.quantize_transformer(model, params, mode="int8")
    stacked = jax.device_put(SD.build_stacked(model, sp, lin8.payloads))
    pl8, rb8 = lin8.payloads, lin8.rebind

    which = args.which
    steps = MAX_LEN - 1
    if which == "general":
        fn = jax.jit(lambda p, pl, s, m: D.greedy_decode(
            model, p, s, m, MAX_LEN, lin=rb8(pl), kv_cache_dtype="int8"))
        call = lambda: fn(sp, pl8, src, sm)
    elif which.startswith("chunked"):
        c = int(which.split("_")[1]) if "_" in which else 6
        fn = jax.jit(lambda p, pl, st, s, m: SD.greedy_decode_chunked(
            model, p, st, s, m, MAX_LEN, chunk=c, lin=rb8(pl)))
        call = lambda: fn(sp, pl8, stacked, src, sm)
        steps = MAX_LEN
    elif which == "prefill_general":
        steps = 1

        def probe(p, pl, s, m):
            cache = model.init_cache(p, model.encode(p, s, m, lin=rb8(pl)),
                                     MAX_LEN, lin=rb8(pl), cache_dtype="int8")
            return sum(jnp.sum(lc["cross_k"].astype(jnp.int32))
                       + jnp.sum(lc["cross_v"].astype(jnp.int32))
                       for lc in cache["layers"])

        fn = jax.jit(probe)
        call = lambda: fn(sp, pl8, src, sm)
    elif which == "prefill_fused":
        steps = 1
        linf = W.make_w8a8_linear_impl(pl8, mode="fused")
        rbf = linf.rebind

        def probe(p, pl, s, m):
            cache = model.init_cache(p, model.encode(p, s, m, lin=rbf(pl)),
                                     MAX_LEN, lin=rbf(pl), cache_dtype="int8")
            return sum(jnp.sum(lc["cross_k"].astype(jnp.int32))
                       + jnp.sum(lc["cross_v"].astype(jnp.int32))
                       for lc in cache["layers"])

        fn = jax.jit(probe)
        call = lambda: fn(sp, pl8, src, sm)
    else:
        raise SystemExit(f"unknown --which {which}")

    np.asarray(jax.tree.leaves(call())[0])   # compile + warm
    logdir = tempfile.mkdtemp(prefix=f"trace_{which}_")
    with jax.profiler.trace(logdir):
        out = call()
        np.asarray(jax.tree.leaves(out)[0])
    print(f"[{which}] trace in {logdir}")
    summarize(logdir, top=args.top, steps=steps)


if __name__ == "__main__":
    main()
