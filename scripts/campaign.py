"""Fault-injection campaign CLI (reference: experiment.sh ->
parallelized_inject_onnx_transformer.py).

Sweeps layers x fault models x bit positions against the INT8-quantized
model and writes the reference-compatible results CSV
(layer,golden_bleu,faulty_bleu,bit,fault_model).

  python scripts/campaign.py --module encoder --sentences 5 \
      --out results_fault_injection/results.csv
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import collate, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.inject import campaign as C
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.train import checkpoint as CKPT
from onnx_transformer_tpu.train import trainer as T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--scales", default=None)
    ap.add_argument("--module", choices=["encoder", "decoder", "all"], default="encoder")
    ap.add_argument("--fault-models", default="INPUT,WEIGHT,INPUT16,WEIGHT16,RANDOM,RANDOM_BITFLIP")
    ap.add_argument("--bits", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--sentences", type=int, default=5,
                    help="experiments per config (ref: 5 parallel replicas)")
    ap.add_argument("--layers-limit", type=int, default=0)
    ap.add_argument("--inject-step", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--out", default="results_fault_injection/results.csv")
    ap.add_argument("--csv-format", default="full",
                    choices=("full", "reference"),
                    help="'reference' = the ref's 3-column headerless "
                         "node,golden,faulty rows (diffable against "
                         "results_fault_injection/results.csv)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fanout", type=int, default=16,
                    help="experiments per vmapped dispatch (on-device "
                         "replacement for the reference's process Pool)")
    ap.add_argument("--from-json", default=None,
                    help="reference input/*.json descriptor file or directory "
                         "(e.g. /root/reference/input/encoder); overrides "
                         "--module target enumeration")
    ap.add_argument("--attention-targets", action="store_true",
                    help="also sweep the attention QK^T/AV bmm targets")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model)
    template = T.init_state(model, tx, jax.random.key(0)).tree()
    params = jax.device_put(CKPT.restore(args.ckpt, template)["params"])

    if args.scales:
        from onnx_transformer_tpu.quant.smoothquant import load_reference_scales, smooth_params
        params = smooth_params(params, load_reference_scales(args.scales))
    payloads = W.quantize_model_params(model, params)

    fault_models = args.fault_models.split(",")
    bits = [int(b) for b in args.bits.split(",")]

    pairs = load_split(args.data, "test")[: args.sentences]
    src, _ = collate(pairs, vs, vt, args.max_len)
    sm = np.asarray(L.make_src_mask(np.asarray(src)))
    refs = [t.split() for _, t in pairs]

    rng = np.random.default_rng(0)
    if args.from_json:
        paths = args.from_json.split(",")
        specs = C.specs_from_reference_jsons(
            paths if len(paths) > 1 else paths[0],
            fault_models=fault_models, bit_positions=bits,
            inject_step=args.inject_step)
        for s in specs:  # randomised fault sites, like the direct sweep
            s.element = int(rng.integers(0, 512))
            s.row = int(rng.integers(0, 8))
            s.col = int(rng.integers(0, 256))
        targets = sorted({s.target for s in specs})
        print(f"ingested {args.from_json}: {len(targets)} targets")
    else:
        targets = sorted(payloads)
        if args.attention_targets:
            targets += sorted(C.attention_matmul_names(cfg.num_layers))
        if args.module != "all":
            targets = [t for t in targets if t.startswith(args.module)]
        if args.layers_limit:
            targets = targets[: args.layers_limit]
        specs = []
        for t in targets:
            for fm in fault_models:
                for bit in bits if fm not in ("RANDOM",) else [0]:
                    specs.append(C.FaultSpec(
                        target=t, fault_model=fm, bit=bit,
                        element=int(rng.integers(0, 512)),
                        row=int(rng.integers(0, 8)), col=int(rng.integers(0, 256)),
                        seed=int(rng.integers(0, 1 << 31)),
                        inject_step=args.inject_step,
                    ))
    print(f"{len(targets)} targets x {len(fault_models)} fault models -> "
          f"{len(specs)} experiments x {len(pairs)} sentences", flush=True)

    t0 = time.time()
    res = C.run_campaign(
        model, params, payloads, specs, src, sm, refs, vt,
        max_len=args.max_len, csv_path=args.out, fanout=args.fanout,
        csv_format=args.csv_format,
        log_fn=lambda s: print(s, flush=True),
    )
    dt = time.time() - t0
    by_model: dict[str, int] = {}
    for r in res.rows:
        if r["faulty_bleu"] < r["golden_bleu"] - 1e-6:
            by_model[r["fault_model"]] = by_model.get(r["fault_model"], 0) + 1
    degraded = sum(by_model.values())
    summary = ", ".join(f"{m} {n}" for m, n in
                        sorted(by_model.items(), key=lambda kv: -kv[1]))
    print(f"done: {len(res.rows)} rows in {dt:.1f}s "
          f"({len(specs)/max(dt,1e-9):.2f} experiments/s); "
          f"{degraded} rows degraded BLEU ({summary or 'none'}) -> {args.out}")


if __name__ == "__main__":
    main()
