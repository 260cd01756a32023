"""Export CLI: serve-format StableHLO bundles of the IWSLT14 model.

The reference's export driver is ``output.py:633-671`` (QCDQ ONNX encoder +
decoder graphs, then qonnx cleanup).  Here one command exports the encoder
and the full KV-cached greedy-decode program per batch bucket, fp32 or
W8A8-int8 (quantized weights baked into the graph), plus a weights/config
manifest.

  python scripts/export.py --mode int8 --out exports/iwslt14_int8 \
      --batch-sizes 1,8 --scales onnx_transformer_tpu/artifacts/transformer_scales.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.export.serialize import export_model
from onnx_transformer_tpu.models.transformer import default_linear
from onnx_transformer_tpu.train import checkpoint as CKPT
from onnx_transformer_tpu.train import trainer as T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--scales",
                    default="onnx_transformer_tpu/artifacts/transformer_scales.npz")
    ap.add_argument("--mode", choices=["fp32", "int8"], default="int8")
    ap.add_argument("--kv-cache", choices=["fp32", "int8"], default=None,
                    help="defaults to --mode")
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--src-len", type=int, default=72)
    ap.add_argument("--max-len", type=int, default=72)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--onnx", action="store_true",
                    help="also emit QDQ encoder.onnx/decoder.onnx (weight-"
                         "QDQ graphs any ONNX runtime loads; the reference's "
                         "serve format, encoder_decoder.py:31-52)")
    ap.add_argument("--onnx-qcdq", action="store_true",
                    help="with --onnx: bake static activation QCDQ pairs "
                         "from the calibrated scales (Brevitas-QCDQ "
                         "analogue, encoder_decoder.py:41-52)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model)
    template = T.init_state(model, tx, jax.random.key(0)).tree()
    params = CKPT.restore(args.ckpt, template)["params"]

    lin = default_linear
    kv = args.kv_cache or args.mode
    from onnx_transformer_tpu.quant.smoothquant import load_reference_scales

    scales = (load_reference_scales(args.scales)
              if args.scales and os.path.exists(args.scales) else None)
    if args.mode == "int8":
        from onnx_transformer_tpu.quant import w8a8 as W

        params, lin = W.quantize_transformer(model, params, scales, mode="int8")

    out = args.out or f"exports/iwslt14_{args.mode}"
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    export_model(model, params, out, batch_sizes=batch_sizes,
                 src_len=args.src_len, max_len=args.max_len, lin=lin,
                 mode=args.mode, kv_cache_dtype=kv)
    if args.onnx:
        from onnx_transformer_tpu.export.onnx_qdq import export_qdq_onnx
        from onnx_transformer_tpu.quant import w8a8 as W

        payloads = W.quantize_model_params(model, params)
        # --onnx-qcdq additionally bakes static activation QCDQ pairs from
        # the calibrated scales (the reference's Brevitas-QCDQ analogue)
        paths = export_qdq_onnx(
            model, params, payloads, out,
            act_scales=scales if args.onnx_qcdq else None)
        for k, pth in paths.items():
            print(f"  {k}.onnx: {os.path.getsize(pth)/1e6:.1f} MB")
    total = sum(os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
    print(f"exported {args.mode} bundle -> {out} ({total/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
