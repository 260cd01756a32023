"""Calibrate activation scales for PTQ (reference: get_quantized_scales.py).

Runs the trained model over <= num-samples validation batches with input
taps on all 96 linears, reduces per-channel absmax on device, saves an .npz
scales artifact consumable by quantize_transformer / smooth_params.

  python scripts/calibrate.py --ckpt checkpoints/iwslt14/model_final.npz \
      --out scales/transformer_scales.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import BucketedLoader, load_split
from onnx_transformer_tpu.data.vocab import load_iwslt14_vocab
from onnx_transformer_tpu.quant.calibrate import get_act_scales, save_scales
from onnx_transformer_tpu.train import checkpoint as CKPT
from onnx_transformer_tpu.train import trainer as T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--ckpt", default="checkpoints/iwslt14/model_final.npz")
    ap.add_argument("--out", default="scales/transformer_scales.npz")
    ap.add_argument("--num-samples", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--max-padding", type=int, default=128)  # get_quantized_scales.py main()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    vs, vt = load_iwslt14_vocab()
    cfg = TransformerConfig(len(vs), len(vt))
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model)
    template = T.init_state(model, tx, jax.random.key(0)).tree()
    params = CKPT.restore(args.ckpt, template)["params"]

    loader = BucketedLoader(
        load_split(args.data, "valid"), vs, vt,
        batch_size=args.batch_size, max_padding=args.max_padding,
        shuffle=False, seed=0,
    )
    scales = get_act_scales(model, params, loader, num_samples=args.num_samples)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_scales(scales, args.out)
    print(f"saved {len(scales)} per-channel scale tensors -> {args.out}")


if __name__ == "__main__":
    main()
