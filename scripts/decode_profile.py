"""Decode-step component budget + HBM roofline accounting (VERDICT r2 #1).

Times each piece of the int8 KV-cached decode step in isolation on the real
chip (scanned N times inside one jit so tunnel dispatch amortises) and
reports where the step's wall-clock goes vs the analytic HBM-bound floor.

  python scripts/decode_profile.py [--batch 512] [--steps 71]
"""

from __future__ import annotations

import argparse
import json
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
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q

HBM_GBPS = 819.0  # TPU v5e (v5 lite) HBM bandwidth


def timed(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def scan_n(body, n):
    """Wrap a carry->carry body in a lax.scan of n steps, jitted."""

    def fn(carry):
        return jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=n)[0]

    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=71)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    B, T, D, H, V, LYR, FF = args.batch, 72, 512, 8, 4444, 6, 2048
    N = args.steps
    rng = np.random.default_rng(0)

    report = {}

    def per_step(name, t_loop, bytes_per_step=None):
        ms = t_loop / N * 1e3
        row = {"ms_per_step": round(ms, 4)}
        if bytes_per_step:
            floor = bytes_per_step / (HBM_GBPS * 1e9) * 1e3
            row["hbm_floor_ms"] = round(floor, 4)
            row["hbm_fraction"] = round(floor / ms, 3)
            row["mb_per_step"] = round(bytes_per_step / 1e6, 1)
        report[name] = row
        print(f"{name:34s} {ms:8.4f} ms/step"
              + (f"  (floor {row['hbm_floor_ms']:.4f} ms, {row['hbm_fraction']*100:.0f}% of BW)"
                 if bytes_per_step else ""))

    # ---- component: one int8 cache attention (self-attn shape) ----------
    q = jnp.asarray(rng.normal(size=(B, H, 1, D // H)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, T, 1)), jnp.float32)
    vq = jnp.asarray(rng.integers(-127, 128, (B, T, D)), jnp.int8)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, T, 1)), jnp.float32)
    mask = jnp.ones((B, 1, 1, T), bool)

    def attn_body(c):
        ctx = L.int8_cache_attention(c, kq, ks, vq, vs, mask, True)
        return ctx + q * 1e-9  # keep carry shape, force dependence

    kv_bytes = 2 * B * T * D + 2 * B * T * 4
    per_step("int8_cache_attention (x1)", timed(scan_n(attn_body, N), q), kv_bytes)

    # ---- component: one W8A8 projection 512x512 -------------------------
    x = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8)
    sw = jnp.asarray(rng.uniform(0.001, 0.01, (D,)), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)

    def proj_body(c):
        sx = Q.act_scale_per_token(c, 8)
        xq = Q.quantize(c, sx, 8)
        y32 = jax.lax.dot_general(
            xq.reshape(-1, D), wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (y32.astype(jnp.float32) * (sx.reshape(-1, 1) * sw[None, :]) + bias)
        return y.reshape(B, 1, D)

    per_step("w8a8 proj 512x512 (x1)", timed(scan_n(proj_body, N), x), D * D + B * D * 4 * 2)

    # ---- component: FFN pair (512->2048->512) ---------------------------
    w1 = jnp.asarray(rng.integers(-127, 128, (D, FF)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(0.001, 0.01, (FF,)), jnp.float32)
    w2 = jnp.asarray(rng.integers(-127, 128, (FF, D)), jnp.int8)
    s2 = jnp.asarray(rng.uniform(0.001, 0.01, (D,)), jnp.float32)

    def ffn_body(c):
        sx = Q.act_scale_per_token(c, 8)
        xq = Q.quantize(c, sx, 8)
        h32 = jax.lax.dot_general(xq.reshape(-1, D), w1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        h = jax.nn.relu(h32.astype(jnp.float32) * (sx.reshape(-1, 1) * s1[None, :]))
        sh = Q.act_scale_per_token(h, 8)
        hq = Q.quantize(h, sh, 8)
        y32 = jax.lax.dot_general(hq, w2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (sh.reshape(-1, 1) * s2[None, :])
        return y.reshape(B, 1, D)

    per_step("w8a8 ffn 512->2048->512 (x1)", timed(scan_n(ffn_body, N), x),
             2 * D * FF + B * (D + FF + D) * 4)

    # ---- component: fp32 generator + log_softmax ------------------------
    gw = jnp.asarray(rng.normal(size=(D, V)) * 0.02, jnp.float32)
    gb = jnp.zeros((V,), jnp.float32)
    xg = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)

    def gen_body(c):
        y = jax.nn.log_softmax(jnp.dot(c, gw) + gb, axis=-1)
        return c + y[:, :D] * 1e-9

    per_step("generator fp32 + log_softmax", timed(scan_n(gen_body, N), xg),
             D * V * 4 + B * V * 4)

    def gen_body_nologsm(c):
        y = jnp.dot(c, gw) + gb
        return c + y[:, :D] * 1e-9

    per_step("generator fp32, argmax-only", timed(scan_n(gen_body_nologsm, N), xg),
             D * V * 4 + B * V * 4)

    gwq, gsw = Q.quantize_weight_per_channel(gw, 8)

    def gen_body_int8(c):
        sx = Q.act_scale_per_token(c[:, None, :], 8)
        xq = Q.quantize(c[:, None, :], sx, 8)
        y32 = jax.lax.dot_general(xq.reshape(-1, D), gwq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (sx.reshape(-1, 1) * gsw[None, :]) + gb
        return c + y[:, :D] * 1e-9

    per_step("generator int8, argmax-only", timed(scan_n(gen_body_int8, N), xg),
             D * V + B * V * 4)

    # ---- full decode steps, real model ----------------------------------
    from onnx_transformer_tpu.quant import w8a8 as W
    from onnx_transformer_tpu.serving import decode as DE

    cfg = TransformerConfig(5337, V)
    model = Transformer(cfg)
    params = jax.device_put(model.init(jax.random.key(0)))
    sp, lin8 = W.quantize_transformer(model, params, None, mode="int8")

    src = jnp.asarray(rng.integers(4, 5337, (B, T)), jnp.int32)
    sm = jnp.asarray(L.make_src_mask(src))

    dec = jax.jit(lambda p, s, m: DE.greedy_decode(
        model, p, s, m, T, lin=lin8, kv_cache_dtype="int8"))
    t_dec = timed(dec, sp, src, sm, warmup=1, iters=3)
    # analytic bytes for the whole decode step (see VERDICT r2 weak #1):
    dec_w = LYR * (2 * 4 * D * D + 2 * D * FF)           # decoder int8 weights
    kv = LYR * 2 * (B * T * D + B * T * 4)               # self int8 KV + scales
    cross = LYR * 2 * (B * T * D + B * T * 4)            # cross int8 KV + scales
    gen = D * V * 4 + B * V * 4                          # fp32 gen weights + logits
    step_bytes = dec_w + kv + cross + gen
    per_step("FULL greedy step (int8 KV)", t_dec, step_bytes)
    report["full_decode_tokens_per_sec"] = round(B * (T - 1) / t_dec, 1)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
