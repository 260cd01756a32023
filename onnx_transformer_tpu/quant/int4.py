"""INT4 weight path: W4A8 deployment + QAT training.

Capability parity with the reference's 4-bit story (``README.md:9-12``:
swap Brevitas ``QuantLinear``s in, QAT-train; ``generator.py:5`` /
``inject_main.py:403`` set ``bit_width = 4``; ``quantized_attention.py`` /
``quantized_position_feed_forward.py`` implement the 8/4-bit QuantIdentity
fake-quant chains), redesigned TPU-first:

- **QAT**: ``make_qat_linear_impl`` fake-quantizes weights to ``w_bits`` and
  activations to ``a_bits`` with straight-through-estimator rounding —
  a differentiable drop-in ``lin`` for the training forward.  This replaces
  the reference's 12-QuantIdentity Brevitas attention; because our scales
  are computed per-token/per-channel on the fly, no shape-specialised
  ``num_tokens=71/72`` modules are needed (quantized_model.py:22-26).
- **Deployment**: ``quantize_model_params_int4`` produces per-channel int4
  weights stored as packed nibbles (2 weights/byte in HBM); the matmul
  computes int8(int4-valued) x int8 -> int32 on the MXU.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from onnx_transformer_tpu.models.transformer import Transformer, default_linear
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q
from onnx_transformer_tpu.quant import w8a8 as W8
from onnx_transformer_tpu.quant.w8a8 import (
    _param_leaf,
    is_quantized_output,
    quantized_linear_names,
)


def make_qat_linear_impl(w_bits: int = 4, a_bits: int = 8) -> Callable:
    """Differentiable fake-quant linear for QAT training (STE gradients)."""

    def lin(name: str, x, w, b, taps=None, inject=None):
        if name == "generator.proj":
            # reference QAT generator uses bit_width=4 QuantLinear
            # (generator.py:5,12 commented config) — weight-only quant here
            wq = Q.fake_quant_ste(w, Q.absmax_scale(w, axis=0, bits=w_bits), w_bits)
            return L.tap(name + ".out", L.linear(L.tap(name, x, taps, inject), wq, b),
                         taps, inject)
        if ".linears." not in name and "feed_forward" not in name:
            return default_linear(name, x, w, b, taps, inject)
        x = L.tap(name, x, taps, inject)
        xq = Q.fake_quant_ste(x, Q.act_scale_per_token(x, a_bits), a_bits)
        wq = Q.fake_quant_ste(w, Q.absmax_scale(w, axis=0, bits=w_bits), w_bits)
        y = L.linear(xq, wq, b)
        y = L.tap(name + ".out", y, taps, inject)
        if is_quantized_output(name):
            y = Q.fake_quant_ste(y, Q.act_scale_per_token(y, a_bits), a_bits)
        return y

    return lin


def quantize_model_params_int4(model: Transformer, params: dict) -> dict:
    """name -> {wq_packed uint8 [in//2, out], sw f32 [out], b f32 [out]}."""
    payloads = {}
    for name in quantized_linear_names(model.cfg.num_layers):
        leaf = _param_leaf(params, name)
        w = jnp.asarray(leaf["w"], jnp.float32)
        sw = Q.absmax_scale(w, axis=0, bits=4, keepdims=False)
        wq = Q.quantize(w, sw[None, :], bits=4, clip=True)
        payloads[name] = {
            "wq_packed": Q.pack_int4(wq),
            "sw": sw,
            "b": jnp.asarray(leaf["b"], jnp.float32),
        }
    return payloads


def make_w4a8_linear_impl(payloads: dict, a_bits: int = 8,
                          fused: bool = True) -> Callable:
    """Deployment impl: packed-int4 weights, int8 activations.

    ``fused``: route big-shape calls (prefill/encoder/eval forward) through
    the packed-int4 Pallas kernel — nibbles unpack in VMEM after the DMA,
    so weight HBM reads are HALF the int8 path's and no unpacked int8
    weight tensor ever materialises (the XLA fallback below rebuilds one
    per call — XLA hoists it out of decode loops, so the int4 DECODE
    step's weight reads are int8-sized; the kernel is where the int4
    bandwidth story is real)."""
    if fused:
        from onnx_transformer_tpu.ops.pallas.w8a8_matmul import (
            quant_w4a8_matmul,  # noqa: F401 (kept for non-qout callers)
            quant_w4a8_matmul_qout,
        )

    def lin(name: str, x, w, b, taps=None, inject=None):
        p = payloads.get(name)
        if p is None:
            return default_linear(name, x, w, b, taps, inject)
        if (fused and taps is None and inject is None and a_bits == 8
                and int(np.prod(x.shape[:-1])) >= W8.FUSED_MIN_TOKENS
                and is_quantized_output(name)
                and x.shape[-1] <= 4096
                and p["wq_packed"].shape[-1] % min(512, p["wq_packed"].shape[-1]) == 0):
            # kernel only for the quantized-output q/k/v projections,
            # mirroring the int8 fused gating: XLA's own fusion beats the
            # plain kernel on the other linears (RESULTS r4 finding 4),
            # and routing the FFN through it was the r4 int4-row
            # regression suspect (BENCH_r04 248.7k vs the ~290k claim)
            return quant_w4a8_matmul_qout(x, p["wq_packed"], p["sw"],
                                          p["b"], block_m=512)
        x = L.tap(name, x, taps, inject)
        sx = Q.act_scale_per_token(x, a_bits)
        xq = Q.quantize(x, sx, a_bits)
        xq = L.tap(f"{name}.x_q", xq, taps, inject)
        wq = Q.unpack_int4(p["wq_packed"])  # int8-valued int4s [in, out]
        wq = L.tap(f"{name}.w_q", wq, taps, inject)
        lead = xq.shape[:-1]
        y32 = jax.lax.dot_general(
            xq.reshape(-1, xq.shape[-1]), wq,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(jnp.float32) * (sx.reshape(-1, 1) * p["sw"][None, :])
        y = (y + p["b"]).reshape(*lead, -1)
        y = L.tap(f"{name}.out", y, taps, inject)
        if is_quantized_output(name):
            y = Q.fake_quant_act_per_token(y, a_bits)
        return y

    lin.quantized_output_grid = True

    if fused:
        from onnx_transformer_tpu.ops.pallas.w8a8_matmul import quant_w4a8_matmul_q8

        def linear_q8(name, x, w=None, b=None):
            """int8-rows+scales producer for the int8 cross-KV cache —
            the W4A8 analogue of quant/w8a8.py's linear_q8 (None = caller
            falls back to the fake-quant chain)."""
            p = payloads.get(name)
            if (p is None or not is_quantized_output(name) or a_bits != 8
                    or int(np.prod(x.shape[:-1])) < W8.FUSED_MIN_TOKENS
                    or x.shape[-1] > 2048 or p["wq_packed"].shape[-1] > 2048):
                return None
            return quant_w4a8_matmul_q8(x, p["wq_packed"], p["sw"], p["b"],
                                        block_m=512)

        lin.linear_q8 = linear_q8
    # see quant/w8a8.py: pass payloads as jit args, not closure consts
    lin.payloads = payloads
    lin.rebind = lambda p: make_w4a8_linear_impl(p, a_bits, fused)
    return lin
