"""W8A8 quantized linears: real-int8 storage + pluggable kernels.

Capability parity with the reference's ``W8A8Linear`` (``quant_linear.py:56-149``)
and model surgery (``get_quantized_model.py:150-172``):

- per-out-channel absmax int8 weights, per-token absmax int8 activations;
- the 4 attention projections and both FFN linears of every layer are
  quantized; q/k/v (bmm inputs) additionally re-quantize their *outputs*
  (``quantize_bmm_input=True``);
- the generator and embeddings stay fp, as in the reference.

Unlike the reference — which stores fp weights and fake-quantizes both
operands every forward, then runs an fp32 matmul — weights are quantized
once to real int8 and the matmul runs int8 x int8 -> int32 on the MXU with
a fused (sx * sw) scale epilogue.  ``mode="fake"`` reproduces the
reference's fp arithmetic exactly for parity tests.

Injection seams: the int8 operands are tapped as ``<name>.x_q`` / available
as ``<name>.w_q`` payloads, so bit-level faults hit the *integer* domain
pre-dequant — the same injection point as the reference's
DequantizeLinear-input flips (``inject_utils/layers.py:87-142``) — without
de-fusing the kernel.
"""

from __future__ import annotations

from typing import Callable, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu.models.transformer import Transformer, default_linear
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q

Mode = Literal["int8", "fake", "pallas", "fused"]

# "fused" mode routes a call through the fused-quantize Pallas kernels when
# the token count is at least this large (prefill/encoder/training shapes);
# below it the XLA int8 chain wins (kernel launch overhead dominates at the
# decode step's [B, 1, D] shapes — RESULTS r2 kernel verdict).
FUSED_MIN_TOKENS = 8192


def quantized_linear_names(num_layers: int) -> dict[str, bool]:
    """name -> quantize_output flag (True for q/k/v bmm inputs,
    get_quantized_model.py:160-170)."""
    out: dict[str, bool] = {}
    for i in range(num_layers):
        for j in range(4):
            out[f"encoder.layers.{i}.self_attn.linears.{j}"] = j < 3
        out[f"encoder.layers.{i}.feed_forward.w_1"] = False
        out[f"encoder.layers.{i}.feed_forward.w_2"] = False
    for i in range(num_layers):
        for att in ("self_attn", "src_attn"):
            for j in range(4):
                out[f"decoder.layers.{i}.{att}.linears.{j}"] = j < 3
        out[f"decoder.layers.{i}.feed_forward.w_1"] = False
        out[f"decoder.layers.{i}.feed_forward.w_2"] = False
    return out


def _param_leaf(params: dict, name: str) -> dict:
    """Resolve a reference-style linear name to its param dict."""
    if name == "generator.proj":
        return params["generator"]
    parts = name.split(".")
    stack, idx = parts[0], int(parts[2])
    lp = params[stack]["layers"][idx]
    if parts[3] in ("self_attn", "src_attn"):
        key = {"0": "q", "1": "k", "2": "v", "3": "o"}[parts[5]]
        return lp[parts[3]][key]
    assert parts[3] == "feed_forward"
    return lp["ffn"]["w1" if parts[4] == "w_1" else "w2"]


def is_quantized_output(name: str) -> bool:
    """Static predicate: q/k/v projections re-quantize their output
    (quantize_bmm_input=True, get_quantized_model.py:160-170).  Kept out of
    the payload dict so payloads stay an arrays-only pytree (jit-safe)."""
    return ".linears." in name and name.rsplit(".", 1)[-1] in ("0", "1", "2")


def quantize_model_params(model: Transformer, params: dict, bits: int = 8,
                          include_generator: bool = False) -> dict:
    """Build the quantized-weight payload dict (arrays only, jit-safe):
    name -> {wq int8 [in,out], sw f32 [out], b f32 [out]}.

    ``include_generator`` additionally quantizes the output projection
    (the reference keeps it fp, generator.py:12 — this is an opt-in speed
    knob for serving: the generator is the single largest weight read of the
    decode step at 9.1 MB fp32 vs 2.3 MB int8; BLEU impact is measured in
    RESULTS.md)."""
    payloads = {}
    names = dict(quantized_linear_names(model.cfg.num_layers))
    if include_generator:
        names["generator.proj"] = False
    for name in names:
        leaf = _param_leaf(params, name)
        wq, sw = Q.quantize_weight_per_channel(jnp.asarray(leaf["w"], jnp.float32), bits)
        payloads[name] = {
            "wq": wq,
            "sw": sw,
            "b": jnp.asarray(leaf["b"], jnp.float32),
        }
    return payloads


def make_w8a8_linear_impl(
    payloads: dict,
    mode: Mode = "int8",
    bits: int = 8,
) -> Callable:
    """LinearImpl drop-in for Transformer(..., lin=...) — the TPU-native
    equivalent of swapping nn.Linear -> W8A8Linear."""
    if mode == "pallas":
        from onnx_transformer_tpu.ops.pallas.w8a8_matmul import w8a8_matmul
    if mode == "fused":
        from onnx_transformer_tpu.ops.pallas.w8a8_matmul import (
            quant_w8a8_matmul_q8,
            quant_w8a8_matmul_qout,
        )

    def lin(name: str, x, w, b, taps=None, inject=None):
        p = payloads.get(name)
        if p is None:
            return default_linear(name, x, w, b, taps, inject)
        if (mode == "fused" and taps is None and inject is None and bits == 8
                and int(np.prod(x.shape[:-1])) >= FUSED_MIN_TOKENS
                and is_quantized_output(name)
                and x.shape[-1] <= 2048 and p["wq"].shape[-1] <= 2048):
            # one-kernel fused path for the q/k/v projections: quantize +
            # MXU + dequant + per-token OUTPUT fake-quant in one HBM pass —
            # measured 1.9 vs 3.0 ms at the [36864,512]x[512,512] encoder
            # shape.  The non-qout linears stay on the XLA chain (XLA's own
            # fusion beats the plain kernel there, measured 2.4 vs 2.5+).
            # Ulp-identical to the jnp chain below (FMA contraction).
            # Taps/injection need the x_q/out seams -> fall through.
            return quant_w8a8_matmul_qout(x, p["wq"], p["sw"], p["b"],
                                          block_m=512)
        x = L.tap(name, x, taps, inject)  # calibration-compatible input tap
        sx = Q.act_scale_per_token(x, bits)
        xq = Q.quantize(x, sx, bits)
        xq = L.tap(f"{name}.x_q", xq, taps, inject)
        wq = L.tap(f"{name}.w_q", p["wq"], taps, inject)
        if mode == "fake":
            # reference arithmetic: fp32 matmul of dequantized operands
            y = jnp.dot(Q.dequantize(xq, sx), Q.dequantize(wq, p["sw"][None, :]),
                        preferred_element_type=jnp.float32)
            y = y + p["b"]
        elif mode == "pallas":
            y = w8a8_matmul(xq, sx[..., 0], wq, p["sw"], p["b"])
        else:
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
            y = Q.fake_quant_act_per_token(y, bits)
            y = L.tap(f"{name}.out_q", y, taps, inject)
        return y

    # q/k/v outputs sit exactly on the per-token int8 grid (fake-quant above)
    # -> the decode attention may recover their int8 representation losslessly
    # and run the score dot in int8 on the MXU (int8_cache_attention_qdot)
    lin.quantized_output_grid = True

    if mode == "fused":
        def linear_q8(name, x, w=None, b=None):
            """Producer form for int8-cache consumers (cross-KV prefill):
            (int8 rows, per-token scales) straight from the kernel — the
            fp32 projection output never touches HBM.  Returns None when
            the call cannot take the kernel path (caller falls back to the
            fake-quant chain + quantize_act_per_token)."""
            p = payloads.get(name)
            if (p is None or not is_quantized_output(name)
                    or int(np.prod(x.shape[:-1])) < FUSED_MIN_TOKENS
                    or x.shape[-1] > 2048 or p["wq"].shape[-1] > 2048):
                return None
            return quant_w8a8_matmul_q8(x, p["wq"], p["sw"], p["b"],
                                        block_m=512)

        lin.linear_q8 = linear_q8
    # jit-boundary contract: closure-captured device arrays (jit consts) put
    # the tunneled TPU runtime on a permanent ~28 ms-per-sync slow path
    # (measured: consts-in-closure 31 ms/call vs consts-as-args 0.14 ms).
    # Callers jitting over this impl should pass ``lin.payloads`` as a real
    # argument and rebuild the impl inside the trace via ``lin.rebind``.
    lin.payloads = payloads
    lin.mode = mode   # engine fast-path gate: int8-chain numerics only
    lin.rebind = lambda p: make_w8a8_linear_impl(p, mode, bits)
    return lin


def quantize_transformer(
    model: Transformer,
    params: dict,
    act_scales: Optional[dict] = None,
    alpha: float = 0.5,
    mode: Mode = "int8",
    bits: int = 8,
    include_generator: bool = False,
):
    """Full PTQ pipeline (get_quantized_model.get_quantized:174-178):
    SmoothQuant-migrate with calibrated scales, then quantize.  Returns
    (smoothed_params, linear_impl) — run any model method with
    ``lin=linear_impl`` and the smoothed params."""
    from onnx_transformer_tpu.quant.smoothquant import smooth_params

    if act_scales is not None:
        params = smooth_params(params, act_scales, alpha)
    payloads = quantize_model_params(model, params, bits, include_generator)
    return params, make_w8a8_linear_impl(payloads, mode, bits)
