"""Symmetric absmax quantization primitives.

Numeric contract (reference ``quant_linear.py:5-54``): symmetric int8 with
qmax = 2^(bits-1) - 1 = 127, scales clamped at 1e-5 *before* dividing by
qmax, per-channel over the weight out-feature dim, per-token (last-dim
absmax) or per-tensor for activations.  No post-round clamp is needed for
true absmax scales (|x|/scale <= qmax by construction), matching the
reference, but ``clip=True`` is available for calibrated (non-absmax) scales.

Unlike the reference (which only *fake*-quantizes in fp32 and re-quantizes
the weight every forward, ``quant_linear.py:111-119``), these return real
int8/int4 payloads for MXU int matmuls; ``fake_*`` variants reproduce the
reference's fp arithmetic bit-for-bit for parity tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

SCALE_FLOOR = 1e-5


def qmax_for(bits: int) -> int:
    return 2 ** (bits - 1) - 1


def absmax_scale(x: jax.Array, axis, bits: int = 8, keepdims: bool = True) -> jax.Array:
    """clamp(absmax over `axis`, 1e-5) / qmax."""
    s = jnp.max(jnp.abs(x), axis=axis, keepdims=keepdims)
    return jnp.clip(s, SCALE_FLOOR, None) / qmax_for(bits)


def quantize(x: jax.Array, scale: jax.Array, bits: int = 8, clip: bool = False) -> jax.Array:
    q = jnp.round(x / scale)
    if clip:
        q = jnp.clip(q, -qmax_for(bits), qmax_for(bits))
    return q.astype(jnp.int8)


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(scale.dtype) * scale


# ------------------------------------------------------------------ weights

def quantize_weight_per_channel(w: jax.Array, bits: int = 8):
    """w stored (in, out); per-out-channel scales (quant_linear.py:6-17,
    where torch's (out, in) takes absmax over dim=-1 == our axis=0).
    Returns (int8 [in, out], scales [out])."""
    scale = absmax_scale(w, axis=0, bits=bits, keepdims=False)  # [out]
    return quantize(w, scale[None, :], bits), scale


def quantize_weight_per_tensor(w: jax.Array, bits: int = 8):
    scale = absmax_scale(w, axis=None, bits=bits, keepdims=False)
    return quantize(w, scale, bits), scale


def fake_quant_weight_per_channel(w: jax.Array, bits: int = 8) -> jax.Array:
    q, s = quantize_weight_per_channel(w, bits)
    return dequantize(q, s[None, :])


# -------------------------------------------------------------- activations

def act_scale_per_token(x: jax.Array, bits: int = 8) -> jax.Array:
    """[..., d] -> [..., 1] scales (quant_linear.py:30-43)."""
    return absmax_scale(x, axis=-1, bits=bits, keepdims=True)


def quantize_act_per_token(x: jax.Array, bits: int = 8):
    s = act_scale_per_token(x, bits)
    return quantize(x, s, bits), s


def fake_quant_act_per_token(x: jax.Array, bits: int = 8) -> jax.Array:
    q, s = quantize_act_per_token(x, bits)
    return dequantize(q, s)


def quantize_act_per_tensor(x: jax.Array, bits: int = 8):
    s = absmax_scale(x, axis=None, bits=bits, keepdims=False)
    return quantize(x, s, bits), s


def fake_quant_act_per_tensor(x: jax.Array, bits: int = 8) -> jax.Array:
    q, s = quantize_act_per_tensor(x, bits)
    return dequantize(q, s)


# ------------------------------------------------------------ int4 packing

def pack_int4(q: jax.Array) -> jax.Array:
    """int8 values in [-8, 7] -> packed uint8 nibbles (pairs along axis 0).
    q: [in, out] with even in-dim; returns [in//2, out]."""
    lo = (q[0::2] & 0xF).astype(jnp.uint8)
    hi = (q[1::2] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> int8 [in, out] with sign extension."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    # sign-extend nibbles
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    out = jnp.zeros((packed.shape[0] * 2,) + packed.shape[1:], jnp.int8)
    out = out.at[0::2].set(lo)
    out = out.at[1::2].set(hi)
    return out


# ------------------------------------------------- straight-through (QAT)

@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def fake_quant_ste(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """Fake-quant with straight-through gradients (QAT; the reference's
    Brevitas QuantIdentity path, quantized_attention.py:32-47)."""
    qm = qmax_for(bits)
    q = jnp.clip(ste_round(x / scale), -qm, qm)
    return q * scale
