"""Bit-flip fault primitives, vectorised for device execution.

Re-provides ``inject_utils/layers.py`` (fp32/fp16 bit flips with NaN->0
clamping, int8/int4 XOR flips with two's-complement wraparound) as pure
jnp transforms on whole tensors — no per-element python/struct loops, so a
fault campaign can run thousands of experiments as one vmapped program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def flip_int8_bit(q: jax.Array, bit: int) -> jax.Array:
    """XOR bit (0..7) on int8 two's-complement (inject_utils/layers.py:61-68)."""
    u = q.astype(jnp.uint8) ^ jnp.uint8(1 << bit)
    return u.astype(jnp.int8)


def flip_int4_bit(q: jax.Array, bit: int) -> jax.Array:
    """XOR bit (0..3) within an int4 value stored in int8
    (inject_utils/layers.py:48-59): wraparound within [-8, 7]."""
    u = (q.astype(jnp.int32) & 0xF) ^ (1 << bit)
    return jnp.where(u > 7, u - 16, u).astype(jnp.int8)


def flip_float32_bit(x: jax.Array, bit: int) -> jax.Array:
    """XOR bit (0..31) of the fp32 pattern; NaN results clamp to 0
    (inject_utils/layers.py:24-33)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    f = jax.lax.bitcast_convert_type(u ^ jnp.uint32(1 << bit), jnp.float32)
    return jnp.where(jnp.isnan(f), 0.0, f)


def flip_float16_bit(x: jax.Array, bit: int) -> jax.Array:
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float16), jnp.uint16)
    f = jax.lax.bitcast_convert_type(u ^ jnp.uint16(1 << bit), jnp.float16)
    f = jnp.where(jnp.isnan(f), jnp.float16(0.0), f)
    return f.astype(x.dtype)


def random_float32(rng: jax.Array, shape=()) -> jax.Array:
    """Random fp32 bit pattern (delta_init, inject_utils/layers.py:13-22),
    NaN clamped to 0."""
    bits = jax.random.bits(rng, (), jnp.uint32) if shape == () else jax.random.bits(rng, shape, jnp.uint32)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(jnp.isnan(f), 0.0, f)


def _flat_update(x: jax.Array, flat_idx, new_vals) -> jax.Array:
    flat = x.reshape(-1)
    flat = flat.at[flat_idx].set(new_vals)
    return flat.reshape(x.shape)


def flip_element_bit(x: jax.Array, flat_idx, bit: int, kind: str) -> jax.Array:
    """Flip one element's bit in a tensor. kind: int8|int4|float32|float16."""
    flat = x.reshape(-1)
    v = flat[flat_idx]
    if kind == "int8":
        nv = flip_int8_bit(v, bit)
    elif kind == "int4":
        nv = flip_int4_bit(v, bit)
    elif kind == "float32":
        nv = flip_float32_bit(v, bit)
    elif kind == "float16":
        nv = flip_float16_bit(v, bit)
    else:
        raise ValueError(kind)
    return flat.at[flat_idx].set(nv).reshape(x.shape)


def flip_row_segment(x: jax.Array, row, col_start, width: int, bit: int, kind: str) -> jax.Array:
    """INPUT16 fault (onnx_optimized_inference.py:111-150): ``width``
    contiguous elements of one row share a flipped bit — a systolic-array
    row fault.  x: [..., rows, cols] treated as 2D on the last two dims."""
    lead = x.shape[:-2]
    r, c = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, r, c)
    cols = jnp.arange(c)
    colmask = (cols >= col_start) & (cols < col_start + width)
    rowmask = jnp.arange(r) == row
    mask = rowmask[:, None] & colmask[None, :]
    flip = {"int8": flip_int8_bit, "int4": flip_int4_bit,
            "float32": flip_float32_bit, "float16": flip_float16_bit}[kind]
    out = jnp.where(mask[None], flip(x2, bit), x2)
    return out.reshape(*lead, r, c)


def flip_col_segment(x: jax.Array, col, row_start, height: int, bit: int, kind: str) -> jax.Array:
    """WEIGHT16 fault (onnx_optimized_inference.py:151-186): up to ``height``
    contiguous elements of one column share a flipped bit."""
    lead = x.shape[:-2]
    r, c = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, r, c)
    rows = jnp.arange(r)
    rowmask = (rows >= row_start) & (rows < row_start + height)
    colmask = jnp.arange(c) == col
    mask = rowmask[:, None] & colmask[None, :]
    flip = {"int8": flip_int8_bit, "int4": flip_int4_bit,
            "float32": flip_float32_bit, "float16": flip_float16_bit}[kind]
    out = jnp.where(mask[None], flip(x2, bit), x2)
    return out.reshape(*lead, r, c)


def set_random_value(x: jax.Array, rng: jax.Array) -> jax.Array:
    """RANDOM fault (onnx_optimized_inference.py:59-66): one random fp32
    value at one random flat index of the output tensor."""
    r1, r2 = jax.random.split(rng)
    idx = jax.random.randint(r1, (), 0, x.size)
    val = random_float32(r2)
    return _flat_update(x, idx, val.astype(x.dtype))


def flip_random_output_bit(x: jax.Array, rng: jax.Array, bit: int) -> jax.Array:
    """RANDOM_BITFLIP fault (onnx_optimized_inference.py:67-72): fp32 bit
    flip at a random output index."""
    idx = jax.random.randint(rng, (), 0, x.size)
    return flip_element_bit(x, idx, bit, "float32")


def count_mismatches(a: jax.Array, b: jax.Array) -> int:
    """total_bits_diff oracle (inject_utils/utils.py:260-288)."""
    return int(jnp.sum(jnp.asarray(a) != jnp.asarray(b)))
