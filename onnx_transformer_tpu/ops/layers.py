"""Functional transformer primitives (pure JAX, no modules).

Each function reproduces the numeric semantics of the reference's nn.Modules
bit-for-bit where it matters for checkpoint/score parity:

- ``layer_norm``: the reference's quirky LayerNorm (``layer_norm.py:12-15``)
  normalises by the *sample* std (Bessel-corrected, torch ``Tensor.std``
  default) and adds eps to the std, not the variance.
- ``attention_probs``: scores/sqrt(d_k), ``masked_fill(mask==0, -1e9)``,
  softmax, then the reference's inline attention-prob fake-quant
  ``round(p*127)/127`` (``attention.py:28-36`` — the in-place
  ``mul_(127).round_()`` / ``div_(127)`` pair; the intermediate ``.to(int8)``
  casts are no-ops on the value since probs lie in [0, 1]).
- ``embed``: ``lut[x] * sqrt(d_model)`` (``embeddings.py:13``).
- ``sinusoidal_pe``: log-space sin/cos table (``positional_encodings.py:14-21``).
- masks: ``utils.py:10-14`` and ``batch.py:24-30``.

Tap/inject plumbing: every interesting intermediate flows through ``tap``,
which optionally records it into a dict (calibration/observability — the
TPU-native replacement for the reference's forward hooks,
``get_quantized_scales.py:138-148``) and/or rewrites it with a user function
(fault injection — replacement for the node-interposition interpreter,
``onnx_optimized_inference.py:18-212``).  Both are trace-time static, so the
clean path compiles to exactly the same XLA program as without taps.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

TapDict = Optional[dict]
InjectDict = Optional[dict]

NEG_INF = -1e9


def tap(name: str, x: jax.Array, taps: TapDict = None, inject: InjectDict = None):
    """Route an intermediate through the observe/inject seam."""
    if inject is not None and name in inject:
        x = inject[name](x)
    if taps is not None:
        taps[name] = x
    return x


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6):
    """a_2 * (x - mean) / (std + eps) + b_2 with ddof=1 std (layer_norm.py:12-15).

    The moment reductions always run in f32: under bf16 mixed-precision
    training an 8-bit-mantissa variance accumulation is unstable; for f32
    inputs this is the identity."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (d - 1)
    std = jnp.sqrt(var)
    return (scale.astype(jnp.float32) * (x - mean) / (std + eps)
            + bias.astype(jnp.float32)).astype(dt)


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None):
    """x @ w + b with w stored (in_features, out_features)."""
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def embed(ids: jax.Array, lut: jax.Array):
    lut = jnp.asarray(lut)  # tolerate numpy params (e.g. checkpoint-restored)
    d_model = lut.shape[-1]
    return jnp.take(lut, ids, axis=0) * np.sqrt(d_model).astype(lut.dtype)


@lru_cache(maxsize=8)
def _pe_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def positional_encoding(x: jax.Array, offset: int | jax.Array = 0, max_len: int = 5000):
    """Additive sinusoidal PE; ``offset`` supports KV-cached single-token
    decode — a scalar for lockstep batches, or a [B] vector of per-row
    positions (continuous batching: each slot is at its own decode step)."""
    pe = jnp.asarray(_pe_table(max_len, x.shape[-1]), dtype=x.dtype)
    t = x.shape[-2]
    if isinstance(offset, (int, np.integer)) and offset == 0:
        return x + pe[:t]
    offset = jnp.asarray(offset)
    if offset.ndim == 1:  # per-row offsets, single-token step
        return x + jnp.take(pe, offset, axis=0)[:, None, :]
    return x + jax.lax.dynamic_slice_in_dim(pe, offset, t, axis=0)


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def quantize_probs(p: jax.Array) -> jax.Array:
    """The reference's inline attention-prob quantization to the 1/127 grid
    (attention.py:33-35).

    Forward matches the reference exactly; the backward deliberately does
    NOT: torch's in-place ``round_()`` there has zero gradient, so the
    reference trains its q/k projections with no gradient signal through the
    attention probabilities at all.  We use a straight-through estimator so
    QAT/FP32 training behaves like a real transformer while eval outputs
    stay bit-identical to the reference's quantized forward.
    """
    from onnx_transformer_tpu.quant.core import ste_round

    return ste_round(p * 127.0) / 127.0


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, T, D] -> [B, H, T, D/H]."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, T, dk] -> [B, T, D]."""
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def attention_probs(
    scores: jax.Array,
    mask: Optional[jax.Array],
    quantize: bool,
    drop_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """softmax(mask_fill(scores)) [+ dropout] [+ 1/127 fake-quant]."""
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(NEG_INF, scores.dtype))
    p = jax.nn.softmax(scores, axis=-1)
    p = dropout(p, drop_rate, rng, train)
    if quantize:
        p = quantize_probs(p)
    return p


def scaled_dot_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    quantize: bool = True,
    drop_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    name: str = "attn",
    taps: TapDict = None,
    inject: InjectDict = None,
):
    """q,k,v: [B, H, T, dk]; mask broadcastable to [B, H, Tq, Tk]."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d_k).astype(q.dtype)
    scores = tap(f"{name}.scores", scores, taps, inject)
    p = attention_probs(scores, mask, quantize, drop_rate, rng, train)
    p = tap(f"{name}.probs", p, taps, inject)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return tap(f"{name}.context", out, taps, inject)


def int8_cache_attention(
    q: jax.Array,       # f32  [B, H, 1, dk]  single-step queries
    kq: jax.Array,      # int8 [B, T, D]      merged-head K cache
    ks: jax.Array,      # f32  [B, T, 1]      per-token K scales
    vq: jax.Array,      # int8 [B, T, D]
    vs: jax.Array,      # f32  [B, T, 1]
    mask: Optional[jax.Array],   # [B, 1, 1, T]
    quantize: bool,
    name: str = "attn",
    taps: TapDict = None,
    inject: InjectDict = None,
) -> jax.Array:
    """Scale-after-dot attention on the int8 KV cache (XLA formulation).

    The per-token dequant scale is constant along the dk contraction, so it
    commutes out of both dots:

        scores[t] = (sum_d q[d] * kq[t,d]) * ks[t]
        ctx[d]    = sum_t (p[t] * vs[t]) * vq[t,d]

    The cache therefore feeds the einsums through a *bare* int8->f32
    convert, which XLA fuses into the dot reads — no f32 [B,T,D] cache
    tensor is ever materialised in HBM (the dequant-then-einsum form
    allocated 24 such buffers per decode step; see
    results_perf/decode_step_jnp.hlo.txt and scripts/hlo_check.py).
    Math is the reference chain exactly, reassociated (fp rounding differs
    at the ulp level from dequantize-first).
    """
    b, t, d = kq.shape
    h = q.shape[1]
    dk = d // h
    kr = kq.reshape(b, t, h, dk)   # minor-dim split: free, no transpose
    vr = vq.reshape(b, t, h, dk)
    scores = jnp.einsum("bhqd,bthd->bhqt", q, kr.astype(jnp.float32))
    scores = scores * (ks[:, :, 0][:, None, None, :] / np.sqrt(dk).astype(scores.dtype))
    scores = tap(f"{name}.scores", scores, taps, inject)
    p = attention_probs(scores, mask, quantize)
    p = tap(f"{name}.probs", p, taps, inject)
    pv = p * vs[:, :, 0][:, None, None, :]
    ctx = jnp.einsum("bhqt,bthd->bhqd", pv, vr.astype(jnp.float32))
    return tap(f"{name}.context", ctx, taps, inject)


def int8_cache_attention_qdot(
    q_full: jax.Array,  # f32  [B, 1, D] merged-head queries on the per-token
                        #      int8 grid (W8A8 quantize_output fake-quant)
    kq: jax.Array,      # int8 [B, T, D] merged-head K cache
    ks: jax.Array,      # f32  [B, T, 1] per-token K scales
    vq: jax.Array,      # int8 [B, T, D]
    vs: jax.Array,      # f32  [B, T, 1]
    mask: Optional[jax.Array],   # [B, 1, 1, T]
    quantize: bool,
    num_heads: int,
) -> jax.Array:
    """All-integer-operand decode attention on the int8 KV cache (XLA).

    The v2 formulation of :func:`int8_cache_attention`, shaped for the TPU:

    - **Score dot on the MXU in int8**: the W8A8 q projection fake-quantizes
      its output per token (quant_linear.py:111-119), so ``round(q/sq)``
      recovers the exact int8 representation (the absmax element maps to
      ±127 by construction).  Embedding it block-diagonally [D, H] turns all
      heads' scores into ONE int8 matmul  kq [T,D] @ qbd [D,H] -> s32 [T,H]
      per sequence — the cache feeds the MXU directly in its storage layout,
      no transpose, no f32 conversion of the cache.
      ``s32 * sq * ks[t]`` is then EXACT int arithmetic scaled in f32
      (strictly fewer roundings than the reference's fp chain).
    - **AV as ONE batched dot in the cache's layout, overcomputed x H**:
      tmp[b,h,d] = sum_t pv[b,t,h] * vq[b,t,d] — contraction over t with
      batch b only, so BOTH operands are consumed in storage order (no
      transpose) and the int8->f32 convert fuses into the dot's operand
      read.  The wanted context is the block diagonal tmp[b, d//dk, d],
      selected with a tiny masked reduce over the 16x-smaller [B,H,D]
      output.  The overcompute (x H on the MXU) is ~1 GFLOP — noise — while
      the elementwise broadcast-multiply-reduce formulation stopped fusing
      at B >= 1024 and materialised 6 x 151 MB convert + broadcast pairs
      per step (traced), and the ``bhqt,bthd`` einsum form materialised a
      cache transpose.

    Returns ctx [B, 1, D] merged-head.
    """
    b, t, d = kq.shape
    h = num_heads
    dk = d // h
    sq = jnp.max(jnp.abs(q_full), axis=-1, keepdims=True) / 127.0   # [B,1,1]
    sq = jnp.maximum(sq, 1e-9)
    qi = jnp.round(q_full / sq).astype(jnp.int8)[:, 0, :]           # [B,D]
    hsel = (np.arange(d) // dk)[:, None] == np.arange(h)[None, :]   # [D,H]
    qbd = jnp.where(jnp.asarray(hsel)[None], qi[:, :, None], 0)     # [B,D,H] i8
    # scores stay [B, T, H] / axis-1 softmax: the softmax's reduce-window
    # lowering overlaps with the cache DMA the step is bound by; the
    # [B, H, T] last-axis reformulation measured 1.73 vs 1.03 ms/step
    # (r5 negative result — see stacked_decode._attn_groups)
    s32 = jax.lax.dot_general(
        kq, qbd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                           # [B,T,H]
    scores = s32.astype(jnp.float32) * (
        sq * ks / np.sqrt(dk).astype(np.float32))                   # [B,T,H]
    if mask is not None:
        scores = jnp.where(mask[:, 0, 0, :, None], scores,
                           jnp.asarray(NEG_INF, scores.dtype))
    p = jax.nn.softmax(scores, axis=1)                              # over T
    if quantize:
        p = quantize_probs(p)
    pv = p * vs                                                     # [B,T,H]
    tmp = jax.lax.dot_general(
        pv, vq.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))))   # [B,H,D]
    ctx = jnp.sum(jnp.where(jnp.asarray(hsel.T)[None], tmp, 0.0), axis=1)
    return ctx[:, None, :]                                          # [B,1,D]


def int8_cache_attention_qdot_tm(
    q_full: jax.Array,  # f32  [B, 1, D] merged-head queries (int8 grid)
    kq: jax.Array,      # int8 [T, B, D] TIME-MAJOR merged-head K cache
    ks: jax.Array,      # f32  [T, B, 1] per-token K scales
    vq: jax.Array,      # int8 [T, B, D]
    vs: jax.Array,      # f32  [T, B, 1]
    mask: Optional[jax.Array],   # [B, 1, 1, T]
    quantize: bool,
    num_heads: int,
) -> jax.Array:
    """:func:`int8_cache_attention_qdot` on a TIME-MAJOR cache.

    Same math, different storage: the decode step writes this step's K/V at
    cache[t] — with [T, B, D] that is ONE contiguous [B, D] slab
    (dynamic-update-slice ~1us), while the [B, T, D] layout strides the
    write into B separate D-byte rows (~33us/buffer/step, measured — the
    single largest non-matmul consumer of the decode loop).  Both dots
    consume the cache in storage order via batched ``dot_general`` (batch
    dim = B in the middle), so no transpose of the cache materialises.
    """
    t, b, d = kq.shape
    h = num_heads
    dk = d // h
    sq = jnp.max(jnp.abs(q_full), axis=-1, keepdims=True) / 127.0   # [B,1,1]
    sq = jnp.maximum(sq, 1e-9)
    qi = jnp.round(q_full / sq).astype(jnp.int8)[:, 0, :]           # [B,D]
    hsel = (np.arange(d) // dk)[:, None] == np.arange(h)[None, :]   # [D,H]
    qbd = jnp.where(jnp.asarray(hsel)[None], qi[:, :, None], 0)     # [B,D,H] i8
    # scores: batch over B, contract D — both operands in storage order
    # ([B,T,H]/axis-1 softmax kept: see int8_cache_attention_qdot)
    s32 = jax.lax.dot_general(
        kq, qbd, (((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32)                           # [B,T,H]
    scores = s32.astype(jnp.float32) * (
        sq * ks.transpose(1, 0, 2) / np.sqrt(dk).astype(np.float32))  # [B,T,H]
    if mask is not None:
        scores = jnp.where(mask[:, 0, 0, :, None], scores,
                           jnp.asarray(NEG_INF, scores.dtype))
    p = jax.nn.softmax(scores, axis=1)                              # over T
    if quantize:
        p = quantize_probs(p)
    pv = p * vs.transpose(1, 0, 2)                                  # [B,T,H]
    tmp = jax.lax.dot_general(
        pv, vq.astype(jnp.float32), (((1,), (0,)), ((0,), (1,))))   # [B,H,D]
    ctx = jnp.sum(jnp.where(jnp.asarray(hsel.T)[None], tmp, 0.0), axis=1)
    return ctx[:, None, :]                                          # [B,1,D]


def subsequent_mask(size: int) -> np.ndarray:
    """Lower-triangular causal mask [1, size, size] (utils.py:10-14)."""
    return np.tril(np.ones((1, size, size), dtype=bool))


def make_src_mask(src: jax.Array, pad: int = 2) -> jax.Array:
    return (src != pad)[:, None, :]


def make_tgt_mask(tgt_in: jax.Array, pad: int = 2) -> jax.Array:
    t = tgt_in.shape[-1]
    causal = jnp.asarray(subsequent_mask(t))
    return (tgt_in != pad)[:, None, :] & causal


def log_softmax(x: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(x, axis=-1)


def xavier_uniform(rng: jax.Array, shape: tuple, dtype=jnp.float32) -> jax.Array:
    """Glorot/fan_avg uniform, matching torch.nn.init.xavier_uniform
    (model.py:34-36): U(-a, a), a = sqrt(6 / (fan_in + fan_out))."""
    fan_out, fan_in = shape[0], shape[1]
    if len(shape) == 2:
        # our linear weights are (in, out); torch's are (out, in) — fan sums
        # are symmetric so the bound is identical either way
        fan_in, fan_out = shape
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)
