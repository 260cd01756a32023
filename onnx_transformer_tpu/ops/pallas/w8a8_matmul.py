"""Fused W8A8 matmul Pallas kernel: int8 x int8 -> int32 MXU accumulate with
a fused dequant epilogue (sx * sw scale + bias).

This is the hot op of the quantized model (SURVEY.md §7 step 5): the
reference runs fp32 fake-quant matmuls through torch/ONNX Runtime
(``quant_linear.py:111-119``); here the MXU consumes real int8 operands and
the epilogue applies per-token and per-channel scales in-register before a
single fp32 store — no intermediate int32 or dequantized fp tensor ever
touches HBM.

Two entry points:
- ``w8a8_matmul(xq, sx, wq, sw, b)``: pre-quantized activations (used when
  int-domain taps/injection are active).
- ``quant_w8a8_matmul(x, wq, sw, b)``: fp activations; per-token absmax
  quantization fused into the same kernel (clean serving path: one HBM read
  of x, one MXU pass, one fp32 write).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onnx_transformer_tpu.quant.core import SCALE_FLOOR


def resolve_interpret(interpret) -> bool:
    """interpret=None -> auto: interpreter off-TPU (CPU tests / virtual
    mesh), compiled Mosaic on TPU.  Resolved at trace time (static arg)."""
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x, m: int, axis: int):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _w8a8_kernel(x_ref, sx_ref, w_ref, sw_ref, b_ref, o_ref, acc_ref, *, nk):
    """K-tiled int8 matmul: int32 accumulate in VMEM scratch across the
    (fastest-iterating) K grid dim, dequant epilogue on the last K step."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == nk - 1)
    def _epilogue():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * (sx_ref[:] * sw_ref[:]) + b_ref[:])


@partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def w8a8_matmul(
    xq: jax.Array,   # int8 [..., K]
    sx: jax.Array,   # f32  [...]   per-token scales
    wq: jax.Array,   # int8 [K, N]
    sw: jax.Array,   # f32  [N]     per-out-channel scales
    b: jax.Array | None = None,  # f32 [N]
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """-> f32 [..., N] = (xq int8 @ wq int8) * sx[:,None] * sw[None,:] + b."""
    interpret = resolve_interpret(interpret)
    lead = xq.shape[:-1]
    k = xq.shape[-1]
    n = wq.shape[-1]
    x2 = xq.reshape(-1, k)
    s2 = sx.reshape(-1, 1).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(32, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)
    bk = min(block_k, k)
    x2 = _pad_to(x2, bm, 0)
    s2 = _pad_to(s2, bm, 0)
    mp = x2.shape[0]
    nk = _cdiv(k, bk)
    if k % bk:  # int8 zero-pad of K is exact (adds 0 to the accumulator)
        x2 = _pad_to(x2, bk, 1)
        wq = _pad_to(wq, bk, 0)
        kp = x2.shape[1]
    else:
        kp = k
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        partial(_w8a8_kernel, nk=nk),
        grid=(mp // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * kp,
            bytes_accessed=mp * kp + kp * n + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, s2, wq, sw.reshape(1, n).astype(jnp.float32), b.reshape(1, n).astype(jnp.float32))
    return out[:m].reshape(*lead, n)


def _quant_w8a8_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref):
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]


def _quant_w8a8_kernel_qout(x_ref, w_ref, sw_ref, b_ref, o_ref):
    """As _quant_w8a8_kernel, plus a fused per-token fake-quant of the
    OUTPUT row (the reference's quantize_bmm_input for q/k/v projections,
    quant_linear.py:111-119) — requires the full output row in one block
    (n == block_n), true for the d_model-sized attention projections."""
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]
    sy = jnp.clip(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                  SCALE_FLOOR, None) / 127.0
    o_ref[:] = jnp.round(y / sy) * sy


def _quant_w8a8_kernel_q8(x_ref, w_ref, sw_ref, b_ref, oq_ref, os_ref):
    """As _quant_w8a8_kernel_qout, but emits the output rows ALREADY
    quantized: int8 rows + per-token scales, no fp32 output tensor ever
    touches HBM.  This is the producer form the int8 KV cache consumes
    (cross-K/V prefill): it collapses fake-quant + downstream re-quantize
    into the kernel epilogue (the parity-tested collapse of
    models/stacked_decode._w8a8_q)."""
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]
    sy = jnp.clip(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                  SCALE_FLOOR, None) / 127.0
    oq_ref[:] = jnp.round(y / sy).astype(jnp.int8)
    os_ref[:] = sy


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def quant_w8a8_matmul_q8(
    x: jax.Array,    # f32 [..., K]
    wq: jax.Array,   # int8 [K, N]
    sw: jax.Array,   # f32 [N]
    b: jax.Array | None = None,
    block_m: int = 256,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused quantize + int8 matmul + per-token OUTPUT quantization ->
    (int8 [..., N], scales [..., 1]).  One x read, one int8 write: the
    fp32 projection output never materialises in HBM (vs the qout kernel
    + XLA re-quantize chain: fp32 write + read + int8 write).  The int8
    rows and scales are exactly ``quantize_act_per_token`` of the qout
    kernel's output (same collapse as stacked_decode._w8a8_q)."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[-1]
    assert k <= 2048 and n <= 2048, "q8 kernel requires single K/N blocks"
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    oq, os_ = pl.pallas_call(
        _quant_w8a8_kernel_q8,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n + mp * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq, sw.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    return (oq[:m].reshape(*lead, n), os_[:m].reshape(*lead, 1))


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def quant_w8a8_matmul_qout(
    x: jax.Array,    # f32 [..., K]
    wq: jax.Array,   # int8 [K, N]
    sw: jax.Array,   # f32 [N]
    b: jax.Array | None = None,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-token input quantize + int8 matmul + dequant + per-token
    OUTPUT fake-quant, all in one kernel: one HBM read of x, one fp32 write
    of the already-grid-snapped output.  Ulp-identical to the jnp chain (FMA contraction differs at ~1e-6)
    ``fake_quant_act_per_token(w8a8(x))``.  Requires K and N to fit single
    VMEM blocks (the d_model=512 projections)."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[-1]
    assert k <= 2048 and n <= 2048, "qout kernel requires single K/N blocks"
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        _quant_w8a8_kernel_qout,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq, sw.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    return out[:m].reshape(*lead, n)


def _quant_w8a8_kernel_ktiled(x_ref, w_ref, sw_ref, b_ref, o_ref,
                              acc_ref, amax_ref, *, nk):
    """Two-phase K loop (grid dim length 2*nk, bit-exact with the full-row
    absmax semantics of quantize_act_per_token):

      phase 1 (s in [0, nk)):   running absmax of x's K tiles -> amax scratch
      phase 2 (s in [nk, 2nk)): quantize each tile with the FINAL per-token
                                scale, int32-accumulate on the MXU

    x tiles stream through VMEM twice (8 bytes/elem vs the decompose
    fallback's 6), but stay one kernel: no int8 activation tensor in HBM and
    no second dispatch.  A running-max *requant* single-pass variant would
    avoid the second read but is not bit-equal (round(x/s_tile) rescaled !=
    round(x/s_final)) and would break the jnp-parity contract."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init_amax():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    @pl.when(s < nk)
    def _absmax():
        amax_ref[:] = jnp.maximum(
            amax_ref[:], jnp.max(jnp.abs(x_ref[:]), axis=-1, keepdims=True))

    @pl.when(s == nk)
    def _init_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s >= nk)
    def _matmul():
        sx = jnp.clip(amax_ref[:], SCALE_FLOOR, None) / 127.0
        xq = jnp.round(x_ref[:] / sx).astype(jnp.int8)
        acc_ref[:] += jax.lax.dot_general(
            xq, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(s == 2 * nk - 1)
    def _epilogue():
        sx = jnp.clip(amax_ref[:], SCALE_FLOOR, None) / 127.0
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * (sx * sw_ref[:]) + b_ref[:])


@partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def quant_w8a8_matmul(
    x: jax.Array,    # f32 [..., K]
    wq: jax.Array,   # int8 [K, N]
    sw: jax.Array,   # f32 [N]
    b: jax.Array | None = None,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-token quantize + int8 matmul + dequant epilogue.

    Up to ``MAX_FUSED_K`` the token's full K row fits a VMEM block and a
    single-pass kernel quantizes + accumulates in one sweep.  Beyond it the
    two-phase K-tiled kernel takes over (``_quant_w8a8_kernel_ktiled``):
    absmax pass then quantize+accumulate pass, still ONE kernel with no int8
    activation round-trip through HBM — VMEM-safe at any K (VERDICT r2 #9).
    """
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[-1]
    MAX_FUSED_K = 8192
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    b2 = b.reshape(1, n).astype(jnp.float32)

    if k > MAX_FUSED_K:
        bk = min(block_k, k)
        nk = _cdiv(k, bk)
        if k % bk:  # zero rows are exact: |0| never raises the absmax and
            x2 = _pad_to(x2, bk, 1)       # quantizes to 0 in the accumulator
            wq = _pad_to(wq, bk, 0)
        kp = x2.shape[1]

        out = pl.pallas_call(
            partial(_quant_w8a8_kernel_ktiled, nk=nk),
            grid=(mp // bm, n // bn, 2 * nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, s: (i, jax.lax.rem(s, nk)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, s: (jax.lax.rem(s, nk), j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32),
                            pltpu.VMEM((bm, 1), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * n * kp,
                bytes_accessed=2 * mp * kp * 4 + kp * n + mp * n * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x2, wq, sw2, b2)
        return out[:m].reshape(*lead, n)

    out = pl.pallas_call(
        _quant_w8a8_kernel,
        grid=(mp // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq, sw2, b2)
    return out[:m].reshape(*lead, n)


def _quant_w4a8_kernel(x_ref, wp_ref, sw_ref, b_ref, o_ref):
    """Fused W4A8 matmul: per-token int8 activation quantize + PACKED-int4
    weight unpack in VMEM + int8 MXU matmul + dequant epilogue.

    The weight block arrives as uint8 nibble pairs [K/2, N] — HALF the HBM
    bytes of the int8 path (the whole point of int4 deployment,
    reference README.md:9-12); sign-extension and interleave happen on
    registers after the DMA, so no int8-sized weight tensor ever exists in
    HBM (quant/int4.py's XLA fallback materialises one per call)."""
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    # Mosaic can't legalize uint8 logical shifts (arith.shrui); do the
    # nibble split in int32 (arith shift is legal there)
    wp = wp_ref[:].astype(jnp.int32)                # from uint8 [K/2, N]
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.int8)   # sign-extend
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    # rows interleave: packed row r holds original rows 2r (lo) / 2r+1 (hi)
    k2, n = wp.shape
    w = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]


def _quant_w4a8_kernel_qout(x_ref, wp_ref, sw_ref, b_ref, o_ref):
    """W4A8 + fused per-token OUTPUT fake-quant (the q/k/v projections'
    quantize_bmm_input) — saves the XLA fake-quant round trip."""
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    wp = wp_ref[:].astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    k2, n = wp.shape
    w = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]
    sy = jnp.clip(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                  SCALE_FLOOR, None) / 127.0
    o_ref[:] = jnp.round(y / sy) * sy


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def quant_w4a8_matmul_qout(
    x: jax.Array,          # f32 [..., K]
    wq_packed: jax.Array,  # uint8 [K//2, N]
    sw: jax.Array,         # f32 [N]
    b: jax.Array | None = None,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """quant_w4a8_matmul with the per-token output fake-quant fused into
    the kernel epilogue (W4A8 analogue of quant_w8a8_matmul_qout)."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq_packed.shape[-1]
    assert wq_packed.shape[0] * 2 == k and k <= 2048 and n <= 2048
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)
    out = pl.pallas_call(
        _quant_w4a8_kernel_qout,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n // 2 + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq_packed, sw.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    return out[:m].reshape(*lead, n)


def _quant_w4a8_kernel_q8(x_ref, wp_ref, sw_ref, b_ref, oq_ref, os_ref):
    """W4A8 producer form: packed-int4 weights, int8 activations, output
    emitted as int8 rows + per-token scales (see _quant_w8a8_kernel_q8) —
    the int4 path's cross-KV prefill producer.  Requires the full output
    row in one block (per-token scale needs every column)."""
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.clip(absmax, SCALE_FLOOR, None) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    wp = wp_ref[:].astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    k2, n = wp.shape
    w = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw_ref[:]) + b_ref[:]
    sy = jnp.clip(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                  SCALE_FLOOR, None) / 127.0
    oq_ref[:] = jnp.round(y / sy).astype(jnp.int8)
    os_ref[:] = sy


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def quant_w4a8_matmul_q8(
    x: jax.Array,          # f32 [..., K]
    wq_packed: jax.Array,  # uint8 [K//2, N]
    sw: jax.Array,         # f32 [N]
    b: jax.Array | None = None,
    block_m: int = 256,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused quantize + packed-int4 matmul + per-token OUTPUT quantization
    -> (int8 [..., N], scales [..., 1]); the W4A8 analogue of
    :func:`quant_w8a8_matmul_q8`."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq_packed.shape[-1]
    assert wq_packed.shape[0] * 2 == k and k <= 2048 and n <= 2048
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)
    oq, os_ = pl.pallas_call(
        _quant_w4a8_kernel_q8,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n // 2 + mp * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq_packed, sw.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    return (oq[:m].reshape(*lead, n), os_[:m].reshape(*lead, 1))


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def quant_w4a8_matmul(
    x: jax.Array,          # f32 [..., K]
    wq_packed: jax.Array,  # uint8 [K//2, N] nibble pairs (quant/core.pack_int4)
    sw: jax.Array,         # f32 [N] per-out-channel int4 scales
    b: jax.Array | None = None,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-token quantize + packed-int4 x int8 matmul.  Bit-identical
    to ``unpack_int4`` + the W4A8 XLA chain up to FMA contraction (~1e-6).
    Requires K to fit one VMEM block (d_model/d_ff-sized contractions)."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq_packed.shape[-1]
    assert wq_packed.shape[0] * 2 == k and k <= 4096
    assert n % min(block_n, n) == 0, (
        f"n={n} not divisible by block_n={block_n}: trailing output "
        "columns would silently never be written")
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)
    x2 = _pad_to(x2, bm, 0)
    mp = x2.shape[0]
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        _quant_w4a8_kernel,
        grid=(mp // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 4 + k * n // 2 + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq_packed, sw.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    return out[:m].reshape(*lead, n)
