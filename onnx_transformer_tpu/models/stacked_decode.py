"""Chunk-staged decode: the serving fast path (round-4 redesign).

The general ``Transformer.decode_step`` unrolls the N decoder layers over
per-layer KV-cache dicts, issuing ~24 strided [B,1,D]->[B,T,D] cache
writes per step (~0.40 ms/step at B=512 — the strided-store cost is
per ROW, so merging buffers does not help; profiler-verified round 4).
This module cuts the write cost ~C-fold by decoding in chunks of C steps:

- the outer loop is a ``lax.scan`` over chunks whose body UNROLLS the C
  steps, so each step's K/V rows are plain SSA values ("in-flight" rows);
- self-attention runs ONE softmax over the concatenated score columns of
  the main cache and the in-flight rows (``_attn_groups``) —
  mathematically identical to attending over a cache containing all rows;
- at the chunk boundary the C rows land in the main cache as one
  [B, C, D] dynamic-update-slice per buffer (``flush_inflight``): B rows
  of C*D contiguous bytes, the per-row toll paid once per C steps —
  measured 1.32 -> 1.05 ms/step at B=512, C=8;
- decoder params/payloads are packed into ``[L, ...]`` pytrees
  (``build_stacked``) and statically indexed (XLA hoists the slices).

Measured negative results of record (code removed, numbers in
RESULTS.md): a stacked [L,B,T,D] cache with lax.scan over layers is
SLOWER (scan xs slices materialise 0.5 ms/step of copies and the [L,...]
DUS costs the same rows); a fully-unrolled prefix-growing decode (read
only valid rows, zero cache writes) loses its read savings to concat
rematerialisation and costs a 270 s compile.

Numeric semantics are the W8A8 chain of ``quant/w8a8.py`` + the
all-int8-operand attention of ``ops/layers.py:int8_cache_attention_qdot``:
per-token absmax int8 activations (scale floor 1e-5, qmax 127 —
``quant_linear.py:30-54``), per-channel int8 weights, attention-prob
1/127 fake-quant (``attention.py:33-35``).  The q/k/v projections'
``quantize_bmm_input`` fake-quant + cache re-quantization roundtrip is
collapsed: quantizing the projection output once replaces
fake-quant-then-requantize.  The collapse relies on the re-derived scale
``fl(fl(127*s)/127)`` equalling ``s`` in f32 — true for the absmax
element mapping to +-127 in every case we measured, but not a rounding
guarantee for all scales; the equivalence is PARITY-TESTED (token-
identical on the test stream, tests/test_stacked_decode.py) rather than
algebraically proven.

Taps / fault injection are NOT routed through this path — the campaign
and calibration use the general named-seam path; this one exists to be
fast.  Reference anchor: the per-token full-graph rebuild this replaces,
``onnx_optimized_custom_inference.py:624-671``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu.models.transformer import Transformer
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q

NEG_INF = L.NEG_INF


# --------------------------------------------------------------- build


def _stack(dicts: list) -> dict:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)


def build_stacked(model: Transformer, params: dict, payloads: dict) -> dict:
    """Pack decoder params + W8A8 payloads into layer-stacked pytrees.

    ``payloads``: the name-keyed int8 dict from
    ``quant/w8a8.py:quantize_model_params`` (must cover every decoder
    linear; ``generator.proj`` optional — fp32 generator used otherwise).

    Returns an arrays-only pytree, safe to pass as a jit argument (the
    tunneled-runtime rule: no closure-captured device consts).
    """
    cfg = model.cfg
    n = cfg.num_layers
    roles = {
        "self_q": "self_attn.linears.0",
        "self_k": "self_attn.linears.1",
        "self_v": "self_attn.linears.2",
        "self_o": "self_attn.linears.3",
        "src_q": "src_attn.linears.0",
        "src_o": "src_attn.linears.3",
        "ffn1": "feed_forward.w_1",
        "ffn2": "feed_forward.w_2",
    }
    per_layer = []
    for i in range(n):
        lp = params["decoder"]["layers"][i]
        entry = {ln: {"scale": jnp.asarray(lp[ln]["scale"], jnp.float32),
                      "bias": jnp.asarray(lp[ln]["bias"], jnp.float32)}
                 for ln in ("ln0", "ln1", "ln2")}
        for role, suffix in roles.items():
            p = payloads[f"decoder.layers.{i}.{suffix}"]
            entry[role] = {"wq": p["wq"], "sw": p["sw"], "b": p["b"]}
        # fused q/k/v projection: ONE [D, 3D] int8 matmul per step instead
        # of three [D, D] ones (the decode step is op-count-bound at B=512
        # — r5 sweep; segments/read-shrinking measured negative).  The int8
        # dot accumulates in int32, which is EXACT integer arithmetic, so
        # the fused dot is BIT-IDENTICAL to the three separate dots; the
        # per-projection output fake-quant runs on slices afterwards.
        entry["self_qkv"] = {
            key: jnp.concatenate([entry["self_q"][key], entry["self_k"][key],
                                  entry["self_v"][key]], axis=-1)
            for key in ("wq", "sw", "b")
        }
        per_layer.append(entry)
    cross = []
    for i in range(n):
        entry = {}
        for role, suffix in (("src_k", "src_attn.linears.1"),
                             ("src_v", "src_attn.linears.2")):
            p = payloads[f"decoder.layers.{i}.{suffix}"]
            entry[role] = {"wq": p["wq"], "sw": p["sw"], "b": p["b"]}
        cross.append(entry)
    ln_f = params["decoder"]["ln"]
    gen: dict
    if "generator.proj" in payloads:
        p = payloads["generator.proj"]
        gen = {"wq": p["wq"], "sw": p["sw"], "b": p["b"]}
    else:
        g = params["generator"]
        gen = {"w": jnp.asarray(g["w"], jnp.float32),
               "b": jnp.asarray(g["b"], jnp.float32)}
    return {
        "layers": _stack(per_layer),
        "cross": _stack(cross),
        "final_ln": {"scale": jnp.asarray(ln_f["scale"], jnp.float32),
                     "bias": jnp.asarray(ln_f["bias"], jnp.float32)},
        "tgt_lut": jnp.asarray(params["tgt_embed"]["lut"], jnp.float32),
        "generator": gen,
    }


# --------------------------------------------------------------- pieces


def _ln(x: jax.Array, p: dict) -> jax.Array:
    return L.layer_norm(x, p["scale"], p["bias"])


def _w8a8(x: jax.Array, p: dict) -> jax.Array:
    """Per-token int8 activation quant + int8 MXU matmul + scale epilogue.
    x [B, Din] f32 -> [B, Dout] f32 (same chain as quant/w8a8.py mode='int8')."""
    sx = Q.act_scale_per_token(x)                       # [B, 1]
    xq = Q.quantize(x, sx)
    y32 = jax.lax.dot_general(
        xq, p["wq"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y32.astype(jnp.float32) * (sx * p["sw"][None, :]) + p["b"][None, :]


def _quantize_rows(y: jax.Array):
    """Per-token quantize -> (int8 [B, D], scale [B])."""
    s = Q.act_scale_per_token(y)                        # [B, 1]
    return Q.quantize(y, s), s[:, 0]


def _w8a8_q(x: jax.Array, p: dict):
    """W8A8 linear returning the OUTPUT already quantized per token:
    (int8 [B, Dout], scale [B]).  Collapses the reference's
    quantize_bmm_input fake-quant + downstream re-quantization into one
    rounding — bit-identical (absmax element -> +-127 exactly)."""
    return _quantize_rows(_w8a8(x, p))


def _hsel(d: int, h: int) -> np.ndarray:
    return (np.arange(d) // (d // h))[:, None] == np.arange(h)[None, :]


def _qdot_attn(
    qi: jax.Array,      # int8 [B, D] quantized merged-head query
    sq: jax.Array,      # f32  [B]    its per-token scale
    kq: jax.Array,      # int8 [B, T, D] merged-head K cache
    ks: jax.Array,      # f32  [B, T]    per-token K scales
    vq: jax.Array,      # int8 [B, T, D]
    vs: jax.Array,      # f32  [B, T]
    mask: jax.Array,    # bool [B, T]    True = attend
    num_heads: int,
    quantize: bool,
) -> jax.Array:
    """Single-group all-int8-operand attention (cross-attention over a
    fixed cache) — a thin wrapper over :func:`_attn_groups` so the score
    dot / joint softmax / AV math lives in exactly one place."""
    return _attn_groups(
        qi, sq, [{"k": kq, "ks": ks, "v": vq, "vs": vs, "vis": mask}],
        num_heads, quantize)


# ------------------------------------------------- chunked decode (fast)
#
# Profiler finding (round 4): the per-step [B,1,D]->[B,T,D] cache write
# cost is proportional to the ROW COUNT of the strided store (~65 ns/row),
# so merging the 12 per-layer writes into 2 stacked [L,B,T,D] writes moves
# the same rows and saves nothing (measured 0.38 vs 0.40 ms/step), and
# scanning layers materialises cache slices for the score dot's operand
# (+0.51 ms/step).  What DOES cut the write cost is writing FEWER, MORE
# CONTIGUOUS rows: each chunk of C steps stages its K/V rows in small
# TIME-MAJOR [C,B,D] buffers — a [1,B,D] staging write is one contiguous
# 256 KB slab — and flushes them into the batch-major main cache as ONE
# [B,C,D] slice per buffer per chunk (B rows of C*512 contiguous bytes:
# the per-row toll paid once per C steps instead of every step).
# Attention runs a joint softmax over [B,T+C,H]: the main-cache columns
# (batch-major dots, read-optimal) plus the staging columns (time-major
# dots — storage-order, and only ~C/T of the traffic, so the unfavourable
# layout costs nothing measurable).


def _attn_groups(
    qi: jax.Array,       # int8 [B, D] quantized query
    sq: jax.Array,       # f32  [B]
    groups: list,        # list of {"k" i8 [B,Tg,D], "ks" f32 [B,Tg],
                         #  "v" i8 [B,Tg,D], "vs" f32 [B,Tg],
                         #  "vis" bool [B,Tg] or None (=all visible)}
    num_heads: int,
    quantize: bool,
) -> jax.Array:
    """Joint-softmax attention over column GROUPS (main cache, in-chunk
    staged rows, prefix pieces...).  One softmax over the concatenated
    scores — mathematically identical to a single contiguous cache holding
    all the rows.  Returns merged-head context [B, D] f32."""
    d = qi.shape[-1]
    h = num_heads
    dk = d // h
    inv = np.float32(1.0 / np.sqrt(dk))
    hsel = jnp.asarray(_hsel(d, h))
    qbd = jnp.where(hsel[None], qi[:, :, None], 0)                  # [B,D,H] i8
    # scores stay [B, Tg, H] with an axis-1 softmax.  Measured negative
    # result of record (r5): the axis-1 softmax DOES lower to an O(T^2)
    # reduce-window on TPU (traced at 97us/layer/step, 27 GB/s), but it
    # OVERLAPS with the cache DMA reads the step is actually bound by —
    # reformulating to [B, H, T] + last-axis softmax measured 1.73 ms/step
    # vs 1.03 (the transposed score/AV layouts add real traffic; the
    # reduce-window was hiding under the reads).
    parts = []
    for g in groups:
        s32 = jax.lax.dot_general(
            g["k"], qbd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                       # [B,Tg,H]
        s = s32.astype(jnp.float32) * (
            sq[:, None, None] * g["ks"][:, :, None] * inv)
        if g.get("vis") is not None:
            s = jnp.where(g["vis"][:, :, None], s,
                          jnp.asarray(NEG_INF, s.dtype))
        parts.append(s)
    scores = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    p = jax.nn.softmax(scores, axis=1)
    if quantize:
        p = L.quantize_probs(p)
    ctx = None
    off = 0
    for g in groups:
        tg = g["k"].shape[1]
        pv = p[:, off:off + tg] * g["vs"][:, :, None]               # [B,Tg,H]
        c = jax.lax.dot_general(
            pv, g["v"].astype(jnp.float32), (((1,), (1,)), ((0,), (0,))))
        ctx = c if ctx is None else ctx + c
        off += tg
    return jnp.sum(jnp.where(hsel.T[None], ctx, 0.0), axis=1)       # [B,D]


def layer_stack_step_inflight(
    stacked: dict,
    cache_layers: list,   # general int8 cache: per-layer dicts with
                          # k/v [B,T,D], k_scale/v_scale [B,T,1], cross_*
    inflight: list,       # per-layer {"k"/"v": [B,j,D] i8, "ks"/"vs": [B,j]}
                          # of rows staged earlier THIS chunk, or None at j=0
    x: jax.Array,         # [B, D] embedded token
    vis_cache: jax.Array,  # [B, T]
    vis_stg: jax.Array,    # [B, j+1] staged-row visibility incl. current row
    smask: jax.Array,      # [B, S]
    num_heads: int,
    quantize: bool,
) -> tuple[jax.Array, list]:
    """One token through the full decoder stack; this step's K/V rows are
    appended to the in-flight chunk staging (plain SSA values — the main
    cache is written once per chunk by :func:`flush_inflight`).  The step
    index within the chunk is static (callers unroll the chunk), so the
    staged shapes grow j=1..C with zero dynamic indexing.

    Measured negative result (r5): replacing the growing concat with
    fixed [B,C,D] staging buffers updated at static row ``j`` costs
    +0.67 ms/step at B=512/C=8 — the row updates into an existing buffer
    are SPARSE strided stores paying the same ~65 ns/row toll the chunked
    design exists to avoid, while each concat writes a dense fresh
    buffer.  The O(C^2/2) concat rewrite is the cheaper trade at C=8."""
    n = len(cache_layers)
    new_inflight = []
    for l in range(n):
        lp = jax.tree.map(lambda a: a[l], stacked["layers"])
        lc = cache_layers[l]
        fl = inflight[l] if inflight is not None else None
        xn = _ln(x, lp["ln0"])
        if "self_qkv" in lp:
            d = xn.shape[-1]
            y3 = _w8a8(xn, lp["self_qkv"])          # [B, 3D], bit == 3 dots
            qi, sq = _quantize_rows(y3[:, :d])
            kq, ksc = _quantize_rows(y3[:, d:2 * d])
            vq, vsc = _quantize_rows(y3[:, 2 * d:])
        else:
            qi, sq = _w8a8_q(xn, lp["self_q"])
            kq, ksc = _w8a8_q(xn, lp["self_k"])
            vq, vsc = _w8a8_q(xn, lp["self_v"])
        if fl is None:
            fl = {"k": kq[:, None], "v": vq[:, None],
                  "ks": ksc[:, None], "vs": vsc[:, None]}
        else:
            fl = {"k": jnp.concatenate([fl["k"], kq[:, None]], axis=1),
                  "v": jnp.concatenate([fl["v"], vq[:, None]], axis=1),
                  "ks": jnp.concatenate([fl["ks"], ksc[:, None]], axis=1),
                  "vs": jnp.concatenate([fl["vs"], vsc[:, None]], axis=1)}
        groups = [
            {"k": lc["k"], "ks": lc["k_scale"][..., 0],
             "v": lc["v"], "vs": lc["v_scale"][..., 0], "vis": vis_cache},
            {"k": fl["k"], "ks": fl["ks"], "v": fl["v"], "vs": fl["vs"],
             "vis": vis_stg},
        ]
        ctx = _attn_groups(qi, sq, groups, num_heads, quantize)
        x = x + _w8a8(ctx, lp["self_o"])
        xn = _ln(x, lp["ln1"])
        qi2, sq2 = _w8a8_q(xn, lp["src_q"])
        ctx = _qdot_attn(qi2, sq2, lc["cross_k"],
                         lc["cross_k_scale"][..., 0], lc["cross_v"],
                         lc["cross_v_scale"][..., 0], smask,
                         num_heads, quantize)
        x = x + _w8a8(ctx, lp["src_o"])
        xn = _ln(x, lp["ln2"])
        x = x + _w8a8(jax.nn.relu(_w8a8(xn, lp["ffn1"])), lp["ffn2"])
        new_inflight.append(fl)
    return x, new_inflight


def flush_inflight(cache_layers: list, inflight: list, base) -> list:
    """Land a chunk's staged K/V rows in the main cache: one [B,C,D]
    dynamic-update-slice per buffer per chunk — B rows of C*D contiguous
    bytes each, so the strided-store per-row toll is paid once per C steps
    instead of every step (measured ~0.40 ms/step at C=1)."""
    out = []
    for lc, fl in zip(cache_layers, inflight):
        out.append(dict(
            lc,
            k=jax.lax.dynamic_update_slice(lc["k"], fl["k"], (0, base, 0)),
            v=jax.lax.dynamic_update_slice(lc["v"], fl["v"], (0, base, 0)),
            k_scale=jax.lax.dynamic_update_slice(
                lc["k_scale"], fl["ks"][:, :, None], (0, base, 0)),
            v_scale=jax.lax.dynamic_update_slice(
                lc["v_scale"], fl["vs"][:, :, None], (0, base, 0)),
        ))
    return out


def embed_token(stacked: dict, cfg, tok: jax.Array, pos) -> jax.Array:
    """tok [B,1] + position -> [B,D] (lut * sqrt(d) + sinusoidal PE)."""
    x = jnp.take(stacked["tgt_lut"], tok[:, 0], axis=0) * np.float32(
        np.sqrt(cfg.d_model))
    pe = jnp.asarray(L._pe_table(cfg.max_len, cfg.d_model))
    pos = jnp.asarray(pos)
    if pos.ndim == 1:
        return x + jnp.take(pe, pos, axis=0)
    return x + jax.lax.dynamic_index_in_dim(pe, pos, 0, keepdims=False)


def final_logits(stacked: dict, x: jax.Array, log_probs: bool = False):
    x = _ln(x, stacked["final_ln"])
    gen = stacked["generator"]
    logits = _w8a8(x, gen) if "wq" in gen else L.linear(x, gen["w"], gen["b"])
    return L.log_softmax(logits) if log_probs else logits


def greedy_decode_chunked(
    model: Transformer,
    params,
    stacked: dict,
    src: jax.Array,
    src_mask: jax.Array,
    max_len: int,
    chunk: int = 8,
    start_symbol: int = 0,
    lin=None,
    stop_at_eos: bool = True,
    segments: int = 1,
) -> jax.Array:
    """Lockstep greedy decode with chunk-staged cache writes -> [B, max_len].
    Token-identical to the general int8 path (joint softmax over the same
    logit set).  ``max_len`` must be divisible by ``chunk``.

    ``segments > 1`` GROWS the self-KV ring across segment boundaries
    instead of allocating the full [B, max_len, D] ring up front, so each
    segment's scan body reads only the prefix that can be valid (outputs
    parity-tested identical — masked tail columns contribute exact
    softmax zeros).  MEASURED NEGATIVE on v5e at B=512 (r5 sweep:
    1.248 ms/step at segments=3 vs 1.031 at 1): the decode step is
    op-count-bound, not KV-read-bound, below T=72 (same conclusion as the
    r3 bucketed-fleet finding), and the per-segment pads + extra scan
    instances cost more than the smaller reads save.  Kept as a tested
    option for much longer rings, where the read term dominates."""
    from onnx_transformer_tpu.models.transformer import default_linear

    cfg = model.cfg
    b = src.shape[0]
    assert max_len % chunk == 0, "max_len must be divisible by chunk"
    n_chunks = max_len // chunk
    segments = max(1, min(segments, n_chunks))
    memory = model.encode(params, src, src_mask, lin=lin or default_linear)
    # only the cross-KV projections are needed up front: the self-KV ring
    # grows from empty via the segment pads below (init_cache's full-length
    # zero rings would just be dead allocations here)
    cross_layers = model.cross_kv(params, memory, lin=lin or default_linear,
                                  cache_dtype="int8")
    self_keys = ("k", "v", "k_scale", "v_scale")
    ys = jnp.full((b, max_len), cfg.pad_id, jnp.int32).at[:, 0].set(start_symbol)
    finished = jnp.zeros((b,), bool)
    smask = src_mask[:, 0, :] if src_mask.ndim == 3 else src_mask
    h, quant = cfg.num_heads, cfg.quantize_attn_probs

    # chunk-count boundaries per segment (ascending, last = n_chunks)
    per = n_chunks // segments
    extra = n_chunks % segments
    bounds, acc = [], 0
    for s in range(segments):
        acc += per + (1 if s < extra else 0)
        bounds.append(acc * chunk)

    def make_outer(seg_end):
        pos_t = jnp.arange(seg_end)

        def outer(carry, base):
            self_layers, ys, finished, last = carry
            layers = [dict(sl, **cl)
                      for sl, cl in zip(self_layers, cross_layers)]
            vis_cache = jnp.broadcast_to((pos_t < base)[None, :], (b, seg_end))
            inflight = None
            outs = []
            for j in range(chunk):      # static unroll: staged rows are SSA
                x = embed_token(stacked, cfg, last[:, None], base + j)
                x, inflight = layer_stack_step_inflight(
                    stacked, layers, inflight, x, vis_cache, None, smask,
                    h, quant)
                nxt = jnp.argmax(final_logits(stacked, x), -1).astype(jnp.int32)
                if stop_at_eos:
                    nxt = jnp.where(finished, cfg.pad_id, nxt)
                    finished = finished | (nxt == cfg.eos_id)
                outs.append(nxt)
                last = nxt
            # one [B, C] token write per chunk (ys is C wider than max_len so
            # the final chunk's overhang lands in the scratch margin)
            ys = jax.lax.dynamic_update_slice(
                ys, jnp.stack(outs, axis=1), (0, base + 1))
            layers = flush_inflight(layers, inflight, base)
            self_layers = [{key: lc[key] for key in self_keys}
                           for lc in layers]
            return (self_layers, ys, finished, last), None

        return outer

    ys = jnp.pad(ys, ((0, 0), (0, chunk)), constant_values=cfg.pad_id)
    last = ys[:, 0]
    prev_end = 0
    self_layers = [
        {"k": jnp.zeros((b, 0, cfg.d_model), jnp.int8),
         "v": jnp.zeros((b, 0, cfg.d_model), jnp.int8),
         "k_scale": jnp.zeros((b, 0, 1), jnp.float32),
         "v_scale": jnp.zeros((b, 0, 1), jnp.float32)}
        for _ in range(cfg.num_layers)
    ]
    for seg_end in bounds:
        pad = seg_end - prev_end
        self_layers = [
            {key: jnp.pad(lc[key], ((0, 0), (0, pad), (0, 0)))
             for key in self_keys}
            for lc in self_layers
        ]
        bases = jnp.arange(prev_end, seg_end, chunk)
        (self_layers, ys, finished, last), _ = jax.lax.scan(
            make_outer(seg_end), (self_layers, ys, finished, last), bases)
        prev_end = seg_end
    return ys[:, :max_len]
