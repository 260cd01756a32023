"""The flagship model: Annotated-Transformer-style encoder-decoder, TPU-native.

Capability parity with the reference's L1 model core (``model.py:15-37``,
``encoder_decoder.py``, ``encoder.py``, ``decoder.py``, ``attention.py``,
``position_feed_forward.py``) re-designed as a pure-functional JAX model:

- params are a nested pytree (dicts/lists of jnp arrays), no modules;
- every forward is a pure function of (params, inputs, rng) — jit/pjit/vmap
  compose directly;
- all linears are routed through a pluggable ``LinearImpl`` so the INT8/INT4
  quantized models substitute fused Pallas kernels without touching the
  model code (the TPU-native analogue of the reference's module surgery in
  ``get_quantized_model.py:150-172``);
- every interesting intermediate passes through the ``tap`` seam for
  calibration and fault injection.

Default hyperparameters match ``model.py:15-18``: N=6, d_model=512,
d_ff=2048, h=8, dropout=0.3 (the reference force-overrides dropout to 0.3),
and ``do_quantization=True`` attention-prob fake-quant (``attention.py:12``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu.ops import layers as L

Params = Any
LinearImpl = Callable[..., jax.Array]


@dataclass(frozen=True)
class TransformerConfig:
    src_vocab_size: int
    tgt_vocab_size: int
    num_layers: int = 6
    d_model: int = 512
    d_ff: int = 2048
    num_heads: int = 8
    dropout: float = 0.3
    max_len: int = 5000
    quantize_attn_probs: bool = True  # attention.py:12 do_quantization default
    pad_id: int = 2
    bos_id: int = 0
    eos_id: int = 1
    dtype: Any = jnp.float32
    # Compile the layer stack as one lax.scan over stacked params instead of
    # unrolling N layers (~N x smaller XLA graph, much faster compiles).
    # Taps/injection/KV-cache paths need per-layer names and stay unrolled;
    # encode/decode fall back automatically when those are in play.
    scan_layers: bool = False

    def with_(self, **kw) -> "TransformerConfig":
        return replace(self, **kw)


def default_linear(
    name: str,
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    taps: L.TapDict = None,
    inject: L.InjectDict = None,
) -> jax.Array:
    """Plain fp linear.  Taps the *input* under the reference module name —
    exactly what the calibration hooks record (get_quantized_scales.py:138-148)
    — and the output under ``<name>.out``."""
    x = L.tap(name, x, taps, inject)
    y = L.linear(x, w, b)
    return L.tap(name + ".out", y, taps, inject)


def _cache_update(buf: jax.Array, new: jax.Array, idx) -> jax.Array:
    """Write ``new`` [B,H,1,dk] into ``buf`` [B,H,T,dk] at time ``idx`` —
    a scalar (lockstep batch decode) or a [B] vector of per-row positions
    (continuous batching).

    The vector case MUST be one batched scatter: a vmapped
    dynamic_update_slice unrolls into B separate DUS ops per buffer per step
    on TPU (traced: 98,304 DUS instances in one 8-step engine chunk at
    B=512, ~120 ms/step).  Out-of-bounds positions drop the row's update
    (jnp scatter default) — the engine uses index=T for dead slots.
    """
    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, idx, 0))
    b, h = buf.shape[0], buf.shape[1]
    return buf.at[
        jnp.arange(b)[:, None], jnp.arange(h)[None, :], idx[:, None]
    ].set(new[:, :, 0], mode="drop")


def _scale_update(buf: jax.Array, new: jax.Array, idx,
                  time_major: bool = False) -> jax.Array:
    """Row write for merged-head int8 caches and their per-token scales:
    new [B,1,X] lands at time ``idx`` (X=D for k/v, X=1 for scales).

    ``time_major=False``: buf is [B,T,X]; scalar ``idx`` is a slice write,
    vector ``idx`` one batched scatter (see :func:`_cache_update`);
    out-of-bounds rows are dropped.

    ``time_major=True``: buf is [T,B,X] and ``idx`` must be scalar (the
    ring decode mode) — the write is ONE contiguous [1,B,X] slab, vs B
    strided X-byte rows in the [B,T,X] layout (~33us/buffer/step at
    B=512, measured: the largest non-matmul consumer of the decode loop).
    """
    idx = jnp.asarray(idx)
    if time_major:
        assert idx.ndim == 0, "time-major cache requires a scalar write index"
        return jax.lax.dynamic_update_slice(
            buf, new.transpose(1, 0, 2), (idx, 0, 0))
    if idx.ndim == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, idx, 0))
    b = buf.shape[0]
    return buf.at[jnp.arange(b), idx].set(new[:, 0], mode="drop")


class _RngSource:
    """Hands out per-site dropout keys deterministically during tracing."""

    def __init__(self, rng: Optional[jax.Array]):
        self.rng = rng
        self.count = 0

    def next(self) -> Optional[jax.Array]:
        if self.rng is None:
            return None
        self.count += 1
        return jax.random.fold_in(self.rng, self.count)


class Transformer:
    """Functional encoder-decoder. All methods are pure in (params, inputs)."""

    def __init__(self, config: TransformerConfig):
        self.cfg = config

    # hash by config so jit caches treat equal-config instances as one
    def __hash__(self):
        return hash(self.cfg)

    def __eq__(self, other):
        return isinstance(other, Transformer) and self.cfg == other.cfg

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array) -> Params:
        cfg = self.cfg
        # index the key array instead of iterating it: holding a live
        # iterator over a typed-PRNG-key jax.Array degrades EVERY subsequent
        # block_until_ready in the process to ~28 ms on the tunneled TPU
        # runtime (measured; indexing is clean)
        key_arr = jax.random.split(rng, 1024)
        counter = [0]

        def next_key():
            k = key_arr[counter[0]]
            counter[0] += 1
            return k

        dt = cfg.dtype

        def lin(d_in, d_out):
            return {
                "w": L.xavier_uniform(next_key(), (d_in, d_out), dt),
                "b": jnp.zeros((d_out,), dt),
            }

        def ln():
            return {
                "scale": jnp.ones((cfg.d_model,), dt),
                "bias": jnp.zeros((cfg.d_model,), dt),
            }

        def attn():
            return {
                "q": lin(cfg.d_model, cfg.d_model),
                "k": lin(cfg.d_model, cfg.d_model),
                "v": lin(cfg.d_model, cfg.d_model),
                "o": lin(cfg.d_model, cfg.d_model),
            }

        def ffn():
            return {
                "w1": lin(cfg.d_model, cfg.d_ff),
                "w2": lin(cfg.d_ff, cfg.d_model),
            }

        enc_layers = [
            {"self_attn": attn(), "ffn": ffn(), "ln0": ln(), "ln1": ln()}
            for _ in range(cfg.num_layers)
        ]
        dec_layers = [
            {
                "self_attn": attn(),
                "src_attn": attn(),
                "ffn": ffn(),
                "ln0": ln(),
                "ln1": ln(),
                "ln2": ln(),
            }
            for _ in range(cfg.num_layers)
        ]
        return {
            "src_embed": {
                "lut": L.xavier_uniform(next_key(), (cfg.src_vocab_size, cfg.d_model), dt)
            },
            "tgt_embed": {
                "lut": L.xavier_uniform(next_key(), (cfg.tgt_vocab_size, cfg.d_model), dt)
            },
            "encoder": {"layers": enc_layers, "ln": ln()},
            "decoder": {"layers": dec_layers, "ln": ln()},
            "generator": lin(cfg.d_model, cfg.tgt_vocab_size),
        }

    # ------------------------------------------------------------- embeddings

    def embed_src(self, params: Params, src: jax.Array, rngs=None, train=False):
        x = L.embed(src, params["src_embed"]["lut"])
        x = L.positional_encoding(x, 0, self.cfg.max_len)
        return L.dropout(x, self.cfg.dropout, rngs.next() if rngs else None, train)

    def embed_tgt(self, params: Params, tgt: jax.Array, offset=0, rngs=None, train=False):
        x = L.embed(tgt, params["tgt_embed"]["lut"])
        x = L.positional_encoding(x, offset, self.cfg.max_len)
        return L.dropout(x, self.cfg.dropout, rngs.next() if rngs else None, train)

    # -------------------------------------------------------------- sublayers

    def _mha(
        self,
        p: Params,
        name: str,
        q_in,
        k_in,
        v_in,
        mask,
        rngs,
        train,
        taps,
        inject,
        lin: LinearImpl,
        self_cache: Optional[dict] = None,
        cache_index=None,
        kv_precomputed=None,
        fused_attn: bool = False,
        cache_tm: bool = False,
    ):
        """Multi-headed attention (attention.py:10-67).

        ``self_cache``: dict with 'k','v' [B,H,Tmax,dk] for incremental
        decode; new k/v written at ``cache_index``.
        ``kv_precomputed``: (k,v) already projected+split (cross-attention
        with cached encoder projections), or a dict of quantized operands
        {'kq','ks','vq','vs'} from an int8 cache.
        ``fused_attn``: route the single-query int8-cache step through the
        fused Pallas kernel (ops/pallas/attention.py) — the int8 K/V never
        get dequantised into an HBM tensor.  Falls back to the jnp path
        whenever taps/injection are active (those need the score/prob seams)
        or shapes don't match the decode-step regime.
        """
        cfg = self.cfg
        h = cfg.num_heads
        q_full = lin(f"{name}.linears.0", q_in, p["q"]["w"], p["q"]["b"], taps, inject)
        q = L.split_heads(q_full, h)
        use_fused = (
            fused_attn and taps is None and inject is None and not train
            and q.shape[2] == 1
        )

        def _fused(kq, ks, vq, vs):
            # int8 caches are merged-head [B,T,D] with [B,T,1] scales; the
            # kernel consumes them + the merged q directly, no head split.
            # mask arrives [B,1,1,T] in the decode-step regime.
            from onnx_transformer_tpu.ops.pallas.attention import decode_attention_int8

            ctx = decode_attention_int8(
                q_full[:, 0, :], kq, ks[..., 0], vq, vs[..., 0],
                mask[:, 0, 0, :], num_heads=h,
                quantize=cfg.quantize_attn_probs,
            )
            return lin(f"{name}.linears.3", ctx[:, None, :],
                       p["o"]["w"], p["o"]["b"], taps, inject)

        def _xla_int8(kq, ks, vq, vs):
            if (taps is None and inject is None
                    and getattr(lin, "quantized_output_grid", False)):
                # v2: all-int8-operand attention — q is on the per-token int8
                # grid (W8A8 quantize_output), so the score dot runs int8 on
                # the MXU in the cache's own layout and V streams through one
                # fused convert-multiply-reduce (ops/layers.py:
                # int8_cache_attention_qdot).  Taps/inject need the
                # [B,H,1,T] score/prob seams -> fall through below.
                ctx = L.int8_cache_attention_qdot(
                    q_full, kq, ks, vq, vs, mask,
                    cfg.quantize_attn_probs, h)
                return lin(f"{name}.linears.3", ctx,
                           p["o"]["w"], p["o"]["b"], taps, inject)
            # scale-after-dot XLA path: int8 cache feeds the dots through a
            # bare convert; no f32 [B,T,D] cache tensor in HBM
            ctx = L.int8_cache_attention(
                q, kq, ks, vq, vs, mask, cfg.quantize_attn_probs,
                name=name, taps=taps, inject=inject)
            out = L.merge_heads(ctx)
            return lin(f"{name}.linears.3", out, p["o"]["w"], p["o"]["b"], taps, inject)

        single_step = q.shape[2] == 1 and not train

        if kv_precomputed is not None:
            if isinstance(kv_precomputed, dict):  # quantized cross-KV cache
                c = kv_precomputed
                if use_fused:
                    return _fused(c["kq"], c["ks"], c["vq"], c["vs"])
                if single_step:
                    return _xla_int8(c["kq"], c["ks"], c["vq"], c["vs"])
                k = L.split_heads(c["kq"].astype(jnp.float32) * c["ks"], h)
                v = L.split_heads(c["vq"].astype(jnp.float32) * c["vs"], h)
            else:
                k, v = kv_precomputed
        else:
            kfull = lin(f"{name}.linears.1", k_in, p["k"]["w"], p["k"]["b"], taps, inject)
            vfull = lin(f"{name}.linears.2", v_in, p["v"]["w"], p["v"]["b"], taps, inject)
            if self_cache is not None and "k_scale" in self_cache:
                # int8 KV cache: merged-head [B,T,D] rows quantized per token
                # over d_model.  For the W8A8 path this is lossless — k/v
                # already sit on the int8 grid after quantize_output
                # fake-quant (quant_linear.py:111-119) and re-quantizing with
                # the recomputed absmax scale is exact.  The layout is the
                # projection's own output: cache writes are contiguous rows
                # and the fused kernel DMAs whole (T, D) slabs.
                from onnx_transformer_tpu.quant.core import quantize_act_per_token

                kq, ks = quantize_act_per_token(kfull)  # [B,1,D] int8, [B,1,1]
                vq, vs = quantize_act_per_token(vfull)
                for key, val in (("k", kq), ("v", vq),
                                 ("k_scale", ks), ("v_scale", vs)):
                    self_cache[key] = _scale_update(
                        self_cache[key], val, cache_index, time_major=cache_tm)
                if cache_tm:
                    # time-major [T,B,D] cache: contiguous ring writes +
                    # storage-order batched dots (no fused-kernel variant).
                    # Callers enable tm only under a quantized-output-grid
                    # linear impl, where round(q/sq) is exact.
                    assert getattr(lin, "quantized_output_grid", False), (
                        "time-major int8 cache requires a W8A8 linear impl "
                        "with quantize_output (exact int8 q recovery)")
                    ctx = L.int8_cache_attention_qdot_tm(
                        q_full, self_cache["k"], self_cache["k_scale"],
                        self_cache["v"], self_cache["v_scale"], mask,
                        cfg.quantize_attn_probs, h)
                    return lin(f"{name}.linears.3", ctx,
                               p["o"]["w"], p["o"]["b"], taps, inject)
                if use_fused:
                    return _fused(self_cache["k"], self_cache["k_scale"],
                                  self_cache["v"], self_cache["v_scale"])
                if single_step:
                    return _xla_int8(self_cache["k"], self_cache["k_scale"],
                                     self_cache["v"], self_cache["v_scale"])
                # fallback: dequantize the full cache for attention
                k = L.split_heads(
                    self_cache["k"].astype(jnp.float32) * self_cache["k_scale"], h)
                v = L.split_heads(
                    self_cache["v"].astype(jnp.float32) * self_cache["v_scale"], h)
            else:
                # NOTE (r5 negative result, removed): an int8-operand BLOCK
                # attention for the prefill (exact int32 score dots,
                # int8-sized head-split copies) measured 46.6 vs 38.2 ms
                # prefill in an interleaved A/B — the three extra
                # requantize passes (the fp path feeds fake-quant outputs
                # straight into the dots) cost more than int8 dots save at
                # dk=64.  See RESULTS.md r5.
                k = L.split_heads(kfull, h)
                v = L.split_heads(vfull, h)
                if self_cache is not None:
                    # write this step's k/v into the cache, attend over the prefix
                    k = _cache_update(self_cache["k"], k, cache_index)
                    v = _cache_update(self_cache["v"], v, cache_index)
                    self_cache["k"], self_cache["v"] = k, v
        ctx = L.scaled_dot_attention(
            q, k, v, mask,
            quantize=cfg.quantize_attn_probs,
            drop_rate=cfg.dropout,
            rng=rngs.next() if rngs else None,
            train=train,
            name=name,
            taps=taps,
            inject=inject,
        )
        out = L.merge_heads(ctx)
        return lin(f"{name}.linears.3", out, p["o"]["w"], p["o"]["b"], taps, inject)

    def _ffn(self, p, name, x, rngs, train, taps, inject, lin: LinearImpl):
        """w_2(dropout(relu(w_1(x)))) (position_feed_forward.py:12-13)."""
        hcur = lin(f"{name}.w_1", x, p["w1"]["w"], p["w1"]["b"], taps, inject)
        hcur = jax.nn.relu(hcur)
        hcur = L.dropout(hcur, self.cfg.dropout, rngs.next() if rngs else None, train)
        return lin(f"{name}.w_2", hcur, p["w2"]["w"], p["w2"]["b"], taps, inject)

    def _sublayer(self, x, ln_p, fn, rngs, train):
        """Pre-norm residual: x + dropout(fn(norm(x))) (sublayer_connection.py:15-17)."""
        y = fn(L.layer_norm(x, ln_p["scale"], ln_p["bias"]))
        return x + L.dropout(y, self.cfg.dropout, rngs.next() if rngs else None, train)

    # ------------------------------------------------------- scanned layers

    @staticmethod
    def _stack_layers(layers: list) -> Any:
        """List of per-layer param dicts -> one dict with a leading layer dim."""
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def _encoder_layer(self, lp, x, mask, rngs, train, taps, inject, lin, nm):
        x = self._sublayer(
            x, lp["ln0"],
            lambda h: self._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                                mask, rngs, train, taps, inject, lin),
            rngs, train,
        )
        return self._sublayer(
            x, lp["ln1"],
            lambda h: self._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, train, taps, inject, lin),
            rngs, train,
        )

    def _decoder_layer(self, lp, x, memory, tmask, smask, rngs, train, taps,
                       inject, lin, nm, layer_cache=None, cache_index=None,
                       kv_cross=None):
        x = self._sublayer(
            x, lp["ln0"],
            lambda h: self._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                                tmask, rngs, train, taps, inject, lin,
                                self_cache=layer_cache, cache_index=cache_index),
            rngs, train,
        )
        x = self._sublayer(
            x, lp["ln1"],
            lambda h: self._mha(lp["src_attn"], f"{nm}.src_attn", h, memory, memory,
                                smask, rngs, train, taps, inject, lin,
                                kv_precomputed=kv_cross),
            rngs, train,
        )
        return self._sublayer(
            x, lp["ln2"],
            lambda h: self._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, train, taps, inject, lin),
            rngs, train,
        )

    def _use_scan(self, taps, inject, cache) -> bool:
        return self.cfg.scan_layers and taps is None and inject is None and cache is None

    # ----------------------------------------------------------------- encode

    def encode(
        self,
        params: Params,
        src: jax.Array,
        src_mask: jax.Array,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        lin: LinearImpl = default_linear,
    ) -> jax.Array:
        rngs = _RngSource(rng)
        x = self.embed_src(params, src, rngs, train)
        mask = src_mask[:, None, :, :] if src_mask is not None else None
        if self._use_scan(taps, inject, None):
            stacked = self._stack_layers(params["encoder"]["layers"])
            n = self.cfg.num_layers
            keys = (jax.random.split(rngs.next(), n) if rng is not None
                    else jnp.zeros((n, 2), jnp.uint32))

            def body(h, lp_key):
                lp, key = lp_key
                lrngs = _RngSource(key if rng is not None else None)
                return self._encoder_layer(lp, h, mask, lrngs, train, None, None,
                                           lin, "encoder.layers.s"), None

            if train:
                # rematerialise the layer body in backward: saving the
                # per-layer intermediates through the scan carry cost
                # ~155 ms/step of layout copies + f32 residual stacks at
                # B=128 (profiled round 4); recomputing them costs a third
                # of the (much cheaper) matmul FLOPs
                body = jax.checkpoint(body)
            x, _ = jax.lax.scan(body, x, (stacked, keys))
            ln_f = params["encoder"]["ln"]
            return L.layer_norm(x, ln_f["scale"], ln_f["bias"])
        for i, lp in enumerate(params["encoder"]["layers"]):
            nm = f"encoder.layers.{i}"
            x = self._sublayer(
                x, lp["ln0"],
                lambda h: self._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                                    mask, rngs, train, taps, inject, lin),
                rngs, train,
            )
            x = self._sublayer(
                x, lp["ln1"],
                lambda h: self._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, train, taps, inject, lin),
                rngs, train,
            )
        ln_f = params["encoder"]["ln"]
        return L.layer_norm(x, ln_f["scale"], ln_f["bias"])

    # ----------------------------------------------------------------- decode

    def decode(
        self,
        params: Params,
        memory: jax.Array,
        src_mask: jax.Array,
        tgt_in: jax.Array,
        tgt_mask: jax.Array,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        lin: LinearImpl = default_linear,
        cache: Optional[dict] = None,
        cache_index=None,
        fused_attn: bool = False,
        embed_offset=None,
        cache_time_major: bool = False,
    ) -> jax.Array:
        """Full (teacher-forced) decode, or incremental when ``cache`` given.

        With a cache, ``tgt_in`` is the current token(s) [B, 1],
        ``tgt_mask`` is the mask over cache positions [B, 1, Tmax], and
        ``cache_index`` the write position (``embed_offset`` overrides the
        positional-encoding offset when the write position is a shared ring
        index rather than the logical position).  Returns hidden states
        [B, T, D]; the cache dict is updated functionally (returned via
        ``cache`` arg mutation of the local dict — callers use
        :meth:`decode_step`).
        """
        rngs = _RngSource(rng)
        offset = cache_index if cache is not None else 0
        if embed_offset is not None:
            offset = embed_offset
        x = self.embed_tgt(params, tgt_in, offset, rngs, train)
        tmask = tgt_mask[:, None, :, :] if tgt_mask is not None else None
        smask = src_mask[:, None, :, :] if src_mask is not None else None
        if self._use_scan(taps, inject, cache):
            stacked = self._stack_layers(params["decoder"]["layers"])
            n = self.cfg.num_layers
            keys = (jax.random.split(rngs.next(), n) if rng is not None
                    else jnp.zeros((n, 2), jnp.uint32))

            def body(h, lp_key):
                lp, key = lp_key
                lrngs = _RngSource(key if rng is not None else None)
                return self._decoder_layer(lp, h, memory, tmask, smask, lrngs,
                                           train, None, None, lin,
                                           "decoder.layers.s"), None

            if train:
                body = jax.checkpoint(body)   # see encode: residual-save
                                              # copies dominate the step
            x, _ = jax.lax.scan(body, x, (stacked, keys))
            ln_f = params["decoder"]["ln"]
            return L.layer_norm(x, ln_f["scale"], ln_f["bias"])
        for i, lp in enumerate(params["decoder"]["layers"]):
            nm = f"decoder.layers.{i}"
            layer_cache = cache["layers"][i] if cache is not None else None
            kv_cross = None
            if cache is not None and "cross_k" in cache["layers"][i]:
                lc = cache["layers"][i]
                if "cross_k_scale" in lc:
                    # int8 cross cache: hand _mha the quantized operands —
                    # the fused kernel consumes them directly, the jnp
                    # fallback dequantises at the attention site
                    kv_cross = {"kq": lc["cross_k"], "ks": lc["cross_k_scale"],
                                "vq": lc["cross_v"], "vs": lc["cross_v_scale"]}
                else:
                    kv_cross = (lc["cross_k"], lc["cross_v"])
            x = self._sublayer(
                x, lp["ln0"],
                lambda h: self._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                                    tmask, rngs, train, taps, inject, lin,
                                    self_cache=layer_cache, cache_index=cache_index,
                                    fused_attn=fused_attn, cache_tm=cache_time_major),
                rngs, train,
            )
            x = self._sublayer(
                x, lp["ln1"],
                lambda h: self._mha(lp["src_attn"], f"{nm}.src_attn", h, memory, memory,
                                    smask, rngs, train, taps, inject, lin,
                                    kv_precomputed=kv_cross, fused_attn=fused_attn),
                rngs, train,
            )
            x = self._sublayer(
                x, lp["ln2"],
                lambda h: self._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, train, taps, inject, lin),
                rngs, train,
            )
        ln_f = params["decoder"]["ln"]
        return L.layer_norm(x, ln_f["scale"], ln_f["bias"])

    # -------------------------------------------------------------- generator

    def generate(
        self,
        params: Params,
        x: jax.Array,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        lin: LinearImpl = default_linear,
        log_probs: bool = True,
    ) -> jax.Array:
        """log_softmax(proj(x)) (generator.py:14-15).

        ``log_probs=False`` returns raw logits — argmax-invariant (log_softmax
        subtracts a per-row constant), used by the greedy decoders to skip
        the [B, V] normalisation reductions entirely."""
        g = params["generator"]
        y = lin("generator.proj", x, g["w"], g["b"], taps, inject)
        return L.log_softmax(y) if log_probs else y

    # ---------------------------------------------------------------- forward

    def forward(
        self,
        params: Params,
        src: jax.Array,
        tgt_in: jax.Array,
        src_mask: jax.Array,
        tgt_mask: jax.Array,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        lin: LinearImpl = default_linear,
    ) -> jax.Array:
        """EncoderDecoder.forward (encoder_decoder.py:19-29): hidden states,
        not logits (the reference applies the generator separately in the
        loss, iwslt14_train.py:108-123)."""
        r1, r2 = (None, None) if rng is None else jax.random.split(rng)
        memory = self.encode(params, src, src_mask, r1, train, taps, inject, lin)
        return self.decode(params, memory, src_mask, tgt_in, tgt_mask, r2, train, taps, inject, lin)

    def forward_logits(self, params, src, tgt_in, src_mask, tgt_mask, **kw):
        h = self.forward(params, src, tgt_in, src_mask, tgt_mask, **kw)
        return self.generate(params, h, taps=kw.get("taps"), inject=kw.get("inject"),
                             lin=kw.get("lin", default_linear))

    # --------------------------------------------------------------- KV cache

    def init_cache(
        self,
        params: Params,
        memory: jax.Array,
        max_len: int,
        lin: LinearImpl = default_linear,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        cache_dtype: str = "fp32",
        time_major: bool = False,
    ) -> dict:
        """Build the decode cache: empty self-attention K/V rings plus
        precomputed cross-attention projections of the encoder memory.

        This is the structural fix for the reference's biggest serving gap —
        it re-runs the full decoder graph per emitted token and even rebuilds
        the ORT session each step (onnx_optimized_custom_inference.py:624-671).
        """
        cfg = self.cfg
        b = memory.shape[0]
        h, dk = cfg.num_heads, cfg.d_model // cfg.num_heads
        int8 = cache_dtype == "int8"
        layers = []
        for cross in self.cross_kv(params, memory, lin=lin, taps=taps,
                                   inject=inject, cache_dtype=cache_dtype):
            entry = dict(cross)
            if int8:
                # merged-head rows + per-token scales; time_major stores
                # [T, B, *] so each decode step writes ONE contiguous slab
                kv_shape = ((max_len, b, cfg.d_model) if time_major
                            else (b, max_len, cfg.d_model))
                sc_shape = ((max_len, b, 1) if time_major
                            else (b, max_len, 1))
                entry.update(
                    k=jnp.zeros(kv_shape, jnp.int8),
                    v=jnp.zeros(kv_shape, jnp.int8),
                    k_scale=jnp.zeros(sc_shape, jnp.float32),
                    v_scale=jnp.zeros(sc_shape, jnp.float32),
                )
            else:
                entry.update(
                    k=jnp.zeros((b, h, max_len, dk), memory.dtype),
                    v=jnp.zeros((b, h, max_len, dk), memory.dtype),
                )
            layers.append(entry)
        return {"layers": layers}

    def cross_kv(
        self,
        params: Params,
        memory: jax.Array,
        lin: LinearImpl = default_linear,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        cache_dtype: str = "fp32",
    ) -> list:
        """Cross-attention K/V projections of the encoder memory, per decoder
        layer — the precomputable half of :meth:`init_cache`.  The serving
        engine's staged prefill uses this directly (it writes the projections
        into a staging ring instead of a fresh cache)."""
        int8 = cache_dtype == "int8"
        h = self.cfg.num_heads
        # producer fast path: a fused-mode W8A8 impl can emit int8 rows +
        # per-token scales straight from the kernel (quant_w8a8_matmul_q8)
        # — no fp32 projection output in HBM, no separate quantize pass
        q8 = getattr(lin, "linear_q8", None) if (
            int8 and taps is None and inject is None) else None
        layers = []
        for i, lp in enumerate(params["decoder"]["layers"]):
            nm = f"decoder.layers.{i}.src_attn"
            ap = lp["src_attn"]
            if q8 is not None:
                rk = q8(f"{nm}.linears.1", memory)
                rv = q8(f"{nm}.linears.2", memory)
                if rk is not None and rv is not None:
                    layers.append({
                        "cross_k": rk[0],         # [B, S, D] int8
                        "cross_v": rv[0],
                        "cross_k_scale": rk[1],   # [B, S, 1]
                        "cross_v_scale": rv[1],
                    })
                    continue
            ckf = lin(f"{nm}.linears.1", memory, ap["k"]["w"], ap["k"]["b"], taps, inject)
            cvf = lin(f"{nm}.linears.2", memory, ap["v"]["w"], ap["v"]["b"], taps, inject)
            if int8:
                from onnx_transformer_tpu.quant.core import quantize_act_per_token

                ckq, cks = quantize_act_per_token(ckf)
                cvq, cvs = quantize_act_per_token(cvf)
                layers.append({
                    "cross_k": ckq,        # [B, S, D]
                    "cross_v": cvq,
                    "cross_k_scale": cks,  # [B, S, 1]
                    "cross_v_scale": cvs,
                })
            else:
                layers.append({
                    "cross_k": L.split_heads(ckf, h),  # [B, H, S, dk]
                    "cross_v": L.split_heads(cvf, h),
                })
        return layers

    def decode_step(
        self,
        params: Params,
        cache: dict,
        tok: jax.Array,        # [B, 1] current token ids
        index,                 # scalar int: position of tok
        src_mask: jax.Array,   # [B, 1, S]
        lin: LinearImpl = default_linear,
        taps: L.TapDict = None,
        inject: L.InjectDict = None,
        fused_attn: bool = False,
        log_probs: bool = True,
        ring_index=None,
        time_major: bool = False,
    ) -> tuple[jax.Array, dict]:
        """One KV-cached decoder step -> (next-token log-probs [B, V], cache).

        ``index`` is the logical position of ``tok``: a scalar for lockstep
        batch decode, or a [B] vector of per-row positions (continuous
        batching — every slot sits at its own step).

        ``ring_index`` (scalar): step-synchronous ring-cache mode.  All rows
        write their K/V at the SAME physical cache position ``ring_index``
        (one aliased dynamic-update-slice — per-row scatters at
        heterogeneous positions cost ~35us/buffer/step on TPU, measured),
        while each row's *logical* window is selected by an age mask: a
        physical position written ``a`` steps ago is visible iff
        ``a <= index[row]``.  Requires per-row generation length < max_len
        (the engine's kill rule guarantees it), so a row never collides
        with its own window; older positions belong to finished occupants
        and fall outside every live window.
        ``log_probs=False`` returns raw logits (argmax-equivalent).
        """
        k0 = cache["layers"][0]["k"]
        if time_major:
            max_len = k0.shape[0]               # [T,B,D] int8 ring cache
        else:
            max_len = k0.shape[1] if k0.ndim == 3 else k0.shape[2]  # [B,T,D] int8 / [B,H,T,dk] fp
        pos = jnp.arange(max_len)
        idx = jnp.asarray(index)
        if ring_index is not None:
            # age of each physical position after this step's write lands
            age = jnp.mod(jnp.asarray(ring_index) - pos, max_len)  # [Tmax]
            step_mask = age[None, None, :] <= idx[:, None, None]   # [B,1,Tmax]
            write_index, embed_offset = ring_index, jnp.maximum(idx, 0)
        elif idx.ndim == 1:
            # attend over cache positions <= index
            step_mask = pos[None, None, :] <= idx[:, None, None]  # [B,1,Tmax]
            write_index, embed_offset = index, None
        else:
            step_mask = (pos <= idx)[None, None, :]  # [1,1,Tmax]
            step_mask = jnp.broadcast_to(step_mask, (tok.shape[0], 1, max_len))
            write_index, embed_offset = index, None
        # local copy of per-layer dicts so updates stay functional
        cache = {"layers": [dict(lc) for lc in cache["layers"]]}
        h = self.decode(
            params, memory=None, src_mask=src_mask,
            tgt_in=tok, tgt_mask=step_mask,
            lin=lin, taps=taps, inject=inject,
            cache=cache, cache_index=write_index, fused_attn=fused_attn,
            embed_offset=embed_offset, cache_time_major=time_major,
        )
        logp = self.generate(params, h[:, -1], taps=taps, inject=inject,
                             lin=lin, log_probs=log_probs)
        return logp, cache
