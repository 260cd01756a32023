"""Pipeline parallelism: GPipe-style microbatch pipelining over a ``pipe``
mesh axis, composed with tensor parallelism (``model`` axis, auto-partitioned
by XLA) and data parallelism (``data`` axis).

The reference has no pipeline parallelism (SURVEY.md §2.6 — its only
multi-device axis is NCCL DDP, ``distributed/iwslt14_train.py:377-380``).
This module adds the optional stage sharding of the 6-layer encoder/decoder
stacks that SURVEY.md §7 step 6 calls for, the TPU way:

- layer params are stacked on a leading layer dim and sharded ``P('pipe')``,
  so each stage holds ``num_layers / n_stages`` contiguous layers in HBM;
- activations move stage-to-stage with ``jax.lax.ppermute`` (a collective
  permute riding ICI), inside ``jax.shard_map`` manual only over ``pipe`` —
  the ``model`` and ``data`` axes stay automatic, so Megatron TP collectives
  and the DP gradient all-reduce are still inserted by XLA *inside* each
  stage;
- the schedule is the classic loop of ``n_micro + n_stages - 1`` ticks
  (GPipe bubble); everything is a differentiable ``lax.scan``, so the same
  program serves training (grads flow through the transposed ppermute).

Sequence parallelism (also absent from the reference) is provided as
``sp_constrain``: activations in the norm/embedding regions between stages
are annotated ``P('data', 'model', None)`` — sequence dim sharded over the
TP axis — so XLA materialises the Megatron-SP reduce-scatter/all-gather
pairs around each TP block instead of keeping full activations replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onnx_transformer_tpu.models.transformer import (
    Transformer, _RngSource, default_linear,
)
from onnx_transformer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from onnx_transformer_tpu.parallel import sharding as S

PIPE_AXIS = "pipe"


def make_pipeline_mesh(
    data: int = 1, pipe: int = 2, model: int = 1, devices=None
) -> Mesh:
    """(data, pipe, model) mesh. Axis order puts ``model`` innermost so TP
    collectives ride the fastest ICI links; ``pipe`` neighbours are adjacent."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * pipe * model
    assert n <= len(devices), f"mesh {data}x{pipe}x{model} > {len(devices)} devices"
    arr = np.asarray(devices[:n]).reshape(data, pipe, model)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


# ------------------------------------------------------- param (re)stacking

def stack_pipeline_params(params: Any) -> Any:
    """List-of-layer params -> stacked [L, ...] encoder/decoder stacks
    (the layout ``P('pipe')`` shards into per-stage contiguous blocks)."""
    out = dict(params)
    for k in ("encoder", "decoder"):
        out[k] = {
            "layers": Transformer._stack_layers(params[k]["layers"]),
            "ln": params[k]["ln"],
        }
    return out


def unstack_pipeline_params(params: Any) -> Any:
    """Inverse of :func:`stack_pipeline_params` (for checkpoint interop)."""
    out = dict(params)
    for k in ("encoder", "decoder"):
        stacked = params[k]["layers"]
        n = int(jax.tree.leaves(stacked)[0].shape[0])
        layers = [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(n)]
        out[k] = {"layers": layers, "ln": params[k]["ln"]}
    return out


def _prepend_pipe(spec_tree: Any) -> Any:
    return jax.tree.map(
        lambda s: P(PIPE_AXIS, *s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def pipeline_param_pspecs(stacked_params: Any) -> Any:
    """PartitionSpec tree for stacked params: layer stacks P('pipe', <TP>),
    everything else the plain TP layout from parallel/sharding.py."""
    return {
        "src_embed": {"lut": P()},
        "tgt_embed": {"lut": P()},
        "encoder": {"layers": _prepend_pipe({
            "self_attn": S._attn_pspec(), "ffn": S._ffn_pspec(),
            "ln0": S._ln_pspec(), "ln1": S._ln_pspec()}),
            "ln": S._ln_pspec()},
        "decoder": {"layers": _prepend_pipe({
            "self_attn": S._attn_pspec(), "src_attn": S._attn_pspec(),
            "ffn": S._ffn_pspec(),
            "ln0": S._ln_pspec(), "ln1": S._ln_pspec(), "ln2": S._ln_pspec()}),
            "ln": S._ln_pspec()},
        "generator": {"w": P(), "b": P()},
    }


def shard_pipeline_state(state_tree: dict, mesh: Mesh) -> dict:
    """Place a stacked-param train state on a (data, pipe, model) mesh;
    Adam moments mirror their params, step is replicated."""
    pspecs = pipeline_param_pspecs(state_tree["params"])

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree.map(put, state_tree["params"], pspecs)

    def shard_opt(o):
        if isinstance(o, tuple) and hasattr(o, "_fields"):  # optax NamedTuple
            return type(o)(*[shard_opt(f) for f in o])
        if isinstance(o, tuple):
            return tuple(shard_opt(f) for f in o)
        # moment trees mirror the param tree
        try:
            return jax.tree.map(put, o, pspecs)
        except (ValueError, TypeError):
            return jax.device_put(o, NamedSharding(mesh, P()))

    return {
        "params": params,
        "opt_state": shard_opt(state_tree["opt_state"]),
        "step": jax.device_put(state_tree["step"], NamedSharding(mesh, P())),
    }


# -------------------------------------------------- sequence parallelism

def sp_constrain(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Megatron-style sequence parallelism: in the regions between TP blocks
    (embeddings, final norms) shard the *sequence* dim over the ``model``
    axis, so XLA turns the TP all-reduce into reduce-scatter + all-gather
    and the LN/dropout work is 1/TP per chip."""
    if mesh is None or MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    )


# ----------------------------------------------------------- the pipeline

def pipeline_apply(
    layer_fn: Callable[[Any, jax.Array, Any, jax.Array], jax.Array],
    stacked_lp: Any,
    x: jax.Array,
    extras: Any,
    *,
    n_micro: int,
    mesh: Mesh,
    base_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Run a stacked layer sequence as a GPipe pipeline over ``pipe``.

    ``layer_fn(lp, h, extras_m, key)`` applies ONE layer to activations
    ``h`` [b, T, D] with that microbatch's ``extras_m`` (masks / memory) and
    a dropout key. ``x`` is the full batch [B, T, D] with B % n_micro == 0;
    ``extras`` is a pytree of batch-major arrays microbatched alongside x.

    Per tick, stage ``i`` processes microbatch ``t - i`` then collective-
    permutes its output to stage ``i+1``; total ``n_micro + n_stages - 1``
    ticks (the GPipe bubble — per-chip utilisation M/(M+S-1)).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    B = x.shape[0]
    assert B % n_micro == 0, f"batch {B} not divisible by n_micro {n_micro}"
    M = n_micro
    xm = x.reshape(M, B // M, *x.shape[1:])
    em = jax.tree.map(lambda e: e.reshape(M, B // M, *e.shape[1:]), extras)
    key = base_key if base_key is not None else jnp.zeros((2,), jnp.uint32)

    def stage_fn(lp_local, xm, em, key):
        S_ = n_stages
        stage = jax.lax.axis_index(PIPE_AXIS)
        n_local = jax.tree.leaves(lp_local)[0].shape[0]

        def apply_stage(h, m_idx):
            ex = jax.tree.map(lambda e: e[m_idx], em)

            def body(h, lp_i):
                lp, i_local = lp_i
                lk = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.wrap_key_data(key),
                        stage * n_local + i_local),
                    m_idx,
                ) if base_key is not None else None
                return layer_fn(lp, h, ex, lk), None

            h, _ = jax.lax.scan(body, h, (lp_local, jnp.arange(n_local)))
            return h

        def tick(carry, t):
            buf, out_acc = carry
            feed = xm[jnp.clip(t, 0, M - 1)]
            buf = jnp.where(stage == 0, feed, buf)
            m_idx = jnp.clip(t - stage, 0, M - 1)
            out = apply_stage(buf, m_idx)
            # last stage banks microbatch t - (S-1)
            w = t - (S_ - 1)
            valid = (w >= 0) & (w < M) & (stage == S_ - 1)
            wc = jnp.clip(w, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out_acc, wc, 0, keepdims=False)
            out_acc = jax.lax.dynamic_update_index_in_dim(
                out_acc, jnp.where(valid, out, cur), wc, 0)
            # stage i -> i+1 over ICI
            buf = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, (i + 1) % S_) for i in range(S_)])
            return (buf, out_acc), None

        # Seed every stage's buffer with REAL activations (microbatch 0),
        # not zeros: bubble-tick compute is discarded by the where-gates,
        # but its *param cotangents* still sum in — and an all-zero input
        # drives LayerNorm's d(sqrt(var))/dx to inf (NaN grads). Real data
        # keeps the discarded work grad-finite.
        buf0 = xm[0]
        (_, out_acc), _ = jax.lax.scan(
            tick, (buf0, jnp.zeros_like(xm)), jnp.arange(M + S_ - 1))
        # Results live on the last stage; replicate with a recursive-doubling
        # broadcast (log2(S) hops, each link carries the payload once) —
        # a psum of the zero-padded bank would move ~2x the payload per link
        # for S > 2 just to add zeros.
        def _off(i):  # ring distance behind the last stage
            return (i - (S_ - 1)) % S_

        val = out_acc
        hop = 1
        while hop < S_:
            perm = [(i, (i + hop) % S_) for i in range(S_)
                    if _off(i) < hop and _off(i) + hop < S_]
            rot = jax.lax.ppermute(val, PIPE_AXIS, perm)
            off = (stage - (S_ - 1)) % S_
            val = jnp.where((off >= hop) & (off < 2 * hop), rot, val)
            hop *= 2
        return val

    key_data = jax.random.key_data(key) if base_key is not None else key
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P(), P()),
        out_specs=P(),
        axis_names={PIPE_AXIS},
        check_vma=False,
    )(stacked_lp, xm, em, key_data)
    return out.reshape(B, *x.shape[1:])


# ------------------------------------------------- full pipelined forward

def pipelined_forward_logits(
    model: Transformer,
    params: Any,
    src: jax.Array,
    tgt_in: jax.Array,
    src_mask: jax.Array,
    tgt_mask: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    lin=default_linear,
) -> jax.Array:
    """Teacher-forced log-probs with the encoder and decoder stacks each run
    as a pipeline (params in stacked form). Embeddings / final norms /
    generator are replicated across ``pipe`` and sequence-sharded over the
    TP axis (:func:`sp_constrain`)."""
    cfg = model.cfg
    keys = (jax.random.split(rng, 4) if rng is not None else [None] * 4)
    smask4 = src_mask[:, None, :, :] if src_mask is not None else None
    tmask4 = tgt_mask[:, None, :, :] if tgt_mask is not None else None

    x = model.embed_src(params, src, _RngSource(keys[0]), train)
    x = sp_constrain(x, mesh)

    def enc_layer(lp, h, ex, key):
        return model._encoder_layer(
            lp, h, ex["mask"], _RngSource(key), train, None, None, lin,
            "encoder.layers.pp")

    x = pipeline_apply(
        enc_layer, params["encoder"]["layers"], x, {"mask": smask4},
        n_micro=n_micro, mesh=mesh, base_key=keys[1])
    ln = params["encoder"]["ln"]
    from onnx_transformer_tpu.ops import layers as L
    memory = L.layer_norm(x, ln["scale"], ln["bias"])
    memory = sp_constrain(memory, mesh)

    y = model.embed_tgt(params, tgt_in, 0, _RngSource(keys[2]), train)
    y = sp_constrain(y, mesh)

    def dec_layer(lp, h, ex, key):
        return model._decoder_layer(
            lp, h, ex["memory"], ex["tmask"], ex["smask"], _RngSource(key),
            train, None, None, lin, "decoder.layers.pp")

    y = pipeline_apply(
        dec_layer, params["decoder"]["layers"], y,
        {"memory": memory, "tmask": tmask4, "smask": smask4},
        n_micro=n_micro, mesh=mesh, base_key=keys[3])
    ln = params["decoder"]["ln"]
    y = L.layer_norm(y, ln["scale"], ln["bias"])
    y = sp_constrain(y, mesh)
    return model.generate(params, y, lin=lin)


def make_pipeline_train_step(
    model: Transformer,
    tx,
    mesh: Mesh,
    n_micro: int,
    smoothing: float = 0.1,
    donate: bool = True,
    lin=default_linear,
):
    """Compiled 4D-parallel (DP x PP x TP + SP) train step over stacked
    params: fn(state_tree, (src, tgt_in, tgt_y, src_mask, tgt_mask), rng)
    -> (state_tree, metrics)."""
    import optax
    from onnx_transformer_tpu.train.loss import loss_and_ntokens

    def loss_fn(params, arrs, rng):
        src, tgt_in, tgt_y, src_mask, tgt_mask = arrs
        logp = pipelined_forward_logits(
            model, params, src, tgt_in, src_mask, tgt_mask,
            mesh=mesh, n_micro=n_micro, rng=rng, train=True, lin=lin)
        loss, ntok = loss_and_ntokens(logp, tgt_y, model.cfg.pad_id, smoothing)
        ntok = jnp.maximum(ntok, 1)
        return loss / ntok, (loss, ntok)

    def step_fn(state, arrs, rng):
        params, opt_state, step = state["params"], state["opt_state"], state["step"]
        (_, (loss, ntok)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, arrs, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return ({"params": params, "opt_state": opt_state, "step": step + 1},
                {"loss": loss, "ntokens": ntok})

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
