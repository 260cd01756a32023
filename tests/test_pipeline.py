"""Pipeline-parallel (GPipe over a ``pipe`` mesh axis) tests on the
8-virtual-device CPU mesh: forward parity vs the plain stack, gradient
parity through the transposed ppermute, and the full 3D (DP x PP x TP)
train step.  The reference has no PP (SURVEY.md §2.6); the oracle here is
our own single-path model, per the golden-comparison strategy of §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu import Transformer, TransformerConfig
from onnx_transformer_tpu.data.dataset import Batch
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.parallel import pipeline as PP
from onnx_transformer_tpu.train import trainer as T
from onnx_transformer_tpu.train.loss import loss_and_ntokens


CFG = TransformerConfig(src_vocab_size=97, tgt_vocab_size=89, num_layers=4,
                        d_model=32, d_ff=64, num_heads=4, dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    model = Transformer(CFG)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, s = 8, 10
    src = rng.integers(4, 97, (b, s)).astype(np.int32)
    src[:, -2:] = CFG.pad_id
    tgt = rng.integers(4, 89, (b, s)).astype(np.int32)
    tgt[:, 0] = CFG.bos_id
    batch = Batch.make(src, tgt)
    return model, params, batch


def test_pipeline_apply_matches_sequential():
    mesh = PP.make_pipeline_mesh(data=1, pipe=2, model=1,
                                 devices=jax.devices()[:2])
    lp = {"w": jnp.stack([jnp.eye(4) * (i + 1) for i in range(4)])}
    x = jnp.arange(8 * 3 * 4, dtype=jnp.float32).reshape(8, 3, 4)

    def layer_fn(lp, h, ex, key):
        return h @ lp["w"] + ex["c"]

    out = jax.jit(lambda lp, x, c: PP.pipeline_apply(
        layer_fn, lp, x, {"c": c}, n_micro=4, mesh=mesh))(
            lp, x, jnp.ones((8, 3, 4)))
    ref = x
    for i in range(4):
        ref = ref @ (jnp.eye(4) * (i + 1)) + 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_pipelined_forward_matches_plain(setup):
    model, params, b = setup
    ref = model.forward_logits(params, b.src, b.tgt_in, b.src_mask, b.tgt_mask)
    mesh = PP.make_pipeline_mesh(data=2, pipe=2, model=2)
    sp = PP.stack_pipeline_params(params)
    out = jax.jit(lambda p: PP.pipelined_forward_logits(
        model, p, b.src, b.tgt_in, b.src_mask, b.tgt_mask,
        mesh=mesh, n_micro=2))(sp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pipeline_grad_parity(setup):
    model, params, b = setup
    mesh = PP.make_pipeline_mesh(data=2, pipe=2, model=2)
    arrs = T.batch_to_arrays(b)

    def plain_loss(p):
        logp = model.forward_logits(p, arrs[0], arrs[1], arrs[3], arrs[4])
        l, n = loss_and_ntokens(logp, arrs[2], CFG.pad_id, 0.1)
        return l / jnp.maximum(n, 1)

    def pp_loss(p):
        logp = PP.pipelined_forward_logits(
            model, p, arrs[0], arrs[1], arrs[3], arrs[4],
            mesh=mesh, n_micro=2)
        l, n = loss_and_ntokens(logp, arrs[2], CFG.pad_id, 0.1)
        return l / jnp.maximum(n, 1)

    g_plain = jax.grad(plain_loss)(params)
    g_pp = PP.unstack_pipeline_params(
        jax.jit(jax.grad(pp_loss))(PP.stack_pipeline_params(params)))
    for a, c in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


@pytest.mark.slow
def test_pipeline_train_step_runs(setup):
    model, params, b = setup
    mesh = PP.make_pipeline_mesh(data=2, pipe=2, model=2)
    tx = T.make_optimizer(CFG.d_model)
    stacked = PP.stack_pipeline_params(params)
    state = PP.shard_pipeline_state(
        {"params": stacked, "opt_state": tx.init(stacked),
         "step": jnp.zeros((), jnp.int32)}, mesh)
    step = PP.make_pipeline_train_step(model, tx, mesh, n_micro=2,
                                       donate=False)
    arrs = T.batch_to_arrays(b)
    state, metrics = step(state, arrs, jax.random.key(2))
    loss = float(metrics["loss"]) / max(int(metrics["ntokens"]), 1)
    assert np.isfinite(loss)
    assert int(jax.device_get(state["step"])) == 1
    # params actually moved
    d0 = jax.tree.leaves(stacked)[3]
    d1 = jax.tree.leaves(state["params"])[3]
    assert float(jnp.max(jnp.abs(jax.device_get(d1) - jax.device_get(d0)))) > 0


def test_stack_unstack_roundtrip(setup):
    _, params, _ = setup
    rt = PP.unstack_pipeline_params(PP.stack_pipeline_params(params))
    for a, c in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
