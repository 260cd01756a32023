"""Training tests: loss semantics, Noam schedule, overfit smoke, checkpoint
round-trip, DP/TP mesh train step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.data.dataset import Batch, collate
from onnx_transformer_tpu.data.vocab import SPECIALS, Vocab
from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.train import checkpoint as CKPT
from onnx_transformer_tpu.train.loss import label_smoothing_loss, smoothed_true_dist
from onnx_transformer_tpu.train.schedule import noam_schedule
from onnx_transformer_tpu.train import trainer as T


def test_smoothed_true_dist_reference_semantics():
    # label_smoothing.py:17-27 with size=6, pad=2, smoothing=0.1
    targets = jnp.asarray([4, 2])
    d = np.array(smoothed_true_dist(targets, 6, 2, 0.1))
    fill = 0.1 / 4
    want0 = np.array([fill, fill, 0.0, fill, 0.9, fill])
    np.testing.assert_allclose(d[0], want0, rtol=1e-6)
    np.testing.assert_allclose(d[1], np.zeros(6), atol=0)  # pad row zeroed


def test_label_smoothing_loss_matches_manual_kl():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 6)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    targets = np.array([4, 5, 2])
    d = np.array(smoothed_true_dist(jnp.asarray(targets), 6, 2, 0.1))
    manual = float(
        np.sum(np.where(d > 0, d * (np.log(np.where(d > 0, d, 1)) - logp), 0.0))
    )
    got = float(label_smoothing_loss(jnp.asarray(logp), jnp.asarray(targets), 2, 0.1))
    assert got == pytest.approx(manual, rel=1e-5)


def test_noam_schedule_values():
    rate = noam_schedule(512, factor=1.0, warmup=3000)
    # warmup region: rate = d^-.5 * step * warmup^-1.5
    assert float(rate(100)) == pytest.approx(512**-0.5 * 100 * 3000**-1.5, rel=1e-6)
    # decay region: rate = d^-.5 * step^-.5
    assert float(rate(10000)) == pytest.approx(512**-0.5 * 10000**-0.5, rel=1e-6)
    # step 0 guarded like the reference LambdaLR (iwslt14_train.py:44-47)
    assert np.isfinite(float(rate(0)))


def _tiny_setup(accum=1):
    cfg = TransformerConfig(
        src_vocab_size=16, tgt_vocab_size=16, num_layers=1, d_model=16,
        d_ff=32, num_heads=2, dropout=0.0,
    )
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model, base_lr=2.0, warmup=100)
    state = T.init_state(model, tx, jax.random.key(0))
    v = Vocab(SPECIALS + [f"t{i}" for i in range(12)])
    pairs = [("t1 t2 t3", "t2 t3"), ("t4 t5", "t5 t4"), ("t1 t4", "t4"), ("t2", "t2 t2")]
    src, tgt = collate(pairs, v, v, max_padding=8)
    batch = Batch.make(src, tgt)
    step = T.make_train_step(model, tx, accum=accum, donate=False)
    return model, tx, state, batch, step


def test_overfit_tiny_batch_reduces_loss():
    model, tx, state, batch, step = _tiny_setup()
    tree = state.tree()
    arrs = T.batch_to_arrays(batch)
    losses = []
    rng = jax.random.key(1)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        tree, m = step(tree, arrs, sub)
        losses.append(float(m["loss"]) / max(int(m["ntokens"]), 1))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_accum_microbatching_runs_and_learns():
    model, tx, state, batch, step = _tiny_setup(accum=2)
    tree = state.tree()
    arrs = T.batch_to_arrays(batch, accum=2)
    rng = jax.random.key(1)
    l0 = None
    for i in range(20):
        rng, sub = jax.random.split(rng)
        tree, m = step(tree, arrs, sub)
        l = float(m["loss"]) / max(int(m["ntokens"]), 1)
        l0 = l if l0 is None else l0
    assert l < l0


def test_checkpoint_roundtrip(tmp_path):
    model, tx, state, batch, step = _tiny_setup()
    tree = state.tree()
    arrs = T.batch_to_arrays(batch)
    tree, _ = step(tree, arrs, jax.random.key(2))
    path = str(tmp_path / "ck.npz")
    CKPT.save(path, tree)
    template = T.init_state(model, tx, jax.random.key(9)).tree()
    restored = CKPT.restore(path, template)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from restore
    t1, m1 = step(tree, arrs, jax.random.key(3))
    t2, m2 = step(restored, arrs, jax.random.key(3))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


@pytest.mark.slow
def test_data_parallel_mesh_step_matches_single_device():
    from onnx_transformer_tpu.parallel.mesh import make_mesh

    model, tx, state, batch, step = _tiny_setup()
    arrs = T.batch_to_arrays(batch)
    tree_sd, m_sd = step(state.tree(), arrs, jax.random.key(5))

    mesh = make_mesh(data=4, model=1)
    tree = T.shard_state(state.tree(), mesh)
    sharded = T.shard_batch(arrs, mesh)
    step2 = T.make_train_step(model, tx, mesh=mesh, donate=False)
    tree_dp, m_dp = step2(tree, sharded, jax.random.key(5))
    assert float(m_dp["loss"]) == pytest.approx(float(m_sd["loss"]), rel=1e-3)
    # One Adam step normalises each grad to +-lr (m/sqrt(v) ~ +-1), so any
    # reduction-order noise in a near-zero gradient flips a full update of
    # magnitude lr (5e-4 here). Bound by 2*lr: catches real sharding bugs
    # (wrong averaging scales updates, >> lr) without flaking on sign flips.
    for a, b in zip(jax.tree.leaves(tree_sd["params"]), jax.tree.leaves(tree_dp["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.1e-3)


@pytest.mark.slow
def test_tensor_parallel_mesh_step_runs():
    from onnx_transformer_tpu.parallel.mesh import make_mesh

    model, tx, state, batch, step = _tiny_setup()
    arrs = T.batch_to_arrays(batch)
    tree_sd, m_sd = step(state.tree(), arrs, jax.random.key(5))

    mesh = make_mesh(data=2, model=2)
    tree = T.shard_state(state.tree(), mesh)
    sharded = T.shard_batch(arrs, mesh)
    step2 = T.make_train_step(model, tx, mesh=mesh, donate=False)
    tree_tp, m_tp = step2(tree, sharded, jax.random.key(5))
    assert float(m_tp["loss"]) == pytest.approx(float(m_sd["loss"]), rel=1e-3)


@pytest.mark.slow
def test_bf16_mixed_precision_matches_fp32_trajectory():
    """bf16 compute with f32 master weights (compute_dtype=bfloat16) must
    track the f32 loss trajectory closely over a short run (VERDICT r3 #4)."""
    import jax.numpy as jnp

    cfg = TransformerConfig(
        src_vocab_size=41, tgt_vocab_size=37, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model, warmup=10)
    state32 = T.init_state(model, tx, jax.random.key(0)).tree()
    state16 = jax.tree.map(lambda x: x, state32)

    step32 = T.make_train_step(model, tx, donate=False)
    step16 = T.make_train_step(model, tx, donate=False,
                               compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    losses32, losses16 = [], []
    for i in range(8):
        src = rng.integers(4, 41, (8, 10)).astype(np.int32)
        tgt = rng.integers(4, 37, (8, 10)).astype(np.int32)
        tgt[:, 0] = cfg.bos_id
        batch = T.batch_to_arrays(Batch.make(src, tgt))
        key = jax.random.key(100 + i)
        state32, m32 = step32(state32, batch, key)
        state16, m16 = step16(state16, batch, key)
        losses32.append(float(m32["loss"]) / float(m32["ntokens"]))
        losses16.append(float(m16["loss"]) / float(m16["ntokens"]))
    # params stay f32 master copies
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state16["params"]))
    # same downward trajectory within ~1% per step
    for a, b in zip(losses32, losses16):
        assert abs(a - b) / a < 0.01, (losses32, losses16)
    assert losses16[-1] < losses16[0]
