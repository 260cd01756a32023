"""Worker process for the 2-process jax.distributed test (not collected by
pytest).  Each instance is one "host": it rendezvouses with the coordinator,
loads only its data shard, and runs the SAME jitted DP train step as every
other process.  Reference behavior being matched: one-process-per-device
NCCL DDP with DistributedSampler (distributed/iwslt14_train.py:334,377-380).

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnx_transformer_tpu import Transformer, TransformerConfig  # noqa: E402
from onnx_transformer_tpu.data.dataset import BucketedLoader  # noqa: E402
from onnx_transformer_tpu.data.vocab import Vocab  # noqa: E402
from onnx_transformer_tpu.parallel import multihost as MH  # noqa: E402
from onnx_transformer_tpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: E402
from onnx_transformer_tpu.train import trainer as T  # noqa: E402


def synthetic_pairs(n=96, seed=7):
    """Deterministic fake corpus; lengths spread across buckets."""
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n):
        ls, lt = int(rng.integers(3, 20)), int(rng.integers(3, 20))
        pairs.append((
            " ".join(f"w{rng.integers(4, 40)}" for _ in range(ls)),
            " ".join(f"w{rng.integers(4, 40)}" for _ in range(lt)),
        ))
    return pairs


def main():
    coordinator, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    # DCN rendezvous (the TPU-native init_process_group)
    initialize_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nprocs

    words = ["<s>", "</s>", "<blank>", "<unk>"] + [f"w{i}" for i in range(40)]
    vocab = Vocab(words, default_index=3)
    pairs = synthetic_pairs()

    # per-process data shard, lockstep bucket shapes (token-budget mode)
    # token budget chosen so every bucket batch size is even: local shards
    # concatenate to a global batch divisible by the 4-device data axis
    loader = BucketedLoader(
        pairs, vocab, vocab, token_budget=192, max_padding=24, shuffle=True,
        seed=3, num_shards=nprocs, shard_index=pid, use_native=False,
        length_buckets=(8, 16, 24),
    )
    batches = list(loader)
    shapes = [tuple(b.src.shape) for b in batches]

    cfg = TransformerConfig(
        src_vocab_size=len(words), tgt_vocab_size=len(words), num_layers=2,
        d_model=16, d_ff=32, num_heads=2, dropout=0.0)
    model = Transformer(cfg)
    tx = T.make_optimizer(cfg.d_model, warmup=10)
    state = T.init_state(model, tx, jax.random.key(0)).tree()

    mesh = make_mesh(data=2 * nprocs, model=1)
    state = MH.replicate_tree(state, mesh)
    step = T.make_train_step(model, tx, donate=False)

    # first-step gradients: the clean cross-setting oracle (Adam's
    # sqrt(nu)+eps denominators amplify ulp-level grad noise into visible
    # param deltas, so param equality is only loose; grads are tight)
    def grad_fn(params, batch):
        return jax.grad(
            lambda p: T._loss_fn(model, p, *batch, None, 0.1)[0]
        )(params)

    gjit = jax.jit(grad_fn)
    g0 = gjit(state["params"], MH.global_batch(T.batch_to_arrays(batches[0]), mesh))
    if pid == 0:
        np.savez(os.path.join(outdir, "grads0.npz"),
                 **{str(i): MH.fetch_replicated(x)
                    for i, x in enumerate(jax.tree.leaves(g0))})

    local_batches = []
    losses = []
    rng = jax.random.key(5)
    for b in batches[:4]:
        arrs = T.batch_to_arrays(b)
        local_batches.append([np.asarray(a) for a in arrs])
        gb = MH.global_batch(arrs, mesh)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, gb, sub)
        losses.append(float(metrics["loss"]))

    leaves = [MH.fetch_replicated(x) for x in jax.tree.leaves(state["params"])]
    out = {
        "pid": pid,
        "shapes": shapes,
        "loss": float(metrics["loss"]),
        "losses": losses,
        "param_digest": float(sum(np.abs(l).sum() for l in leaves)),
    }
    with open(os.path.join(outdir, f"worker{pid}.json"), "w") as f:
        json.dump(out, f)
    if pid == 0:
        np.savez(os.path.join(outdir, "params0.npz"),
                 **{str(i): l for i, l in enumerate(leaves)})
    np.savez(os.path.join(outdir, f"local_batches{pid}.npz"),
             **{f"b{i}_{j}": a for i, bb in enumerate(local_batches)
                for j, a in enumerate(bb)})
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
