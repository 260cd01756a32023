"""Label-smoothing loss, reference-exact.

Reproduces ``label_smoothing.py:5-30`` + ``SimpleLossCompute``
(``iwslt14_train.py:108-123``): KL divergence (sum reduction) between the
model's log-probs and a smoothed true distribution with
- off-target mass ``smoothing / (size - 2)``,
- ``confidence = 1 - smoothing`` at the target id,
- zero mass on the padding column,
- rows whose *target* is padding zeroed entirely,
normalised by the number of non-pad target tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_true_dist(
    targets: jax.Array, vocab_size: int, pad_id: int, smoothing: float
) -> jax.Array:
    """[N] int targets -> [N, V] smoothed distribution (label_smoothing.py:17-27)."""
    confidence = 1.0 - smoothing
    fill = smoothing / (vocab_size - 2)
    dist = jnp.full(targets.shape + (vocab_size,), fill, dtype=jnp.float32)
    dist = jax.vmap(lambda d, t: d.at[t].set(confidence))(dist, targets)
    dist = dist.at[..., pad_id].set(0.0)
    pad_rows = targets == pad_id
    return jnp.where(pad_rows[..., None], 0.0, dist)


def label_smoothing_loss(
    log_probs: jax.Array,  # [N, V] log-softmax outputs
    targets: jax.Array,    # [N] int ids
    pad_id: int = 2,
    smoothing: float = 0.1,
) -> jax.Array:
    """Sum KLDiv(true_dist || exp(log_probs)) = Σ p (log p − log q), with
    0·log 0 := 0 — torch KLDivLoss(size_average=False) semantics."""
    v = log_probs.shape[-1]
    true_dist = smoothed_true_dist(targets, v, pad_id, smoothing)
    plogp = jnp.where(true_dist > 0, true_dist * jnp.log(jnp.where(true_dist > 0, true_dist, 1.0)), 0.0)
    return jnp.sum(plogp - true_dist * log_probs)


def loss_and_ntokens(
    log_probs: jax.Array,  # [B, T, V]
    tgt_y: jax.Array,      # [B, T]
    pad_id: int = 2,
    smoothing: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """(total KL loss, ntokens). Callers divide: loss/ntokens is the
    training objective (SimpleLossCompute, iwslt14_train.py:113-118)."""
    v = log_probs.shape[-1]
    flat_lp = log_probs.reshape(-1, v)
    flat_t = tgt_y.reshape(-1)
    loss = label_smoothing_loss(flat_lp, flat_t, pad_id, smoothing)
    ntokens = jnp.sum(flat_t != pad_id)
    return loss, ntokens
