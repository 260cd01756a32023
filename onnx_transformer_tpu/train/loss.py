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
import numpy as np


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
    0·log 0 := 0 — torch KLDivLoss(size_average=False) semantics.

    Computed in closed form per row rather than materialising the [N, V]
    true-dist.  Besides skipping a scatter and an N*V temp, this matters for
    *accuracy*: a flat f32 reduction over N*V tiny fill-mass terms underflows
    against the running sum on TPU (observed: init loss 5.85 instead of 7.31
    at N*V ≈ 40M), whereas the per-row sums here stay well inside f32 range.

      KL_row = [c·log c + (V-2)·f·log f]                       (Σ p log p)
             − [c·log q(t) + f·(Σ_j log q_j − log q(t) − log q(pad))]
      with c = 1 − smoothing, f = smoothing / (V - 2);
      rows whose target is pad contribute 0 (label_smoothing.py:23-26).
    """
    v = log_probs.shape[-1]
    confidence = 1.0 - smoothing
    fill = smoothing / (v - 2)
    # entropy term Σ p log p (constant per non-pad row)
    plogp = confidence * np.log(confidence) + (v - 2) * fill * np.log(fill)
    logq_t = jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    logq_sum = jnp.sum(log_probs, axis=-1)
    logq_pad = log_probs[:, pad_id]
    cross = confidence * logq_t + fill * (logq_sum - logq_t - logq_pad)
    kl_row = plogp - cross
    return jnp.sum(jnp.where(targets == pad_id, 0.0, kl_row))


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
