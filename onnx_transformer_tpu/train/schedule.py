"""Noam LR schedule (noamopt.py:22-28, iwslt14_train.py:44-53).

rate(step) = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5),
with step 0 treated as 1 (the reference's LambdaLR guard).
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(d_model: int, factor: float = 1.0, warmup: int = 3000):
    def rate(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * (
            d_model ** (-0.5)
            * jnp.minimum(step ** (-0.5), step * warmup ** (-1.5))
        )

    return rate
