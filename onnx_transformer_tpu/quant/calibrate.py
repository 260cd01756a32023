"""Activation-scale calibration.

TPU-native replacement for the reference's forward-hook pass
(``get_quantized_scales.py:125-171``): instead of registering hooks on
nn.Linear modules, run the jitted forward with taps collecting every linear
*input*, reduce per-channel absmax on device, and keep a running max across
batches.  Like the reference, the generator is not calibrated because
calibration drives ``model.forward`` (hidden states), which never invokes it
(``get_quantized_scales.py:166``) — hence exactly 96 tensors at N=6.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu.models.transformer import Transformer


def _linear_input_names(model: Transformer) -> list[str]:
    names = []
    n = model.cfg.num_layers
    for i in range(n):
        for j in range(4):
            names.append(f"encoder.layers.{i}.self_attn.linears.{j}")
        names.append(f"encoder.layers.{i}.feed_forward.w_1")
        names.append(f"encoder.layers.{i}.feed_forward.w_2")
    for i in range(n):
        for att in ("self_attn", "src_attn"):
            for j in range(4):
                names.append(f"decoder.layers.{i}.{att}.linears.{j}")
        names.append(f"decoder.layers.{i}.feed_forward.w_1")
        names.append(f"decoder.layers.{i}.feed_forward.w_2")
    return names


def calibration_step(model: Transformer, params, src, tgt_in, src_mask, tgt_mask):
    """One batch -> dict name -> per-channel absmax [d] (on device)."""
    taps: dict = {}
    model.forward(params, src, tgt_in, src_mask, tgt_mask, taps=taps)
    out = {}
    for name in _linear_input_names(model):
        x = taps[name]
        out[name] = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)
    return out


def get_act_scales(
    model: Transformer,
    params,
    batches: Iterable,
    num_samples: int = 512,
    jit: bool = True,
) -> dict[str, np.ndarray]:
    """Per-channel absmax of every linear input over <= num_samples batches
    (running max across batches, get_quantized_scales.py:129-136).

    The running max lives on device (one jitted update per batch, a single
    host fetch at the end) — per-batch transfers of 96 tensors over a slow
    device link would otherwise dominate."""
    if jit:
        @jax.jit
        def update(acc, p, src, tgt_in, src_mask, tgt_mask):
            batch_scales = calibration_step(model, p, src, tgt_in, src_mask, tgt_mask)
            if acc is None:
                return batch_scales
            return {k: jnp.maximum(acc[k], v) for k, v in batch_scales.items()}

        acc = None
        for count, b in enumerate(batches):
            if count > num_samples:
                break
            if acc is None:
                # first call outside the jitted accumulator (acc=None is not
                # a valid traced arg)
                acc = jax.jit(partial(calibration_step, model))(
                    params, b.src, b.tgt_in, b.src_mask, b.tgt_mask)
            else:
                acc = update(acc, params, b.src, b.tgt_in, b.src_mask, b.tgt_mask)
        return {} if acc is None else {k: np.asarray(v) for k, v in acc.items()}

    scales: dict[str, np.ndarray] = {}
    for count, b in enumerate(batches):
        if count > num_samples:
            break
        batch_scales = calibration_step(model, params, b.src, b.tgt_in, b.src_mask, b.tgt_mask)
        for k, v in batch_scales.items():
            v = np.asarray(v)
            scales[k] = np.maximum(scales[k], v) if k in scales else v
    return scales


def save_scales(scales: dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **scales)
