"""Fault-injection campaigns as single compiled XLA programs.

The reference's campaign driver splits the ONNX graph into pre/fault/post
subgraphs per target, rebuilds ORT sessions per decode step, and fans
experiments over a process pool (``parallelized_inject_onnx_transformer.py``).
TPU-native redesign: the fault is *parameterised*, not structural —

- every quantized linear carries a fault seam keyed by an integer target id;
- the fault descriptor (target id, fault model, bit position, element/row/
  col, PRNG key, active flag) is a pytree of traced scalars;
- one compiled decode program therefore serves every experiment in the
  campaign: clean decode is ``active=False``; sweeping layers x fault models
  x bits is just re-invoking the same XLA executable with new scalars
  (or vmapping over them).

Fault models (parallelized_inject_onnx_transformer.py:805):
  INPUT / WEIGHT            single int8/int4 bit flip pre-dequant
  INPUT16 / WEIGHT16        16-wide systolic row / column fault
  RANDOM                    random fp32 value at a random output index
  RANDOM_BITFLIP            fp32 bit flip at an output index
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from onnx_transformer_tpu.inject import bits as B
from onnx_transformer_tpu.models.transformer import Transformer, default_linear
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q
from onnx_transformer_tpu.quant.w8a8 import is_quantized_output, quantized_linear_names

FAULT_MODELS = ("INPUT", "WEIGHT", "INPUT16", "WEIGHT16", "RANDOM", "RANDOM_BITFLIP")
_FM = {name: i for i, name in enumerate(FAULT_MODELS)}


def attention_matmul_names(num_layers: int) -> list[str]:
    """Injectable attention bmm targets — the reference's First/SecondMatMul
    JSON descriptors (``input/encoder/matmul_3.json`` names the QK^T node,
    ``matmul_4`` the probs x V node; decoder adds the cross-attn pair)."""
    out = []
    for i in range(num_layers):
        out += [f"encoder.layers.{i}.self_attn.qk_matmul",
                f"encoder.layers.{i}.self_attn.av_matmul"]
    for i in range(num_layers):
        for att in ("self_attn", "src_attn"):
            out += [f"decoder.layers.{i}.{att}.qk_matmul",
                    f"decoder.layers.{i}.{att}.av_matmul"]
    return out


def _ids_from_keys(payload_keys, num_layers: int) -> dict[str, int]:
    names = sorted(payload_keys) + sorted(attention_matmul_names(num_layers))
    return {name: i for i, name in enumerate(names)}


def target_ids(model: Transformer) -> dict[str, int]:
    """Stable name -> integer id for every injectable target: the 96
    quantized linears plus the 36 attention bmms."""
    return _ids_from_keys(quantized_linear_names(model.cfg.num_layers),
                          model.cfg.num_layers)


@dataclass
class FaultSpec:
    """One experiment (one row of the reference's ``input/*.json`` sweep)."""

    target: str
    fault_model: str = "INPUT"
    bit: int = 0
    element: int = 0        # flat index for single-element faults
    row: int = 0            # INPUT16: token row; WEIGHT16: row_start
    col: int = 0            # INPUT16: col_start; WEIGHT16: column
    seed: int = 0
    inject_step: int = 0    # decode step at which the fault is live
                            # (target_inference_number, ...inject_onnx_transformer.py:639)
    ref_name: str = ""      # reference ONNX node name ("MatMul_82") when the
                            # spec was ingested from input/*.json — used by
                            # the reference-format CSV so rows diff directly
                            # against results_fault_injection/results.csv

    def scalars(self, ids: dict[str, int]) -> dict:
        return {
            "target": jnp.int32(ids[self.target]),
            "model": jnp.int32(_FM[self.fault_model]),
            "bit": jnp.int32(self.bit),
            "element": jnp.int32(self.element),
            "row": jnp.int32(self.row),
            "col": jnp.int32(self.col),
            "rng": jax.random.key(self.seed),
        }


def _flip_bit_traced(q: jax.Array, bit, kind: str) -> jax.Array:
    """int bit flip with a *traced* bit position."""
    if kind == "int8":
        u = q.astype(jnp.uint8) ^ (jnp.uint8(1) << bit.astype(jnp.uint8))
        return u.astype(jnp.int8)
    u = (q.astype(jnp.int32) & 0xF) ^ (1 << bit)
    return jnp.where(u > 7, u - 16, u).astype(jnp.int8)


def _flip_f32_traced(x: jax.Array, bit) -> jax.Array:
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    f = jax.lax.bitcast_convert_type(u ^ (jnp.uint32(1) << bit.astype(jnp.uint32)), jnp.float32)
    return jnp.where(jnp.isnan(f), 0.0, f)


def _apply_elem(x, elem, fn):
    """Apply ``fn`` to one flat element, branchlessly: compute the rewrite
    for every element and select by index.  A scatter (`.at[idx].set`) here
    serializes under the campaign's experiment-axis vmap (measured ~30x
    slower dispatches); the flip `fn`s are one-two VPU ops, so flipping
    everything and selecting one is the faster *and* simpler lowering."""
    flat = x.reshape(-1)
    idx = jnp.clip(elem, 0, flat.shape[0] - 1)
    pos = jax.lax.iota(jnp.int32, flat.shape[0])
    return jnp.where(pos == idx, fn(flat), flat).reshape(x.shape)


def make_fault_linear_impl(
    payloads: dict,
    ids: dict[str, int],
    fault: dict,
    active,
    bits: int = 8,
    width: int = 16,
):
    """W8A8 linear impl with the parameterised fault seam.

    ``fault`` is the scalar pytree from FaultSpec.scalars; ``active`` is a
    traced bool — False compiles/executes the identical clean math (the
    flips are data-dependent selects, negligible next to the matmul).
    """
    kind = "int8" if bits == 8 else "int4"

    def lin(name: str, x, w, b, taps=None, inject=None):
        p = payloads.get(name)
        if p is None:
            return default_linear(name, x, w, b, taps, inject)
        hit = active & (fault["target"] == ids[name])
        x = L.tap(name, x, taps, inject)
        sx = Q.act_scale_per_token(x, bits)
        xq = Q.quantize(x, sx, bits)
        wq = p["wq"]

        fm = fault["model"]
        # INPUT: one int bit flip in the activation tensor
        xq = jnp.where(
            hit & (fm == _FM["INPUT"]),
            _apply_elem(xq, fault["element"], lambda v: _flip_bit_traced(v, fault["bit"], kind)),
            xq,
        )
        # INPUT16: row fault across `width` features of one token row
        t_rows = xq.reshape(-1, xq.shape[-1])
        rowmask = jax.lax.broadcasted_iota(jnp.int32, t_rows.shape, 0) == fault["row"]
        colpos = jax.lax.broadcasted_iota(jnp.int32, t_rows.shape, 1)
        colmask = (colpos >= fault["col"]) & (colpos < fault["col"] + width)
        seg = jnp.where(rowmask & colmask, _flip_bit_traced(t_rows, fault["bit"], kind), t_rows)
        xq = jnp.where(hit & (fm == _FM["INPUT16"]), seg.reshape(xq.shape), xq)

        kdim, n = wq.shape
        xq2 = xq.reshape(-1, kdim)
        m = xq2.shape[0]
        y32 = jax.lax.dot_general(
            xq2, wq,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        # WEIGHT faults as bit-exact int32 DELTA corrections after the
        # matmul: a flipped weight element (r, c) contributes
        # xq[:, r] * (flip(w[r,c]) - w[r,c]) to output column c.  This
        # leaves the weight operand untouched, so a vmapped campaign batch
        # shares ONE [K,N] operand instead of materialising per-experiment
        # weight copies every decode step (measured 10x+ experiments/s).
        # Same delta-propagation idea as the reference's perturb_quantizer
        # (inject_utils/layers.py:87-142), in the int domain.
        #
        # WEIGHT: single element at flat index `element` -> (r1, c1)
        r1 = jnp.clip(fault["element"] // n, 0, kdim - 1)
        c1 = jnp.clip(fault["element"] % n, 0, n - 1)
        w1 = jax.lax.dynamic_slice(wq, (r1, c1), (1, 1))           # [1,1]
        d1 = (_flip_bit_traced(w1, fault["bit"], kind).astype(jnp.int32)
              - w1.astype(jnp.int32))                              # [1,1]
        x1 = jax.lax.dynamic_slice(xq2, (0, r1), (m, 1)).astype(jnp.int32)
        hit_w = hit & (fm == _FM["WEIGHT"])
        col1 = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == c1)
        y32 = y32 + jnp.where(hit_w, x1 * d1[0, 0], 0) * col1
        # WEIGHT16: `width` rows starting at `row`, one out-channel `col`.
        # The slice start is clamped in-bounds, but the delta is masked to
        # rows >= the *requested* start so an overrunning segment truncates
        # (reference semantics: rows [row, kdim)) instead of shifting whole.
        wseg_rows = min(width, kdim)
        r0 = jnp.clip(fault["row"], 0, kdim - wseg_rows)
        c2 = jnp.clip(fault["col"], 0, n - 1)
        wseg = jax.lax.dynamic_slice(wq, (r0, c2), (wseg_rows, 1))
        dseg = (_flip_bit_traced(wseg, fault["bit"], kind).astype(jnp.int32)
                - wseg.astype(jnp.int32))                          # [16,1]
        seg_rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (wseg_rows, 1), 0)
        dseg = jnp.where(
            (seg_rows >= fault["row"]) & (fault["row"] < kdim), dseg, 0)
        xseg = jax.lax.dynamic_slice(
            xq2, (0, r0), (m, wseg_rows)).astype(jnp.int32)
        d16 = jax.lax.dot_general(
            xseg, dseg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                      # [M,1]
        hit_w16 = hit & (fm == _FM["WEIGHT16"])
        col2 = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == c2)
        y32 = y32 + jnp.where(hit_w16, d16, 0) * col2

        lead = xq.shape[:-1]
        y = y32.astype(jnp.float32) * (sx.reshape(-1, 1) * p["sw"][None, :])
        y = (y + p["b"]).reshape(*lead, -1)

        # output-domain faults
        y = jnp.where(
            hit & (fm == _FM["RANDOM"]),
            B.set_random_value(y, fault["rng"]),
            y,
        )
        y = jnp.where(
            hit & (fm == _FM["RANDOM_BITFLIP"]),
            _apply_elem(y, fault["element"], lambda v: _flip_f32_traced(v, fault["bit"])),
            y,
        )
        y = L.tap(f"{name}.out", y, taps, inject)
        if is_quantized_output(name):
            y = Q.fake_quant_act_per_token(y, bits)
            # attention bmm operand seam: q/k/v int8 representations
            y = L.tap(f"{name}.out_q", y, taps, inject)
        return y

    return lin


def _flip_int_grid(x, fault, kind: str, scale=None, bits: int = 8, wide: bool = False,
                   width: int = 16):
    """Int-domain bit flip of a fake-quantized fp tensor: recover the int
    representation on its grid, flip, dequantise (perturb_quantizer
    semantics, inject_utils/layers.py:87-142).  ``scale=None`` recomputes the
    per-token absmax scale — exact for absmax-quantized tensors (their max
    element sits at +-qmax, so the recomputed scale equals the original)."""
    s = Q.act_scale_per_token(x, bits) if scale is None else scale
    q = jnp.round(x / s).astype(jnp.int8)
    if wide:
        rows = q.reshape(-1, q.shape[-1])
        rowmask = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) == fault["row"]
        colpos = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        colmask = (colpos >= fault["col"]) & (colpos < fault["col"] + width)
        q = jnp.where(rowmask & colmask,
                      _flip_bit_traced(rows, fault["bit"], kind), rows).reshape(q.shape)
    else:
        q = _apply_elem(q, fault["element"],
                        lambda v: _flip_bit_traced(v, fault["bit"], kind))
    return q.astype(jnp.float32) * s


def make_fault_inject(
    num_layers: int,
    ids: dict[str, int],
    fault: dict,
    active,
    bits: int = 8,
) -> dict:
    """Inject dict instrumenting the attention bmm operand/output taps.

    Fault-model -> operand routing per matmul (matching which ONNX tensor the
    reference JSON names as input/weight of the target node):

      qk_matmul: INPUT(16) -> q int8 (the q-projection's quantized output),
                 WEIGHT(16) -> k int8, RANDOM* -> scores fp32 output.
      av_matmul: INPUT(16) -> probs on the 1/127 grid, WEIGHT(16) -> v int8,
                 RANDOM* -> context fp32 output.

    Every tap routes through a parameterised hit test, so ONE compiled
    program serves all targets (clean when ``active`` is False).
    """
    kind = "int8" if bits == 8 else "int4"
    fm = fault["model"]
    inject: dict = {}

    def op_fault(x, tid, models, scale=None):
        hit = active & (fault["target"] == tid)
        x = jnp.where(
            hit & (fm == _FM[models[0]]),
            _flip_int_grid(x, fault, kind, scale, bits),
            x,
        )
        return jnp.where(
            hit & (fm == _FM[models[1]]),
            _flip_int_grid(x, fault, kind, scale, bits, wide=True),
            x,
        )

    def out_fault(x, tid):
        hit = active & (fault["target"] == tid)
        x = jnp.where(hit & (fm == _FM["RANDOM"]),
                      B.set_random_value(x, fault["rng"]), x)
        return jnp.where(
            hit & (fm == _FM["RANDOM_BITFLIP"]),
            _apply_elem(x, fault["element"],
                        lambda v: _flip_f32_traced(v, fault["bit"])),
            x,
        )

    attns = [f"encoder.layers.{i}.self_attn" for i in range(num_layers)]
    attns += [f"decoder.layers.{i}.{a}" for i in range(num_layers)
              for a in ("self_attn", "src_attn")]
    for nm in attns:
        qk, av = ids[f"{nm}.qk_matmul"], ids[f"{nm}.av_matmul"]
        inject[f"{nm}.linears.0.out_q"] = partial(
            op_fault, tid=qk, models=("INPUT", "INPUT16"))
        inject[f"{nm}.linears.1.out_q"] = partial(
            op_fault, tid=qk, models=("WEIGHT", "WEIGHT16"))
        inject[f"{nm}.linears.2.out_q"] = partial(
            op_fault, tid=av, models=("WEIGHT", "WEIGHT16"))
        inject[f"{nm}.probs"] = partial(
            op_fault, tid=av, models=("INPUT", "INPUT16"),
            scale=jnp.float32(1.0 / 127.0))
        inject[f"{nm}.scores"] = partial(out_fault, tid=qk)
        inject[f"{nm}.context"] = partial(out_fault, tid=av)
    return inject


@partial(jax.jit, static_argnums=(0, 1, 5, 8))
def faulty_greedy_decode(
    model: Transformer,
    payload_keys: tuple,     # static: sorted payload names (for cache keying)
    params,
    payloads,
    fault,
    max_len: int,
    src,
    src_mask,
    bits: int = 8,
):
    """One compiled program: greedy decode with the parameterised fault.

    Encoder-target faults fire during encode; decoder-target faults fire at
    decode step ``fault['step']``.  ``fault['enabled']`` False == golden run.
    """
    ids = _ids_from_keys(payload_keys, model.cfg.num_layers)
    enc_active = fault["enabled"] & fault["is_encoder"]

    lin_enc = make_fault_linear_impl(payloads, ids, fault, enc_active, bits)
    inj_enc = make_fault_inject(model.cfg.num_layers, ids, fault, enc_active, bits)
    memory = model.encode(params, src, src_mask, lin=lin_enc, inject=inj_enc)
    # int8 KV cache (lossless under W8A8 quantize_output; the serving
    # config) — 4x less cache HBM traffic per vmapped experiment than fp32,
    # which dominates campaign dispatch time at high fan-out
    cache = model.init_cache(params, memory, max_len, lin=make_fault_linear_impl(
        payloads, ids, fault, jnp.bool_(False), bits), cache_dtype="int8")

    cfg = model.cfg
    b = src.shape[0]
    ys = jnp.full((b, max_len), cfg.pad_id, dtype=jnp.int32)
    ys = ys.at[:, 0].set(cfg.bos_id)
    finished = jnp.zeros((b,), bool)

    def step(carry, i):
        cache, ys, finished, last = carry
        dec_active = fault["enabled"] & (~fault["is_encoder"]) & (i == fault["step"])
        lin_i = make_fault_linear_impl(payloads, ids, fault, dec_active, bits)
        inj_i = make_fault_inject(model.cfg.num_layers, ids, fault, dec_active, bits)
        logp, cache = model.decode_step(params, cache, last[:, None], i, src_mask,
                                        lin=lin_i, inject=inj_i)
        nxt = jnp.argmax(logp, -1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.pad_id, nxt)
        finished = finished | (nxt == cfg.eos_id)
        ys = ys.at[:, i + 1].set(nxt)
        return (cache, ys, finished, nxt), None

    (cache, ys, finished, _), _ = jax.lax.scan(
        step, (cache, ys, finished, ys[:, 0]), jnp.arange(max_len - 1)
    )
    return ys


@partial(jax.jit, static_argnums=(0, 1, 5, 8))
def faulty_greedy_decode_batch(
    model: Transformer,
    payload_keys: tuple,
    params,
    payloads,
    faults,          # stacked fault pytree with a leading experiment axis
    max_len: int,
    src,
    src_mask,
    bits: int = 8,
):
    """vmap fan-out: E experiments in one dispatch -> ids [E, B, max_len].

    The TPU-native replacement for the reference's multiprocessing.Pool
    fan-out (parallelized_inject_onnx_transformer.py:493,796): the fault
    scalars gain a leading axis and the whole campaign batch rides one XLA
    program — on-device parallelism instead of process parallelism.
    """
    return jax.vmap(
        lambda f: faulty_greedy_decode(model, payload_keys, params, payloads,
                                       f, max_len, src, src_mask, bits)
    )(faults)


# ------------------------------------------------ reference JSON descriptors

def reference_matmul_to_target(module: str, target_layer: str) -> str:
    """Map a reference ``input/*.json`` descriptor to our target name.

    The reference names ONNX MatMul nodes in topological order
    (``input/encoder/matmul_3.json:1-9``): encoder layer i owns nodes
    3+8i (QK^T), 4+8i (probs x V), 6+8i (FFN w1), 7+8i (FFN w2); decoder
    layer i owns 15+12i/16+12i (self-attn pair), 19+12i/20+12i (cross-attn
    pair), 22+12i/23+12i (FFN).  The ``module`` tag gives the kind; the
    index arithmetic gives the layer and self-vs-cross.
    """
    n = int(target_layer.rsplit("_", 1)[1])
    kind_by_tag = {"FirstFC": "feed_forward.w_1", "SecondFC": "feed_forward.w_2",
                   "FirstMatMul": "qk_matmul", "SecondMatMul": "av_matmul"}
    side, tag = module.split("/")
    kind = kind_by_tag[tag]
    if side == "Encoder":
        i = (n - 3) // 8
        if "matmul" in kind:
            kind = f"self_attn.{kind}"
        return f"encoder.layers.{i}.{kind}"
    i, o = divmod(n - 15, 12)
    if "matmul" in kind:
        attn = "self_attn" if o in (0, 1) else "src_attn"
        kind = f"{attn}.{kind}"
    return f"decoder.layers.{i}.{kind}"


def specs_from_reference_jsons(
    path,
    fault_models: Sequence[str] = FAULT_MODELS,
    bit_positions: Sequence[int] = range(8),
    inject_step: int = 0,
    seed: int = 0,
) -> list[FaultSpec]:
    """Ingest reference campaign descriptors: a JSON file, a directory of
    them (``input/encoder``), or a list of paths.  Expands each target over
    ``fault_models x bit_positions`` exactly like the reference driver
    (parallelized_inject_onnx_transformer.py:803-859)."""
    import json

    def expand(p):
        p = str(p)
        if os.path.isdir(p):
            return sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".json"))
        return [p]

    entries = list(path) if isinstance(path, (list, tuple)) else [path]
    files = [f for e in entries for f in expand(e)]
    specs = []
    for i, fp in enumerate(files):
        with open(fp) as f:
            d = json.load(f)
        target = reference_matmul_to_target(d["module"], d["target_layer"])
        for fm in fault_models:
            for bit in bit_positions:
                specs.append(FaultSpec(
                    target=target, fault_model=fm, bit=bit,
                    seed=seed + i, inject_step=inject_step,
                    ref_name=d["target_layer"]))
    return specs


def _stack_fault_trees(specs: Sequence[Optional[FaultSpec]],
                       ids: dict[str, int]) -> dict:
    """Stacked fault pytree for a vmapped group, built host-side in numpy
    with ONE device transfer per field.  (Building per-spec jnp scalars
    costs a tunnel round-trip each — ~10 transfers x group size per
    dispatch dominated campaign wall-clock.)"""
    def field(f, default=0):
        return np.array([getattr(s, f) if s is not None else default
                         for s in specs], np.int32)

    tgt = np.array([ids[s.target] if s is not None else 0 for s in specs], np.int32)
    fmodel = np.array([_FM[s.fault_model] if s is not None else 0 for s in specs], np.int32)
    seeds = field("seed")
    return {
        "target": jnp.asarray(tgt),
        "model": jnp.asarray(fmodel),
        "bit": jnp.asarray(field("bit")),
        "element": jnp.asarray(field("element")),
        "row": jnp.asarray(field("row")),
        "col": jnp.asarray(field("col")),
        "rng": jax.vmap(jax.random.key)(jnp.asarray(seeds)),
        "enabled": jnp.asarray(np.array([s is not None for s in specs])),
        "is_encoder": jnp.asarray(np.array(
            [s is not None and s.target.startswith("encoder") for s in specs])),
        "step": jnp.asarray(field("inject_step")),
    }


def _fault_tree(spec: Optional[FaultSpec], ids: dict[str, int]) -> dict:
    if spec is None:
        zero = {
            "target": jnp.int32(0), "model": jnp.int32(0), "bit": jnp.int32(0),
            "element": jnp.int32(0), "row": jnp.int32(0), "col": jnp.int32(0),
            "rng": jax.random.key(0),
        }
        return {**zero, "enabled": jnp.bool_(False), "is_encoder": jnp.bool_(False),
                "step": jnp.int32(0)}
    t = spec.scalars(ids)
    return {**t, "enabled": jnp.bool_(True),
            "is_encoder": jnp.bool_(spec.target.startswith("encoder")),
            "step": jnp.int32(spec.inject_step)}


@dataclass
class CampaignResult:
    rows: list = field(default_factory=list)  # dicts: layer, golden/faulty bleu, ...


def run_campaign(
    model: Transformer,
    params,
    payloads: dict,
    specs: Sequence[FaultSpec],
    src: np.ndarray,
    src_mask: np.ndarray,
    references: Sequence[Sequence[str]],   # BPE token refs per sentence
    vocab_tgt,
    max_len: int = 72,
    bits: int = 8,
    csv_path: Optional[str] = None,
    log_fn=None,
    fanout: int = 16,
    csv_format: str = "full",
) -> CampaignResult:
    """Golden decode once, then faulty decodes in vmapped groups of
    ``fanout`` — the whole sweep reuses ONE compiled executable.

    Default from the round-4 on-chip sweep (252 specs x 8 sentences):
    fanout 8 -> 1.87, 16 -> 2.33, 32 -> 2.11 steady exp/s.  Note: results
    are bit-deterministic at fixed fanout, but CHANGING fanout can flip a
    few faulty trajectories (different vmap widths compile to different
    fusions; ulp-level score changes cascade through greedy argmax on
    perturbed decodes) — the same sensitivity as the reference's dual
    qonnx-vs-ORT executors.

    CSV schema (``csv_format="full"``, default):
    ``layer,golden_bleu,faulty_bleu,bit,fault_model`` with a header row —
    a *superset* of the reference's results.csv.  ``csv_format="reference"``
    instead writes the reference's own 3-column headerless rows
    ``node_name,golden_bleu,faulty_bleu`` (node name = the ONNX MatMul name
    from the ingested descriptor when available, else our target name) so
    ref-side tooling can diff campaigns directly against
    ``results_fault_injection/results.csv``
    (``parallelized_inject_onnx_transformer.py:405-406``)."""
    from onnx_transformer_tpu.evaluation.bleu import sentence_bleu
    from onnx_transformer_tpu.serving.decode import ids_to_tokens

    ids = _ids_from_keys(sorted(payloads), model.cfg.num_layers)
    keys = tuple(sorted(payloads))
    src = jnp.asarray(src)
    src_mask = jnp.asarray(src_mask)

    golden = np.array(
        faulty_greedy_decode(model, keys, params, payloads,
                             _fault_tree(None, ids), max_len, src, src_mask, bits)
    )
    golden_toks = ids_to_tokens(golden, vocab_tgt)
    golden_bleus = [
        sentence_bleu([list(r)], h, smoothing="method4")
        for r, h in zip(references, golden_toks)
    ]

    result = CampaignResult()
    writer = None
    if csv_path:
        assert csv_format in ("full", "reference"), csv_format
        os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
        f = open(csv_path, "w", newline="")
        writer = csv.writer(f)
        if csv_format == "full":
            writer.writerow(["layer", "golden_bleu", "faulty_bleu", "bit",
                             "fault_model"])

    specs = list(specs)
    for start in range(0, len(specs), fanout):
        group = specs[start : start + fanout]
        # pad the last group with disabled (golden) specs: constant E keeps
        # one compiled executable for the whole sweep
        padded = group + [None] * (fanout - len(group))
        stacked = _stack_fault_trees(padded, ids)
        outs = np.array(
            faulty_greedy_decode_batch(model, keys, params, payloads,
                                       stacked, max_len, src, src_mask, bits)
        )
        for spec, faulty in zip(group, outs):
            faulty_toks = ids_to_tokens(faulty, vocab_tgt)
            for gi, (r, h) in enumerate(zip(references, faulty_toks)):
                # most faults are benign: identical token rows score the
                # golden BLEU exactly — skip the (host-side, python) n-gram
                # work that otherwise dominates campaign wall-clock
                if np.array_equal(faulty[gi], golden[gi]):
                    fb = golden_bleus[gi]
                else:
                    fb = sentence_bleu([list(r)], h, smoothing="method4")
                row = {
                    "layer": spec.target,
                    "golden_bleu": golden_bleus[gi],
                    "faulty_bleu": fb,
                    "bit": spec.bit,
                    "fault_model": spec.fault_model,
                    "tokens_changed": B.count_mismatches(golden[gi], faulty[gi]),
                }
                result.rows.append(row)
                if writer:
                    if csv_format == "reference":
                        writer.writerow([spec.ref_name or spec.target,
                                         row["golden_bleu"],
                                         row["faulty_bleu"]])
                    else:
                        writer.writerow([row["layer"], row["golden_bleu"],
                                         row["faulty_bleu"], row["bit"],
                                         row["fault_model"]])
        if log_fn:
            import time as _time

            if not hasattr(result, "_t0"):
                result._t0 = _time.time()
                result._n0 = start + len(group)  # first group incl. trace/compile
            done_n = start + len(group)
            dt = _time.time() - result._t0
            rate = ((done_n - result._n0) / dt) if dt > 0 and done_n > result._n0 else 0.0
            log_fn(f"{len(result.rows)} rows / {done_n} specs done "
                   f"(steady {rate:.1f} exp/s)")

    if writer:
        f.close()
    return result
