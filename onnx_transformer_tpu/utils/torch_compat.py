"""Reference-checkpoint interop: torch state_dict <-> Transformer param tree.

The reference persists models as ``torch.save(model.state_dict())``
(``iwslt14_train.py:436-438``; files like ``checkpoint/iwslt14_model_final.pt``).
These converters map that naming onto our pytree so a reference-trained
checkpoint drops straight into this framework (and vice versa for
cross-validation).  Weight convention: torch Linear stores (out, in); we
store (in, out) — transposed on the way through.

Name map (reference module tree, model.py:15-37):
  encoder.layers.N.self_attn.linears.{0,1,2,3}.{weight,bias} -> self_attn.{q,k,v,o}
  encoder.layers.N.feed_forward.w_{1,2}.{weight,bias}        -> ffn.w{1,2}
  encoder.layers.N.sublayer.{0,1}.norm.{a_2,b_2}             -> ln{0,1}.{scale,bias}
  encoder.norm.{a_2,b_2}                                     -> encoder.ln
  decoder... (src_attn, sublayer.{0,1,2})                    -> src_attn, ln{0,1,2}
  src_embed.0.lut.weight / tgt_embed.0.lut.weight            -> {src,tgt}_embed.lut
  generator.proj.{weight,bias}                               -> generator.{w,b}
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

_ATTN = {"0": "q", "1": "k", "2": "v", "3": "o"}


def from_torch_state_dict(state: Mapping[str, "object"], num_layers: int = 6) -> dict:
    """torch-style state_dict (tensors or arrays) -> Transformer param tree."""

    def arr(key):
        t = state[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    def lin(prefix):
        return {"w": arr(prefix + ".weight").T, "b": arr(prefix + ".bias")}

    def ln(prefix):
        return {"scale": arr(prefix + ".a_2"), "bias": arr(prefix + ".b_2")}

    def attn(prefix):
        return {v: lin(f"{prefix}.linears.{k}") for k, v in _ATTN.items()}

    def ffn(prefix):
        return {"w1": lin(prefix + ".w_1"), "w2": lin(prefix + ".w_2")}

    enc_layers = []
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        enc_layers.append({
            "self_attn": attn(p + ".self_attn"),
            "ffn": ffn(p + ".feed_forward"),
            "ln0": ln(p + ".sublayer.0.norm"),
            "ln1": ln(p + ".sublayer.1.norm"),
        })
    dec_layers = []
    for i in range(num_layers):
        p = f"decoder.layers.{i}"
        dec_layers.append({
            "self_attn": attn(p + ".self_attn"),
            "src_attn": attn(p + ".src_attn"),
            "ffn": ffn(p + ".feed_forward"),
            "ln0": ln(p + ".sublayer.0.norm"),
            "ln1": ln(p + ".sublayer.1.norm"),
            "ln2": ln(p + ".sublayer.2.norm"),
        })
    return {
        "src_embed": {"lut": arr("src_embed.0.lut.weight")},
        "tgt_embed": {"lut": arr("tgt_embed.0.lut.weight")},
        "encoder": {"layers": enc_layers, "ln": ln("encoder.norm")},
        "decoder": {"layers": dec_layers, "ln": ln("decoder.norm")},
        "generator": lin("generator.proj"),
    }


def to_torch_state_dict(params: dict) -> dict[str, np.ndarray]:
    """Transformer param tree -> reference-named flat dict (numpy).
    ``torch.save({k: torch.tensor(v) ...})`` of this loads into the
    reference's ``make_model`` via ``load_state_dict``."""
    out: dict[str, np.ndarray] = {}

    def put_lin(prefix, leaf):
        out[prefix + ".weight"] = np.asarray(leaf["w"]).T
        out[prefix + ".bias"] = np.asarray(leaf["b"])

    def put_ln(prefix, leaf):
        out[prefix + ".a_2"] = np.asarray(leaf["scale"])
        out[prefix + ".b_2"] = np.asarray(leaf["bias"])

    def put_attn(prefix, leaf):
        for k, v in _ATTN.items():
            put_lin(f"{prefix}.linears.{k}", leaf[v])

    for stack in ("encoder", "decoder"):
        for i, lp in enumerate(params[stack]["layers"]):
            p = f"{stack}.layers.{i}"
            put_attn(p + ".self_attn", lp["self_attn"])
            if "src_attn" in lp:
                put_attn(p + ".src_attn", lp["src_attn"])
            put_lin(p + ".feed_forward.w_1", lp["ffn"]["w1"])
            put_lin(p + ".feed_forward.w_2", lp["ffn"]["w2"])
            put_ln(p + ".sublayer.0.norm", lp["ln0"])
            put_ln(p + ".sublayer.1.norm", lp["ln1"])
            if "ln2" in lp:
                put_ln(p + ".sublayer.2.norm", lp["ln2"])
        put_ln(f"{stack}.norm", params[stack]["ln"])
    out["src_embed.0.lut.weight"] = np.asarray(params["src_embed"]["lut"])
    out["tgt_embed.0.lut.weight"] = np.asarray(params["tgt_embed"]["lut"])
    put_lin("generator.proj", params["generator"])
    return out


def load_reference_checkpoint(path: str, num_layers: int = 6) -> dict:
    """Load a reference ``.pt`` checkpoint file into a param tree
    (requires torch for unpickling)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(state, num_layers)
