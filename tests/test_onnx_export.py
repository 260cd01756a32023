"""QDQ ONNX export round-trip: emit the protobuf, re-parse the BYTES, and
execute the parsed graph with a numpy node interpreter against the JAX
forward — the reference's dual-executor oracle (qonnx vs onnxruntime,
SURVEY.md §4) with our wire writer/reader standing in for onnx/ORT (absent
from this image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.export import onnx_proto as P
from onnx_transformer_tpu.export.onnx_qdq import export_qdq_onnx
from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q
from onnx_transformer_tpu.quant import w8a8 as W


def run_graph(g: P.PGraph, feeds: dict) -> dict:
    """Numpy node-by-node interpreter for the op set we emit — the same
    single-node-execution strategy as the reference's custom interpreter
    (onnx_optimized_inference.py:18-212), minus the graph surgery."""
    env = dict(g.initializers)
    env.update(feeds)

    def axes_of(node):
        return tuple(node.attrs.get("axes", [-1]))

    for node in g.nodes:
        i = [env[x] for x in node.inputs]
        op = node.op_type
        if op == "MatMul":
            o = i[0].astype(np.float32) @ i[1].astype(np.float32)
        elif op == "Add":
            o = i[0] + i[1]
        elif op == "Sub":
            o = i[0] - i[1]
        elif op == "Mul":
            o = i[0] * i[1]
        elif op == "Div":
            o = i[0] / i[1]
        elif op == "Sqrt":
            o = np.sqrt(i[0])
        elif op == "Relu":
            o = np.maximum(i[0], 0)
        elif op == "Round":
            # ONNX Round is round-half-to-even, like np.round
            o = np.round(i[0])
        elif op == "Identity":
            o = i[0]
        elif op == "ReduceMean":
            o = np.mean(i[0], axis=axes_of(node),
                        keepdims=bool(node.attrs.get("keepdims", 1)))
        elif op == "Softmax":
            ax = node.attrs.get("axis", -1)
            m = i[0] - np.max(i[0], axis=ax, keepdims=True)
            e = np.exp(m)
            o = e / np.sum(e, axis=ax, keepdims=True)
        elif op == "Transpose":
            o = np.transpose(i[0], node.attrs["perm"])
        elif op == "Reshape":
            shape = [i[0].shape[k] if s == 0 else int(s)
                     for k, s in enumerate(i[1])]
            o = i[0].reshape(shape)
        elif op == "Where":
            o = np.where(i[0], i[1], i[2])
        elif op == "DequantizeLinear":
            axis = node.attrs.get("axis", 1)
            scale = i[1]
            shape = [1] * i[0].ndim
            if scale.ndim:
                shape[axis] = scale.shape[0]
            o = (i[0].astype(np.float32) - i[2].astype(np.float32).reshape(
                shape)) * scale.reshape(shape)
        elif op == "QuantizeLinear":
            axis = node.attrs.get("axis", 1)
            scale = i[1]
            shape = [1] * i[0].ndim
            if scale.ndim:
                shape[axis] = scale.shape[0]
            o = np.clip(
                np.round(i[0] / scale.reshape(shape))
                + i[2].astype(np.float32).reshape(shape),
                -128, 127).astype(np.int8)
        else:
            raise NotImplementedError(op)
        env[node.outputs[0]] = np.asarray(o, np.float32) \
            if np.asarray(o).dtype == np.float64 else np.asarray(o)
    return {name: env[name] for name in g.outputs}


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = TransformerConfig(src_vocab_size=37, tgt_vocab_size=31,
                            num_layers=2, d_model=32, d_ff=64, num_heads=4,
                            dropout=0.0)
    m = Transformer(cfg)
    params = m.init(jax.random.key(9))
    payloads = W.quantize_model_params(m, params)
    out = str(tmp_path_factory.mktemp("onnx"))
    paths = export_qdq_onnx(m, params, payloads, out)
    return m, params, payloads, paths


def _wqdq_lin(payloads):
    """JAX reference arithmetic for the exported graph: weight-QDQ only
    (dequantized int8 weights, fp activations, prob quant in the model)."""
    from onnx_transformer_tpu.models.transformer import default_linear

    def lin(name, x, w, b, taps=None, inject=None):
        p = payloads.get(name)
        if p is None:
            return default_linear(name, x, w, b, taps, inject)
        return L.linear(x, Q.dequantize(p["wq"], p["sw"][None, :]), p["b"])

    return lin


def test_encoder_graph_matches_jax(exported):
    m, params, payloads, paths = exported
    with open(paths["encoder"], "rb") as f:
        g = P.parse_model(f.read())
    assert g.inputs == ["global_in", "global_in_1"]
    rng = np.random.default_rng(0)
    b, s, d = 3, 7, m.cfg.d_model
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    mask = np.ones((b, 1, 1, s), bool)
    mask[1, :, :, -2:] = False
    out = run_graph(g, {"global_in": x, "global_in_1": mask})["global_out"]

    # JAX forward from the same embedded input (skip embed+PE: the graph
    # starts post-embedding, like the reference's exported encoder)
    lin = _wqdq_lin(payloads)
    rngs = None
    h = jnp.asarray(x)
    mask_j = jnp.asarray(mask[:, 0])      # [B,1,S] -> encode re-expands

    memory = _encode_from_embedded(m, params, h, mask_j, lin)
    np.testing.assert_allclose(out, np.array(memory), atol=2e-4, rtol=1e-4)


def _encode_from_embedded(m, params, x, src_mask, lin):
    """model.encode minus the embedding (graph input is already embedded)."""
    from onnx_transformer_tpu.models.transformer import _RngSource

    rngs = _RngSource(None)
    mask = src_mask[:, None, :, :]
    for i, lp in enumerate(params["encoder"]["layers"]):
        nm = f"encoder.layers.{i}"
        x = m._sublayer(
            x, lp["ln0"],
            lambda h: m._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                             mask, rngs, False, None, None, lin),
            rngs, False)
        x = m._sublayer(
            x, lp["ln1"],
            lambda h: m._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, False,
                             None, None, lin),
            rngs, False)
    ln_f = params["encoder"]["ln"]
    return L.layer_norm(x, ln_f["scale"], ln_f["bias"])


def test_decoder_graph_matches_jax(exported):
    m, params, payloads, paths = exported
    with open(paths["decoder"], "rb") as f:
        g = P.parse_model(f.read())
    rng = np.random.default_rng(1)
    b, s, t, d = 2, 6, 5, m.cfg.d_model
    ys = rng.normal(size=(b, t, d)).astype(np.float32)
    memory = rng.normal(size=(b, s, d)).astype(np.float32)
    smask = np.ones((b, 1, 1, s), bool)
    tmask = np.tril(np.ones((t, t), bool))[None, None].repeat(b, 0)
    out = run_graph(g, {"ys_embed": ys, "memory": memory,
                        "src_mask": smask, "tgt_mask": tmask})["global_out"]

    from onnx_transformer_tpu.models.transformer import _RngSource

    lin = _wqdq_lin(payloads)
    rngs = _RngSource(None)
    x = jnp.asarray(ys)
    mem = jnp.asarray(memory)
    sm = jnp.asarray(smask[:, 0])[:, None]          # [B,1,1,S]
    tm = jnp.asarray(tmask)
    for i, lp in enumerate(params["decoder"]["layers"]):
        nm = f"decoder.layers.{i}"
        x = m._sublayer(
            x, lp["ln0"],
            lambda h: m._mha(lp["self_attn"], f"{nm}.self_attn", h, h, h,
                             tm, rngs, False, None, None, lin),
            rngs, False)
        x = m._sublayer(
            x, lp["ln1"],
            lambda h: m._mha(lp["src_attn"], f"{nm}.src_attn", h, mem, mem,
                             sm, rngs, False, None, None, lin),
            rngs, False)
        x = m._sublayer(
            x, lp["ln2"],
            lambda h: m._ffn(lp["ffn"], f"{nm}.feed_forward", h, rngs, False,
                             None, None, lin),
            rngs, False)
    ln_f = params["decoder"]["ln"]
    ref = L.layer_norm(x, ln_f["scale"], ln_f["bias"])
    np.testing.assert_allclose(out, np.array(ref), atol=2e-4, rtol=1e-4)


def test_decoder_graph_dynamic_axes(exported):
    """ONE emitted decoder graph executes at two different target lengths
    AND batch sizes — the reference's dynamic-axes decoder export
    capability (encoder_decoder.py:41-52, dim_param on the tgt dims)."""
    m, params, payloads, paths = exported
    with open(paths["decoder"], "rb") as f:
        raw = f.read()
    # the wire bytes must carry symbolic dim_params, not baked sizes
    assert b"tgt" in raw and b"batch" in raw
    g = P.parse_model(raw)
    rng = np.random.default_rng(3)
    d = m.cfg.d_model
    outs = []
    for b, s, t in ((2, 6, 5), (3, 4, 9)):
        ys = rng.normal(size=(b, t, d)).astype(np.float32)
        memory = rng.normal(size=(b, s, d)).astype(np.float32)
        smask = np.ones((b, 1, 1, s), bool)
        tmask = np.tril(np.ones((t, t), bool))[None, None].repeat(b, 0)
        out = run_graph(g, {"ys_embed": ys, "memory": memory,
                            "src_mask": smask,
                            "tgt_mask": tmask})["global_out"]
        assert out.shape == (b, t, d)
        outs.append(out)
    # same graph, different shapes, both finite
    assert all(np.isfinite(o).all() for o in outs)


def test_qcdq_activation_mode_matches_jax(exported, tmp_path):
    """Opt-in static-activation QCDQ: QuantizeLinear/DequantizeLinear
    pairs with calibrated per-tensor scales in front of every quantized
    MatMul (the reference's Brevitas QCDQ analogue) must match the JAX
    arithmetic of the same static fake-quant chain."""
    m, params, payloads, _ = exported
    rng = np.random.default_rng(7)
    act_scales = {name: np.abs(rng.normal(
        1.0, 0.2, np.asarray(p["wq"]).shape[0])).astype(np.float32)
        for name, p in payloads.items()}
    paths = export_qdq_onnx(m, params, payloads, str(tmp_path / "qcdq"),
                            act_scales=act_scales)
    with open(paths["encoder"], "rb") as f:
        raw = f.read()
    g = P.parse_model(raw)
    n_q = sum(1 for n in g.nodes if n.op_type == "QuantizeLinear")
    n_lin = sum(1 for name in payloads if name.startswith("encoder."))
    assert n_q == n_lin     # one activation QCDQ pair per quantized linear

    b, s, d = 2, 5, m.cfg.d_model
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    mask = np.ones((b, 1, 1, s), bool)
    out = run_graph(g, {"global_in": x, "global_in_1": mask})["global_out"]

    from onnx_transformer_tpu.models.transformer import default_linear

    def lin(name, xx, w, bb, taps=None, inject=None):
        p = payloads.get(name)
        if p is None:
            return default_linear(name, xx, w, bb, taps, inject)
        sa = max(float(np.max(act_scales[name]) / 127.0), 1e-5)
        xq = jnp.clip(jnp.round(xx / sa), -128, 127) * sa
        return L.linear(xq, Q.dequantize(p["wq"], p["sw"][None, :]), p["b"])

    ref = _encode_from_embedded(m, params, jnp.asarray(x),
                                jnp.asarray(mask[:, 0]), lin)
    np.testing.assert_allclose(out, np.array(ref), atol=2e-4, rtol=1e-4)


def test_wire_format_roundtrip_tensor():
    arr = np.arange(24, dtype=np.int8).reshape(4, 6) - 7
    name, back = P.parse_tensor(P.tensor_proto("w", arr))
    assert name == "w"
    np.testing.assert_array_equal(back, arr)
    f = np.linspace(-1, 1, 10).astype(np.float32)
    _, back = P.parse_tensor(P.tensor_proto("f", f))
    np.testing.assert_array_equal(back, f)
