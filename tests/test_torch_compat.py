"""torch state_dict interop tests: name-map round trip + real torch module
cross-check when torch is available."""

import jax
import numpy as np
import pytest

from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.utils.torch_compat import (
    from_torch_state_dict, to_torch_state_dict)


@pytest.fixture(scope="module")
def small():
    cfg = TransformerConfig(
        src_vocab_size=19, tgt_vocab_size=17, num_layers=2, d_model=16,
        d_ff=32, num_heads=2, dropout=0.0,
    )
    m = Transformer(cfg)
    return m, m.init(jax.random.key(2))


def test_roundtrip_preserves_params(small):
    m, params = small
    state = to_torch_state_dict(params)
    back = from_torch_state_dict(state, num_layers=2)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_state_dict_names_match_reference_scheme(small):
    m, params = small
    state = to_torch_state_dict(params)
    expect = [
        "encoder.layers.0.self_attn.linears.0.weight",
        "encoder.layers.1.feed_forward.w_2.bias",
        "encoder.layers.0.sublayer.1.norm.a_2",
        "decoder.layers.1.src_attn.linears.3.weight",
        "decoder.layers.0.sublayer.2.norm.b_2",
        "encoder.norm.a_2",
        "decoder.norm.b_2",
        "src_embed.0.lut.weight",
        "generator.proj.bias",
    ]
    for k in expect:
        assert k in state, k
    # torch convention: linear weights are (out, in)
    assert state["generator.proj.weight"].shape == (17, 16)


def test_against_real_torch_linear_semantics(small):
    """Push a converted weight through torch.nn.functional.linear and our
    L.linear — outputs must match (validates the transpose convention)."""
    torch = pytest.importorskip("torch")
    from onnx_transformer_tpu.ops import layers as L

    m, params = small
    leaf = params["encoder"]["layers"][0]["self_attn"]["q"]
    state = to_torch_state_dict(params)
    tw = torch.tensor(state["encoder.layers.0.self_attn.linears.0.weight"])
    tb = torch.tensor(state["encoder.layers.0.self_attn.linears.0.bias"])
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    want = torch.nn.functional.linear(torch.tensor(x), tw, tb).numpy()
    got = np.array(L.linear(x, leaf["w"], leaf["b"]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
