"""Attention library parity vs the reference torch implementation (P15)."""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

import jax
import jax.numpy as jnp

from hello_tpu.nn.layers import (HelloEncoder, MultiheadAttention,
                                 positional_encoding)


@requires_reference
def test_positional_encoding_matches_reference():
    import torch
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import Attention as RefAttn
    finally:
        sys.path.pop(0)
    pe = RefAttn.PositionalEncoding(32)
    with torch.no_grad():
        t = pe(torch.arange(0, 20)).numpy()
    j = np.asarray(positional_encoding(20, 32))
    np.testing.assert_allclose(t, j, rtol=1e-5, atol=1e-6)


@requires_reference
def test_multihead_attention_matches_reference(rng):
    import torch
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import Attention as RefAttn
    finally:
        sys.path.pop(0)

    E, H = 32, 4
    tmod = RefAttn.MultiheadAttention(head_dim=E // H, n_heads=H,
                                      embedding_dim=E, add_positional=True)
    tmod.eval()
    x = rng.randn(2, 10, E).astype(np.float32)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.copy())).numpy()

    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    layer = MultiheadAttention(E // H, H, E, add_positional=True)
    params = {
        "w_q": sd["W_q"], "w_k": sd["W_k"], "w_v": sd["W_v"], "w_o": sd["W_o"],
        "ln_attn": {"gamma": sd["layer_norm_attn.weight"],
                    "beta": sd["layer_norm_attn.bias"]},
        "lin_w": sd["linear.0.weight"].T, "lin_b": sd["linear.0.bias"],
        "ln_lin": {"gamma": sd["layer_norm_linear.weight"],
                   "beta": sd["layer_norm_linear.bias"]},
    }
    j_out, _ = layer.apply(params, {}, jnp.asarray(x))
    np.testing.assert_allclose(t_out, np.asarray(j_out), rtol=1e-3, atol=1e-4)


def test_hello_encoder_shapes(rng):
    enc = HelloEncoder(n_layers=2, n_heads=4, input_dim=6, embedding_dim=32)
    params, state, out_shape = enc.init(jax.random.PRNGKey(0), (150, 6))
    assert tuple(out_shape) == (150, 32)
    x = rng.randn(3, 150, 6).astype(np.float32)
    y, _ = enc.apply(params, state, jnp.asarray(x))
    assert y.shape == (3, 150, 32)
    assert np.isfinite(np.asarray(y)).all()
