"""Pallas kernel semantics tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hello_tpu.nn.moe import create_model, masked_read_sum
from hello_tpu.ops import read_conv as rck


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        rck.pl, "pallas_call",
        lambda *a, **k: orig(*a, **dict(k, interpret=True)))


@pytest.mark.parametrize("chunked", [False, True])
def test_fused_read_convolver_matches_layers(interpret_pallas, rng, chunked):
    model = create_model("illumina")
    params, state = model.init(jax.random.PRNGKey(0))
    A, R = 4, 8
    reads = rng.randint(0, 255, (A, R, 150, 6)).astype(np.uint8)
    mask = (rng.rand(A, R) < 0.8).astype(np.float32)

    rc = model.nets["read_conv0"]
    flat = jnp.asarray(reads.reshape(A * R, 150, 6), jnp.float32)
    frames, _ = rc.apply(params["read_conv0"], {}, flat)
    ref = masked_read_sum(jnp.reshape(frames, (A, R, 36, 64)),
                          jnp.asarray(mask))

    weights = rck.extract_read_conv_weights(rc, params["read_conv0"])
    assert len(weights) == 36  # 18 convs x (w, b)
    out = rck.fused_read_convolver(
        jnp.asarray(reads), jnp.asarray(mask), weights,
        read_chunk=4 if chunked else 8)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-3)


def test_fused_read_convolver_mask_zero_rows(interpret_pallas, rng):
    """Fully masked allele slots must reduce to exactly zero."""
    model = create_model("illumina")
    params, _ = model.init(jax.random.PRNGKey(1))
    weights = rck.extract_read_conv_weights(
        model.nets["read_conv0"], params["read_conv0"])
    reads = rng.randint(0, 255, (2, 4, 150, 6)).astype(np.uint8)
    mask = np.zeros((2, 4), np.float32)
    out = rck.fused_read_convolver(jnp.asarray(reads), jnp.asarray(mask),
                                   weights, read_chunk=4)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
