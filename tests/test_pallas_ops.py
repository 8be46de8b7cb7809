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


@pytest.mark.parametrize("lanes", [4, 8, 16])
def test_fused_read_convolver_matches_layers(interpret_pallas, rng, lanes):
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
    # lanes 4: R split into 2 chunks; 8: exact; 16: 2 allele slots packed
    # per lane group (and A=4 exercises the no-pad path; see also lanes=16
    # with odd A below)
    out = rck.fused_read_convolver(
        jnp.asarray(reads), jnp.asarray(mask), weights, lanes=lanes)
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
                                   weights, lanes=4)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_model_apply_with_pallas_read_conv_matches_xla(interpret_pallas, rng):
    """Full-model forward with the fused read-convolver tagged in must equal
    the XLA path (interpret mode)."""
    import jax

    from hello_tpu.nn.moe import create_model
    from hello_tpu.ops.read_conv import enable_pallas_read_convs

    model = create_model("illumina")
    params, state = model.init(jax.random.PRNGKey(3))
    A, R = 4, 8
    batch = {
        "reads0": rng.randint(0, 255, (A, R, 150, 6)).astype(np.uint8),
        "read_mask0": (rng.rand(A, R) < 0.7).astype(np.float32),
        "site_ids": np.array([0, 0, 1, 1], np.int32),
        "allele_mask": np.ones(A, np.float32),
        "ref_segments": np.zeros((2, 150, 5), np.float32),
    }
    batch["read_mask0"][:, 0] = 1.0

    base, _ = model.apply(params, state, batch)
    names = enable_pallas_read_convs(model, params, use_pallas=True)
    assert names == ("read_conv0",)
    # production gates the kernel on full-128-lane buckets; shrink the gate
    # so the R=8 interpret-mode batch exercises the fused path
    monkeypatch_lanes = 8
    import hello_tpu.nn.moe as moe_mod
    old_lanes = moe_mod.PALLAS_LANE_MULTIPLE
    moe_mod.PALLAS_LANE_MULTIPLE = monkeypatch_lanes
    try:
        fused, _ = model.apply(params, state, batch)
    finally:
        moe_mod.PALLAS_LANE_MULTIPLE = old_lanes
    model.pallas_read_convs = ()
    np.testing.assert_allclose(np.asarray(base["experts"]),
                               np.asarray(fused["experts"]),
                               rtol=2e-4, atol=2e-4)

    # unsupported topologies must NOT be tagged
    wide = create_model("illumina_wide")
    wparams, _ = wide.init(jax.random.PRNGKey(4))
    assert enable_pallas_read_convs(wide, wparams, use_pallas=True) == ()


def test_fused_read_convolver_pads_allele_slots(interpret_pallas, rng):
    """A not divisible by the slot-packing factor G pads internally and
    slices back."""
    model = create_model("illumina")
    params, _ = model.init(jax.random.PRNGKey(2))
    weights = rck.extract_read_conv_weights(
        model.nets["read_conv0"], params["read_conv0"])
    A, R = 3, 4                                      # lanes=16 -> G=4, pad 1
    reads = rng.randint(0, 255, (A, R, 150, 6)).astype(np.uint8)
    mask = (rng.rand(A, R) < 0.8).astype(np.float32)
    mask[:, 0] = 1.0
    rc = model.nets["read_conv0"]
    flat = jnp.asarray(reads.reshape(A * R, 150, 6), jnp.float32)
    frames, _ = rc.apply(params["read_conv0"], {}, flat)
    ref = masked_read_sum(jnp.reshape(frames, (A, R, 36, 64)),
                          jnp.asarray(mask))
    out = rck.fused_read_convolver(jnp.asarray(reads), jnp.asarray(mask),
                                   weights, lanes=16)
    assert out.shape == (A, 36, 64)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-3)
