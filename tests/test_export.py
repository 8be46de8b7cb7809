"""Round-trip export test: jax params -> torch state_dict -> reference torch
model -> convert back -> identical forward outputs."""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

import jax

from hello_tpu.nn import archs
from hello_tpu.nn.convert import convert_state_dict
from hello_tpu.nn.export import export_state_dict
from hello_tpu.nn.moe import MoEAttention


def test_export_convert_roundtrip(rng):
    """export followed by convert must reproduce the original params."""
    model = MoEAttention(archs.config_single_tech())
    params, state = model.init(jax.random.PRNGKey(3))
    sd = export_state_dict(model, params, state)
    params2, state2 = convert_state_dict(sd, model, prefix="")

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    flat2 = {jax.tree_util.keystr(k): v for k, v in flat2.items()}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat2[key]),
                                   rtol=1e-6, err_msg=key)


@requires_reference
def test_export_loads_into_reference_model(rng):
    """The exported state_dict must load into the reference torch model with
    strict key matching and produce the same forward output."""
    import torch
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import importlib
        import MixtureOfExpertsAdvanced as MoERef
        cfg = importlib.import_module(
            "moe_attention_config_single_tech_old_equivalent_weight_norm")
        tmodel = MoERef.create_moe_attention_model(cfg.configDict)
    finally:
        sys.path.pop(0)

    model = MoEAttention(archs.config_single_tech())
    params, state = model.init(jax.random.PRNGKey(4))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(model, params, state).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not missing, f"missing keys: {missing[:5]}"
    tmodel.eval()

    # forward parity on one allele with 3 reads
    reads = rng.randint(0, 255, size=(3, 150, 6)).astype(np.uint8)
    with torch.no_grad():
        t_out = tmodel(
            (torch.from_numpy(reads.transpose(0, 2, 1).astype(np.float32)), None),
            [1], ([3], [None]),
            torch.zeros(1, 150, 5)).numpy()

    batch = {
        "reads0": reads[None, ...],
        "read_mask0": np.ones((1, 3), np.float32),
        "site_ids": np.zeros(1, np.int32),
        "allele_mask": np.ones(1, np.float32),
        "ref_segments": np.zeros((1, 150, 5), np.float32),
    }
    out, _ = model.apply(params, state, batch)
    np.testing.assert_allclose(t_out, np.asarray(out["experts"]),
                               rtol=1e-3, atol=1e-3)


@requires_reference
def test_load_whole_module_wrapper_checkpoint(tmp_path, rng):
    """A torch-saved whole-module wrapper (the reference's .wrapper.dnn
    format) loads and converts into a working parameter pytree."""
    import torch
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import importlib
        import MixtureOfExpertsAdvanced as MoERef
        cfg = importlib.import_module(
            "moe_attention_config_single_tech_old_equivalent_weight_norm")
        tmodel = MoERef.create_moe_attention_model(cfg.configDict)
        wrapper = MoERef.MoEMergedWrapperAdvanced(tmodel)
        path = str(tmp_path / "model.wrapper.dnn")
        torch.save(wrapper, path)
    finally:
        sys.path.pop(0)

    from hello_tpu.nn.convert import load_torch_checkpoint

    model = MoEAttention(archs.config_single_tech())
    params, state = load_torch_checkpoint(path, model)

    # forward parity against the wrapped torch model
    reads = rng.randint(0, 255, size=(3, 150, 6)).astype(np.uint8)
    tmodel.eval()
    with torch.no_grad():
        t_out = tmodel(
            (torch.from_numpy(reads.transpose(0, 2, 1).astype(np.float32)), None),
            [1], ([3], [None]), torch.zeros(1, 150, 5)).numpy()
    batch = {
        "reads0": reads[None, ...],
        "read_mask0": np.ones((1, 3), np.float32),
        "site_ids": np.zeros(1, np.int32),
        "allele_mask": np.ones(1, np.float32),
        "ref_segments": np.zeros((1, 150, 5), np.float32),
    }
    out, _ = model.apply(params, state, batch)
    np.testing.assert_allclose(t_out, np.asarray(out["experts"]),
                               rtol=1e-3, atol=1e-3)
