"""Whole-model numerical parity: reference torch MoEAttention (ragged batches)
vs hello_tpu MoEAttention (padded batches), with parameters carried across by
the checkpoint converter.

These tests import the reference implementation read-only from
/root/reference/python to build the torch golden model; they are skipped when
the reference is not mounted.
"""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

import jax

from hello_tpu.nn import archs
from hello_tpu.nn.convert import convert_state_dict
from hello_tpu.nn.moe import MoEAttention
from hello_tpu.pipeline.batching import SiteWork, pack_sites


def _load_reference_model(config_name):
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import importlib
        # reference config modules mutate shared architectures.* globals
        # (norm_type/activation/weight_norm) in place; purge so each config
        # builds from pristine modules regardless of test order
        for mod in list(sys.modules):
            if mod == config_name or mod.split(".")[0] == "architectures":
                del sys.modules[mod]
        import MixtureOfExpertsAdvanced as MoERef
        cfg_module = importlib.import_module(config_name)
        model = MoERef.create_moe_attention_model(cfg_module.configDict)
        model.eval()
        return model
    finally:
        sys.path.pop(0)


def _ragged_inputs(rng, num_sites, hybrid, channels=6):
    """Generate ragged per-site/allele/read uint8 tensors."""
    sites = []
    for si in range(num_sites):
        n_alleles = rng.randint(1, 4)
        alleles = [f"al{si}_{a}" for a in range(n_alleles)]
        t0 = [rng.randint(0, 255, size=(rng.randint(1, 7), 150, channels)).astype(np.uint8)
              for _ in alleles]
        t1 = None
        if hybrid:
            t1 = [rng.randint(0, 255, size=(rng.randint(1, 5), 150, channels)).astype(np.uint8)
                  for _ in alleles]
        seg = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=150)]
        sites.append(SiteWork("chr20", 1000 + 100 * si, 1001 + 100 * si,
                              alleles, t0, t1, seg))
    return sites


def _torch_forward(tmodel, sites, hybrid):
    import torch

    num_alleles_per_site = [len(s.alleles) for s in sites]
    reads0, reads1, nr0, nr1 = [], [], [], []
    for s in sites:
        for t in s.tensors0:
            reads0.append(t)
            nr0.append(t.shape[0])
    if hybrid:
        for s in sites:
            for t in s.tensors1:
                reads1.append(t)
                nr1.append(t.shape[0])
    # torch layout: [sum_reads, C, L]
    t0 = torch.from_numpy(
        np.concatenate(reads0, axis=0).transpose(0, 2, 1).astype(np.float32))
    t1 = None
    if hybrid:
        t1 = torch.from_numpy(
            np.concatenate(reads1, axis=0).transpose(0, 2, 1).astype(np.float32))
    segs = torch.from_numpy(np.stack([s.ref_segment for s in sites]))

    with torch.no_grad():
        out = tmodel((t0, t1), num_alleles_per_site, (nr0, nr1), segs)

    if isinstance(out, tuple) and isinstance(out[0], list):
        experts, meta = out
        experts = np.stack([e.numpy()[:, 0] for e in experts], axis=1)  # [A, 3]
        return experts, meta.numpy()
    else:
        return out.numpy(), None


def _ours_forward(config, tmodel, sites, hybrid):
    model = MoEAttention(config)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, state = convert_state_dict(sd, model)
    batch = pack_sites(sites, hybrid=hybrid)
    out, _ = model.apply(params, state, dict(batch.device_dict()))
    experts = np.asarray(out["experts"])
    n_real = len(batch.allele_site_index)
    experts = experts[:n_real]
    meta = None
    if out["meta"] is not None:
        meta = np.asarray(out["meta"])[:len(sites)]
    return experts, meta


def _assert_parity(t_experts, j_experts):
    """Logit-level tolerance parity.

    Sub-network outputs match torch to ~1e-5 on identical inputs (fp32
    conv-algorithm differences only); the remaining drift at the logits is
    error amplification through the ~15-layer stack on O(100) activations.
    Genotype decisions depend on sigmoid probabilities, so those get the
    tighter bound.
    """
    np.testing.assert_allclose(t_experts, j_experts, rtol=2e-2, atol=1e-2)
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    np.testing.assert_allclose(sig(t_experts), sig(j_experts), atol=3e-3)


@requires_reference
def test_single_tech_parity(rng):
    tmodel = _load_reference_model(
        "moe_attention_config_single_tech_old_equivalent_weight_norm")
    sites = _ragged_inputs(rng, num_sites=4, hybrid=False)
    t_experts, t_meta = _torch_forward(tmodel, sites, hybrid=False)
    j_experts, j_meta = _ours_forward(archs.config_single_tech(), tmodel, sites, hybrid=False)
    assert t_meta is None and j_meta is None
    _assert_parity(t_experts, j_experts)


@requires_reference
def test_hybrid_no_ensemble_parity(rng):
    tmodel = _load_reference_model(
        "moe_attention_config_full_hybrid_old_equivalent_weight_norm_no_ensemble")
    sites = _ragged_inputs(rng, num_sites=3, hybrid=True)
    t_experts, t_meta = _torch_forward(tmodel, sites, hybrid=True)
    j_experts, j_meta = _ours_forward(archs.config_hybrid_no_ensemble(), tmodel, sites, hybrid=True)
    assert t_meta is None and j_meta is None
    _assert_parity(t_experts, j_experts)


@requires_reference
def test_hybrid_full_parity(rng):
    tmodel = _load_reference_model(
        "moe_attention_config_full_hybrid_old_equivalent_weight_norm")
    sites = _ragged_inputs(rng, num_sites=3, hybrid=True)
    t_experts, t_meta = _torch_forward(tmodel, sites, hybrid=True)
    j_experts, j_meta = _ours_forward(archs.config_hybrid_full(), tmodel, sites, hybrid=True)
    _assert_parity(t_experts, j_experts)
    np.testing.assert_allclose(t_meta, j_meta, atol=3e-3)


def test_compressor_bn_state_threads_sequentially(rng):
    """The compressor is applied twice per forward (allele pass, then site
    pass); its batch-norm running stats must update sequentially, as the
    reference's in-place torch BN does — not both from the pre-forward state."""
    import jax
    from hello_tpu.nn.moe import (MoEAttention, make_site_onehot,
                                  masked_read_sum, site_segment_sum)

    config = {
        "read_conv0": [{"type": "Conv1d",
                        "kwargs": {"in_channels": 6, "out_channels": 4,
                                   "kernel_size": 1}}],
        "compressor0": [
            {"type": "Conv1d", "kwargs": {"in_channels": 4, "out_channels": 4,
                                          "kernel_size": 1}},
            {"type": "BatchNorm1d", "kwargs": {"num_features": 4}},
        ],
    }
    model = MoEAttention(config)
    params, state = model.init(jax.random.PRNGKey(0))
    A, R, L, S = 4, 3, 150, 2
    batch = {
        "reads0": rng.randint(0, 255, (A, R, L, 6)).astype(np.uint8),
        "read_mask0": np.ones((A, R), np.float32),
        "site_ids": np.array([0, 0, 1, 1], np.int32),
        "allele_mask": np.ones(A, np.float32),
        "ref_segments": np.zeros((S, L, 5), np.float32),
    }
    _, new_state = model.apply(params, state, batch, train=True)

    # hand-compute the expected sequential BN updates
    flat = batch["reads0"].reshape(A * R, L, 6).astype(np.float32)
    frames, _ = model.nets["read_conv0"].apply(params["read_conv0"], {}, flat)
    frames = np.asarray(frames).reshape(A, R, L, 4)
    reduced = masked_read_sum(frames, batch["read_mask0"])
    onehot = make_site_onehot(batch["site_ids"], batch["allele_mask"], S)
    site_frames = site_segment_sum(reduced, onehot)
    conv = model.nets["compressor0"].layers[0]
    bn = model.nets["compressor0"].layers[1]
    cin_a, _ = conv.apply(params["compressor0"]["0"], {}, reduced)
    cin_s, _ = conv.apply(params["compressor0"]["0"], {}, site_frames)
    bnp = params["compressor0"]["1"]
    _, s1 = bn.apply(bnp, state["compressor0"]["1"], cin_a, train=True)
    _, s2 = bn.apply(bnp, s1, cin_s, train=True)
    got = new_state["compressor0"]["1"]
    np.testing.assert_allclose(np.asarray(got["mean"]), np.asarray(s2["mean"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["var"]), np.asarray(s2["var"]),
                               rtol=1e-5)


@requires_reference
def test_layer_norm_config_parity(rng):
    """The "layer_norm" single-tech config (Noop norms + Softplus activations,
    reference moe_attention_config_single_tech_old_equivalent_layer_norm.py)."""
    tmodel = _load_reference_model(
        "moe_attention_config_single_tech_old_equivalent_layer_norm")
    sites = _ragged_inputs(rng, num_sites=4, hybrid=False)
    t_experts, _ = _torch_forward(tmodel, sites, hybrid=False)
    j_experts, _ = _ours_forward(archs.config_single_tech_layer_norm(),
                                 tmodel, sites, hybrid=False)
    _assert_parity(t_experts, j_experts)


@requires_reference
def test_hybrid_ensemble2_parity(rng):
    """ensemble2: experts 0/1 + ref-segment meta, expert2 zero-substituted
    (reference ..._weight_norm_ensemble2.py)."""
    tmodel = _load_reference_model(
        "moe_attention_config_full_hybrid_old_equivalent_weight_norm_ensemble2")
    sites = _ragged_inputs(rng, num_sites=3, hybrid=True)
    t_experts, t_meta = _torch_forward(tmodel, sites, hybrid=True)
    j_experts, j_meta = _ours_forward(archs.config_hybrid_ensemble2(),
                                      tmodel, sites, hybrid=True)
    # expert2 is a zeros placeholder in this config; compare real experts
    _assert_parity(t_experts[:, :2], j_experts[:, :2])
    assert np.allclose(j_experts[:, 2], 0.0)
    np.testing.assert_allclose(t_meta, j_meta, atol=3e-3)


def test_bf16_activation_mode_close_to_f32(rng):
    """`set_precision("bf16")` (bf16 conv activations for HBM-bound read
    convs) must stay decision-grade close to fp32: logits within ~2e-2,
    expert logits still f32 (Linear outputs are not down-cast)."""
    from hello_tpu.nn import layers as L
    from hello_tpu.nn.moe import create_model
    from hello_tpu.pipeline.batching import SiteWork, pack_sites

    sites = []
    for si in range(4):
        t0 = [rng.randint(0, 255, size=(6, 150, 6)).astype(np.uint8)
              for _ in range(2)]
        t1 = [rng.randint(0, 255, size=(4, 150, 6)).astype(np.uint8)
              for _ in range(2)]
        seg = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=150)]
        sites.append(SiteWork("chr1", 100 + si, 101 + si, ["A", "C"],
                              t0, t1, seg))
    batch = pack_sites(sites, hybrid=True).device_dict()
    model = create_model("hybrid")
    params, state = model.init(jax.random.PRNGKey(7))
    outs = {}
    try:
        for prec in ("highest", "bf16"):
            L.set_precision(prec)
            out, _ = model.apply(params, state, batch, train=False)
            outs[prec] = (np.asarray(out["experts"], np.float32),
                          np.asarray(out["meta"], np.float32))
            assert np.asarray(out["experts"]).dtype == np.float32
    finally:
        L.set_precision("highest")
    assert L.ACT_DTYPE is None and L.PRECISION == "highest"
    np.testing.assert_allclose(outs["highest"][0], outs["bf16"][0], atol=5e-2)
    np.testing.assert_allclose(outs["highest"][1], outs["bf16"][1], atol=1e-2)


def test_every_named_config_builds_and_forwards():
    """All reference model-config files have a named equivalent that
    initialises and runs a forward (the per-variant numerics are covered by
    the dedicated parity tests above)."""
    import jax

    from hello_tpu.nn.archs import NAMED_CONFIGS
    from hello_tpu.nn.moe import create_model

    rng = np.random.RandomState(0)
    for name in NAMED_CONFIGS:
        model = create_model(name)
        params, state = model.init(jax.random.PRNGKey(0))
        C = 7 if name == "pacbio_hp" else 6
        batch = {
            "reads0": rng.randint(0, 255, (4, 3, 150, C)).astype(np.uint8),
            "read_mask0": np.ones((4, 3), np.float32),
            "site_ids": np.array([0, 0, 1, 1], np.int32),
            "allele_mask": np.ones(4, np.float32),
            "ref_segments": np.eye(5, dtype=np.float32)[
                rng.randint(0, 5, (2, 150))],
        }
        if model.hybrid:
            batch["reads1"] = rng.randint(0, 255, (4, 3, 150, C)).astype(np.uint8)
            batch["read_mask1"] = np.ones((4, 3), np.float32)
        out, _ = model.apply(params, state, batch, train=False)
        experts = np.asarray(out["experts"])
        assert experts.shape[0] == 4 and np.isfinite(experts).all(), name


def test_train_mode_batchnorm_padding_invariance():
    """Train-mode BatchNorm statistics must ignore padded rows: the same
    sites packed into different allele/read buckets must produce identical
    real-slot logits AND identical running-stat updates.  The layer_norm
    config is the BN-bearing shipping variant (its xattn terminus keeps
    BatchNorm1d); without masked statistics this fails badly."""
    import jax

    from hello_tpu.nn.moe import create_model

    rng = np.random.RandomState(3)
    model = create_model("illumina_layer_norm")
    params, state = model.init(jax.random.PRNGKey(0))

    def make_batch(A, R, S):
        batch = {
            "reads0": np.zeros((A, R, 150, 6), np.uint8),
            "read_mask0": np.zeros((A, R), np.float32),
            "site_ids": np.zeros((A,), np.int32),
            "allele_mask": np.zeros((A,), np.float32),
            "ref_segments": np.zeros((S, 150, 5), np.float32),
        }
        return batch

    # 6 real alleles over 3 sites, 5 real reads each
    real = rng.randint(0, 255, size=(6, 5, 150, 6)).astype(np.uint8)
    segs = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=(3, 150))]
    outs = []
    states = []
    for A, R, S in [(8, 8, 4), (16, 16, 8)]:
        b = make_batch(A, R, S)
        b["reads0"][:6, :5] = real
        b["read_mask0"][:6, :5] = 1.0
        b["site_ids"][:6] = np.repeat(np.arange(3, dtype=np.int32), 2)
        b["allele_mask"][:6] = 1.0
        b["ref_segments"][:3] = segs
        out, ns = model.apply(params, state, b, train=True)
        outs.append(np.asarray(out["experts"])[:6])
        states.append(jax.tree_util.tree_map(np.asarray, ns))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)
    for (pa, a), (_pb, bb) in zip(
            jax.tree_util.tree_leaves_with_path(states[0]),
            jax.tree_util.tree_leaves_with_path(states[1])):
        np.testing.assert_allclose(
            a, bb, rtol=2e-5, atol=2e-5,
            err_msg=f"BN state differs across padding at "
                    f"{jax.tree_util.keystr(pa)}")
