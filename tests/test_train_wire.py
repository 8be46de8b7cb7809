"""Coded-wire TRAINING path (pipeline/compact.py through train/trainer.py).

The training loader can ship 1-byte coded rows instead of dense uint8
feature tensors (~6x less host->device staging per step); the trainer
expands them inside the jitted step.  Expansion is byte-exact, so a wire
training step must match the dense step numerically.
"""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.nn.moe import create_model
from hello_tpu.parallel.mesh import data_mesh
from hello_tpu.pipeline.batching import (pack_sites, stack_device_batches,
                                         training_dict)
from hello_tpu.pipeline.compact import (encode_chunk_sites, pack_sites_wire,
                                        stack_wire_batches,
                                        training_wire_dict)
from hello_tpu.pipeline.parallel_call import host_sites_for_chunk
from hello_tpu.train.trainer import TrainConfig, Trainer


def _labeled_sites(tmp_path, platforms=("illumina",), n=24):
    ds = sim.make_dataset(str(tmp_path), ref_length=30_000, num_variants=60,
                          coverage=30, read_length=120, seed=9,
                          platforms=platforms)
    bams = [ds.bams[p] for p in platforms]
    sites = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000, {})
    assert len(sites) >= n
    sites = sites[:n]
    for i, s in enumerate(sites):
        s.labels = [(i + j) % 2 for j in range(len(s.alleles))]
        s.site_label = 0
    return sites


@pytest.mark.parametrize("platforms", [("illumina",), ("illumina", "pacbio")])
def test_wire_training_step_matches_dense(tmp_path, platforms):
    """One optimisation step from identical initial params: the coded-wire
    batch must produce the same loss and the same updated parameters as the
    dense batch it encodes."""
    hybrid = len(platforms) > 1
    sites = _labeled_sites(tmp_path, platforms)

    dense = stack_device_batches(
        [training_dict(pack_sites(sites, hybrid=hybrid))])
    coded = encode_chunk_sites(sites)
    assert coded is not None
    wire = stack_wire_batches(
        [training_wire_dict(pack_sites_wire(coded, hybrid=hybrid))])

    model_name = "hybrid" if hybrid else "illumina"
    cfg = TrainConfig(entropy_regularizer=0.1, binary=not hybrid)
    t_dense = Trainer(create_model(model_name), cfg, mesh=data_mesh(1), seed=7)
    t_wire = Trainer(create_model(model_name), cfg, mesh=data_mesh(1), seed=7)

    m_dense = t_dense.train_batch(dense)
    m_wire = t_wire.train_batch(wire)
    np.testing.assert_allclose(m_wire["loss"], m_dense["loss"], rtol=1e-6)

    import jax
    leaves_d = jax.tree_util.tree_leaves(t_dense.params)
    leaves_w = jax.tree_util.tree_leaves(t_wire.params)
    for a, b in zip(leaves_d, leaves_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

    # evaluate() accepts wire batches too
    val_dense = t_dense.evaluate([training_dict(pack_sites(sites, hybrid=hybrid))])
    val_wire = t_dense.evaluate(
        [training_wire_dict(pack_sites_wire(coded, hybrid=hybrid))])
    np.testing.assert_allclose(val_wire, val_dense, rtol=1e-6)


def test_stack_wire_batches_pads_row_buckets(tmp_path):
    """Per-device wire dicts with different packed-row buckets stack by
    padding to the group maximum; the padding must be inert (the stacked
    slice expands to exactly what the unpadded dict expands to)."""
    from hello_tpu.pipeline.compact import expand_compact

    sites = _labeled_sites(tmp_path, n=24)
    fixed = dict(read_buckets=(64,), allele_buckets=(64,), site_buckets=(16,))
    coded = encode_chunk_sites(sites)
    # different site counts => different real-row counts => (possibly)
    # different row buckets; same allele/read/site buckets
    w1 = pack_sites_wire(coded[:4], hybrid=False,
                         row_buckets=(512,), **fixed)
    w2 = pack_sites_wire(coded[:16], hybrid=False,
                         row_buckets=(2048,), **fixed)
    d1, d2 = training_wire_dict(w1), training_wire_dict(w2)
    assert d1["codes0"].shape[0] != d2["codes0"].shape[0]
    stacked = stack_wire_batches([d1, d2])
    assert stacked["codes0"].shape[0] == 2

    for i, orig in enumerate((d1, d2)):
        part = {k: v[i] for k, v in stacked.items() if k != "labels"}
        want = expand_compact({k: v for k, v in orig.items() if k != "labels"})
        got = expand_compact(part)
        for key in want:
            np.testing.assert_array_equal(np.asarray(got[key]),
                                          np.asarray(want[key]),
                                          err_msg=f"batch {i} key {key}")


def test_loader_wire_device_batches(tmp_path):
    """device_batches(wire=True) under fixed_shape: single fixed row bucket
    (= allele_bucket * read_bucket), trains, and matches the dense loader's
    first-step loss."""
    sites = _labeled_sites(tmp_path, n=24)
    from hello_tpu.train.loader import device_batches

    fixed = {"read_bucket": 64, "allele_bucket": 64, "site_bucket": 16}
    wire_batches = list(device_batches(
        sites, hybrid=False, num_devices=1, max_alleles_per_batch=48,
        fixed_shape=fixed, wire=True))
    dense_batches = list(device_batches(
        sites, hybrid=False, num_devices=1, max_alleles_per_batch=48,
        fixed_shape=fixed, wire=False))
    assert len(wire_batches) == len(dense_batches) >= 1
    assert all("codes0" in b for b in wire_batches)
    # fixed shape => every wire batch has the SAME (pinned) row bucket
    row_shapes = {b["codes0"].shape for b in wire_batches}
    assert len(row_shapes) == 1
    assert next(iter(row_shapes))[1] == 64 * 64  # pinned at A*R cap

    cfg = TrainConfig(entropy_regularizer=0.1, binary=True)
    t_wire = Trainer(create_model("illumina"), cfg, mesh=data_mesh(1), seed=3)
    t_dense = Trainer(create_model("illumina"), cfg, mesh=data_mesh(1), seed=3)
    losses_w = [t_wire.train_batch(b)["loss"] for b in wire_batches]
    losses_d = [t_dense.train_batch(b)["loss"] for b in dense_batches]
    np.testing.assert_allclose(losses_w, losses_d, rtol=2e-5)
