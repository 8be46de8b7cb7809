"""Training-system tests: loss parity vs the reference torch implementation,
sharded multi-device training step, schedules, and checkpointing."""

import os
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

import jax
import jax.numpy as jnp


def test_moe_loss_matches_reference_math(rng):
    """Compare against the reference MoELoss formulas computed with torch."""
    import torch
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import MixtureOfExpertsTools as MoET
    finally:
        sys.path.pop(0)

    from hello_tpu.train.loss import moe_loss

    S, E = 5, 3
    alleles_per_site = [2, 3, 1, 2, 2]
    A = sum(alleles_per_site)
    logits = rng.randn(A, E).astype(np.float32)
    meta_site = rng.rand(S, E).astype(np.float32)
    meta_site /= meta_site.sum(axis=1, keepdims=True)
    labels = (rng.rand(A) < 0.5).astype(np.float32)

    # reference loss (eval mode: no smoothing/entropy)
    crit = MoET.MoELoss(regularizer=0.0, decay=0.5, provideIndividualLoss=True)
    crit.eval()
    expert_list = [torch.from_numpy(logits[:, k:k + 1]) for k in range(E)]
    t_loss, t_indiv, t_post = crit(
        (expert_list, torch.from_numpy(meta_site)),
        torch.from_numpy(labels), alleles_per_site)

    site_ids = np.repeat(np.arange(S), alleles_per_site).astype(np.int32)
    mask = np.ones(A, np.float32)
    j_loss, j_indiv, j_post = moe_loss(
        jnp.asarray(logits), jnp.asarray(meta_site), jnp.asarray(labels),
        jnp.asarray(site_ids), jnp.asarray(mask), regularizer=0.0, train=False)

    np.testing.assert_allclose(float(t_loss), float(j_loss), rtol=1e-4)
    np.testing.assert_allclose(t_indiv.numpy(), np.asarray(j_indiv), rtol=1e-4)
    np.testing.assert_allclose(t_post.detach().numpy(), np.asarray(j_post),
                               rtol=1e-4, atol=1e-5)


def test_moe_loss_padding_invariance(rng):
    """Padded allele slots must not change the loss."""
    from hello_tpu.train.loss import moe_loss

    A, S, E = 6, 3, 3
    logits = rng.randn(A, E).astype(np.float32)
    meta = np.full((S, E), 1 / 3, np.float32)
    labels = (rng.rand(A) < 0.5).astype(np.float32)
    site_ids = np.array([0, 0, 1, 1, 2, 2], np.int32)
    mask = np.ones(A, np.float32)
    base, _, _ = moe_loss(logits, meta, labels, site_ids, mask, train=False)

    pad = 4
    logits_p = np.concatenate([logits, rng.randn(pad, E).astype(np.float32)])
    labels_p = np.concatenate([labels, np.ones(pad, np.float32)])
    site_ids_p = np.concatenate([site_ids, np.full(pad, S - 1, np.int32)])
    mask_p = np.concatenate([mask, np.zeros(pad, np.float32)])
    padded, _, _ = moe_loss(logits_p, meta, labels_p, site_ids_p, mask_p,
                            train=False)
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)


def test_schedules():
    from hello_tpu.train.schedule import cosine_warm_restarts, sine_warmup_restarts

    sched = cosine_warm_restarts(1.0, t0=10, t_mult=2, eta_min=0.1)
    assert abs(sched(0) - 1.0) < 1e-9          # restart peak
    assert abs(sched(10) - 1.0) < 1e-9         # warm restart
    assert sched(5) < sched(1)                 # annealing down
    warm = sine_warmup_restarts(1.0, t0=10, t_mult=2, eta_min=0.0)
    assert warm(0) < 1e-9                      # starts at minimum
    assert warm(9) > warm(1)                   # rising
    # schedules run on traced steps inside the jitted train step: the jitted
    # value must match the eager value
    for step in (0, 1, 5, 10, 17, 30, 70):
        np.testing.assert_allclose(float(jax.jit(sched)(step)),
                                   float(sched(step)), rtol=1e-6)


def test_sgdr_inside_jitted_train_step(rng):
    """Regression: SGDR/warmup schedules are invoked on the traced step inside
    the jitted train step (math.cos + Python branches used to raise
    ConcretizationTypeError on the first train_batch)."""
    from hello_tpu.nn.moe import create_model
    from hello_tpu.parallel.mesh import data_mesh
    from hello_tpu.pipeline.batching import stack_device_batches
    from hello_tpu.train.trainer import Trainer, TrainConfig
    import __graft_entry__ as ge

    mesh = data_mesh(1)
    batch = ge._example_batch(np.random.RandomState(6), hybrid=False,
                              A=4, R=2, S=2, labels=True)
    stacked = stack_device_batches([batch])
    for cfg in (TrainConfig(lr=1e-2, optimizer="SGDR", binary=True),
                TrainConfig(lr=1e-2, optimizer="SGD", warmup=True, binary=True)):
        trainer = Trainer(create_model("illumina"), cfg, mesh=mesh)
        out = trainer.train_batch(stacked)
        assert np.isfinite(out["loss"])


def test_multichip_dryrun_8_devices():
    """The driver's multi-chip validation path: full hybrid training step
    sharded over 8 virtual devices."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    ge.dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    experts, meta = out
    assert np.isfinite(np.asarray(experts)).all()
    assert np.isfinite(np.asarray(meta)).all()


def test_training_reduces_loss(rng):
    """A few steps on a fixed batch must reduce the loss (single device)."""
    from hello_tpu.nn.moe import create_model
    from hello_tpu.parallel.mesh import data_mesh
    from hello_tpu.pipeline.batching import stack_device_batches
    from hello_tpu.train.trainer import Trainer, TrainConfig
    import __graft_entry__ as ge

    mesh = data_mesh(1)
    model = create_model("illumina")
    trainer = Trainer(model, TrainConfig(lr=1e-3, optimizer="Adam", binary=True),
                      mesh=mesh)
    batch = ge._example_batch(np.random.RandomState(5), hybrid=False,
                              A=8, R=2, S=4, labels=True)
    stacked = stack_device_batches([batch])
    first = trainer.train_batch(stacked)["loss"]
    for _ in range(10):
        last = trainer.train_batch(stacked)["loss"]
    assert last < first, (first, last)


def test_checkpoint_roundtrip(tmp_path):
    from hello_tpu.nn.moe import create_model
    from hello_tpu.train.checkpoint import save_checkpoint, load_checkpoint

    model = create_model("illumina")
    params, state = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, params, state, step=42)
    p2, s2 = load_checkpoint(path)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(p2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_on_top_grafts_base_params(rng):
    """Addendum model reuses base parameters on the shared prefix; the base
    portion of the forward must behave identically before the addendum."""
    from hello_tpu.nn import archs
    from hello_tpu.nn.moe import MoEAttention
    from hello_tpu.train.transfer import build_on_top

    base = MoEAttention(archs.config_single_tech())
    bp, bs = base.init(jax.random.PRNGKey(7))
    ext = MoEAttention(archs.config_single_tech(addendum=True))
    ep, es = ext.init(jax.random.PRNGKey(8))
    gp, gs = build_on_top(base, bp, bs, ext, ep, es)

    # shared prefix layers are identical to the base
    for k, leaf in bp["read_conv0"].items():
        got = gp["read_conv0"][k]
        for path, a in jax.tree_util.tree_leaves_with_path(leaf):
            b = a  # same structure
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(leaf)[0]),
            np.asarray(jax.tree_util.tree_leaves(got)[0]))
    # addendum layers beyond the base remain the fresh init
    n_base = len(base.nets["read_conv0"].layers)
    assert str(n_base) in gp["read_conv0"]

    # forward runs
    batch = {
        "reads0": rng.randint(0, 255, (2, 3, 150, 6)).astype(np.uint8),
        "read_mask0": np.ones((2, 3), np.float32),
        "site_ids": np.zeros(2, np.int32),
        "allele_mask": np.ones(2, np.float32),
        "ref_segments": np.zeros((1, 150, 5), np.float32),
    }
    out, _ = ext.apply(gp, gs, batch)
    assert np.isfinite(np.asarray(out["experts"])).all()


def test_wide_config_builds(rng):
    from hello_tpu.nn.moe import create_model
    model = create_model("hybrid_no_ensemble_wide")
    params, state = model.init(jax.random.PRNGKey(2))
    batch = {
        "reads0": rng.randint(0, 255, (2, 2, 150, 6)).astype(np.uint8),
        "read_mask0": np.ones((2, 2), np.float32),
        "reads1": rng.randint(0, 255, (2, 2, 150, 6)).astype(np.uint8),
        "read_mask1": np.ones((2, 2), np.float32),
        "site_ids": np.zeros(2, np.int32),
        "allele_mask": np.ones(2, np.float32),
        "ref_segments": np.zeros((1, 150, 5), np.float32),
    }
    out, _ = model.apply(params, state, batch)
    assert out["experts"].shape == (2, 1)


def test_nan_crash_dump(tmp_path, rng):
    """A non-finite loss dumps forensics and raises (reference parity:
    backward-crash dump)."""
    from hello_tpu.nn.moe import create_model
    from hello_tpu.parallel.mesh import data_mesh
    from hello_tpu.pipeline.batching import stack_device_batches
    from hello_tpu.train.trainer import Trainer, TrainConfig
    import __graft_entry__ as ge

    model = create_model("illumina")
    trainer = Trainer(model, TrainConfig(binary=True), mesh=data_mesh(1))
    # poison the parameters so the forward produces NaN
    trainer.params = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), trainer.params)
    batch = ge._example_batch(np.random.RandomState(1), hybrid=False,
                              A=4, R=2, S=2, labels=True)
    prefix = str(tmp_path / "crash")
    with pytest.raises(FloatingPointError):
        trainer.train_batch(stack_device_batches([batch]),
                            crash_dump_prefix=prefix)
    import glob
    assert glob.glob(prefix + "*.err.ckpt")
    assert glob.glob(prefix + "*.payload.pkl")


def test_coverage_simulation_thins_reads(tmp_path):
    """coverage_range thins per-allele read sets (reference Subsampler role)."""
    from hello_tpu.pipeline.batching import SiteWork
    from hello_tpu.train.loader import SiteDataset, simulate_coverage
    from hello_tpu.train.store import write_shards
    import random

    def site(n_reads):
        return SiteWork(
            chromosome="chr1", start=100, stop=101, alleles=["A", "C"],
            tensors0=[np.zeros((n_reads, 150, 6), np.uint8) for _ in range(2)],
            tensors1=None, ref_segment=None, labels=[1, 0], site_label=0)

    thinned = simulate_coverage(site(40), 0.5, random.Random(0))
    assert all(t.shape[0] == 20 for t in thinned.tensors0)
    # min 1 read survives even at tiny fractions
    tiny = simulate_coverage(site(3), 0.01, random.Random(0))
    assert all(t.shape[0] == 1 for t in tiny.tensors0)

    paths = write_shards(iter([site(40) for _ in range(4)]),
                         str(tmp_path / "cov"), sites_per_shard=10)
    ds = SiteDataset(paths, coverage_range=(0.25, 0.25), seed=3)
    for s in ds:
        assert all(t.shape[0] == 10 for t in s.tensors0)


def _resume_fixture(tmp_path):
    from hello_tpu import sim
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.pipeline.dump import dump_region

    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=10,
                          coverage=25, read_length=120, seed=17)
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t6000\n")
    ref = FastaFile(ds.fasta)
    return dump_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 6000,
                       ds.truth_vcf, bed, str(tmp_path / "dump"))


def _params_equal(a_path, b_path):
    from hello_tpu.train.checkpoint import load_full_checkpoint
    a = load_full_checkpoint(a_path)
    b = load_full_checkpoint(b_path)
    assert a["step"] == b["step"]
    for x, y in zip(jax.tree_util.tree_leaves(a["params"]),
                    jax.tree_util.tree_leaves(b["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(a["opt_state"]),
                    jax.tree_util.tree_leaves(b["opt_state"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_state_resume_replays_identical_run(tmp_path):
    """An interrupted-then-resumed run must be bitwise identical to an
    uninterrupted one: checkpoints carry the data-order position (epoch,
    batches_done, seed) and the loop fast-forwards the deterministic
    sampler (reference AlleleSearcherDNN.py:2105-2203 full-state resume)."""
    from hello_tpu.train.cli import train_from_shards

    shards = _resume_fixture(tmp_path)
    kw = dict(num_epochs=3, lr=1e-3, num_devices=1, batch_alleles=16,
              read_bucket=32, max_reads_per_site=32, val_fraction=0.0)

    # uninterrupted 3-epoch run
    train_from_shards(shards, "illumina", str(tmp_path / "full"), **kw)

    # same run interrupted after epoch 1, resumed from the epoch checkpoint
    kw1 = dict(kw); kw1["num_epochs"] = 2
    train_from_shards(shards, "illumina", str(tmp_path / "part"), **kw1)
    train_from_shards(shards, "illumina", str(tmp_path / "part"),
                      resume=str(tmp_path / "part.epoch1.ckpt"), **kw)

    _params_equal(str(tmp_path / "full.final.ckpt"),
                  str(tmp_path / "part.final.ckpt"))


def test_mid_epoch_resume_replays_identical_run(tmp_path):
    """checkpoint_every produces mid-epoch checkpoints whose resume
    fast-forwards to the exact batch."""
    from hello_tpu.train.checkpoint import load_full_checkpoint
    from hello_tpu.train.cli import train_from_shards

    shards = _resume_fixture(tmp_path)
    kw = dict(num_epochs=2, lr=1e-3, num_devices=1, batch_alleles=16,
              read_bucket=32, max_reads_per_site=32, val_fraction=0.0)

    train_from_shards(shards, "illumina", str(tmp_path / "full"), **kw)

    # run with step checkpoints, pick a mid-epoch one, resume from it
    train_from_shards(shards, "illumina", str(tmp_path / "part"),
                      checkpoint_every=2, **kw)
    import glob
    step_ckpts = sorted(glob.glob(str(tmp_path / "part.step*.ckpt")),
                        key=lambda p: int(p.split("step")[-1].split(".")[0]))
    mid = next(p for p in step_ckpts
               if load_full_checkpoint(p)["extra"]["batches_done"] > 0)
    train_from_shards(shards, "illumina", str(tmp_path / "resumed"),
                      resume=mid, **kw)
    _params_equal(str(tmp_path / "full.final.ckpt"),
                  str(tmp_path / "resumed.final.ckpt"))


def test_overlapped_staging_bitwise_identical(tmp_path):
    """The overlapped loop (batches staged to device on the prefetch thread,
    loss synced one step late — the accelerator default) must be bitwise
    identical to the plain synchronous loop: same batches, same order, same
    step math; only the transfer/readback scheduling differs."""
    from hello_tpu.train.cli import train_from_shards

    shards = _resume_fixture(tmp_path)
    kw = dict(num_epochs=2, lr=1e-3, num_devices=2, batch_alleles=16,
              read_bucket=32, max_reads_per_site=32, val_fraction=0.0)
    train_from_shards(shards, "illumina", str(tmp_path / "plain"),
                      overlap=False, **kw)
    train_from_shards(shards, "illumina", str(tmp_path / "olap"),
                      overlap=True, **kw)
    _params_equal(str(tmp_path / "plain.final.ckpt"),
                  str(tmp_path / "olap.final.ckpt"))


def test_batch_alleles_above_fixed_bucket_widens(tmp_path):
    """A grouping budget above the fixed allele bucket can never pack; the
    trainer widens the buckets instead of crashing mid-epoch."""
    from hello_tpu.train.cli import train_from_shards

    shards = _resume_fixture(tmp_path)
    train_from_shards(shards, "illumina", str(tmp_path / "wide"),
                      num_epochs=1, lr=1e-3, num_devices=2,
                      batch_alleles=64, allele_bucket=8, site_bucket=4,
                      read_bucket=32, max_reads_per_site=16,
                      val_fraction=0.0)
    import os
    assert os.path.exists(str(tmp_path / "wide") + ".final.ckpt")


def test_scorer_params_hot_swap_invalidate(tmp_path):
    """Reassigning scorer.params after use must invalidate the per-device
    weight copies (multi-chip runs would otherwise mix old and new weights)."""
    import jax

    from hello_tpu.pipeline.batching import SiteWork, pack_sites
    from hello_tpu.pipeline.call import load_scorer

    rng = np.random.RandomState(0)
    site = SiteWork("c", 0, 1, ["A"],
                    [rng.randint(0, 255, (3, 150, 6)).astype(np.uint8)],
                    None, np.eye(5, dtype=np.float32)[rng.randint(0, 5, 150)])
    batch = pack_sites([site], hybrid=False)

    s0 = load_scorer("illumina", seed=0)
    e0, _ = s0(batch)
    s1 = load_scorer("illumina", seed=1)
    e1, _ = s1(batch)
    assert not np.array_equal(e0, e1)

    # swap seed-1 weights into the used seed-0 scorer: must now match seed-1
    s0.params, s0.state = s1.params, s1.state
    e_swapped, _ = s0(batch)
    np.testing.assert_array_equal(e_swapped, e1)


def test_prefetch_iter_releases_abandoned_producer():
    """Breaking out of a prefetched epoch early (the multihost any-rank-dry
    path) must stop the producer thread instead of leaving it parked in
    q.put holding the dataset and buffered batches."""
    import threading
    import time

    from hello_tpu.train.cli import prefetch_iter

    produced = []

    def slow_source():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch_iter(slow_source(), depth=2)
    assert next(it) == 0
    it.close()                      # abandon mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000     # producer stopped early


def test_prefetch_iter_propagates_producer_error():
    import pytest

    from hello_tpu.train.cli import prefetch_iter

    def bad_source():
        yield 1
        raise RuntimeError("pack exploded")

    it = prefetch_iter(bad_source())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="pack exploded"):
        list(it)


def test_remat_step_matches_plain_step():
    """jax.checkpoint rematerialisation must not change the training math:
    identical params/batch give identical loss and identical updated
    parameters (remat recomputes the forward, it must not alter it)."""
    from hello_tpu.nn.moe import create_model
    from hello_tpu.parallel.mesh import data_mesh
    from hello_tpu.pipeline.batching import stack_device_batches
    from hello_tpu.train.trainer import Trainer, TrainConfig
    import __graft_entry__ as ge

    model = create_model("illumina")
    batch = ge._example_batch(np.random.RandomState(9), hybrid=False,
                              A=8, R=4, S=4, labels=True)
    stacked = stack_device_batches([batch])
    outs = {}
    for remat in (False, True):
        trainer = Trainer(model, TrainConfig(binary=True, remat=remat),
                          mesh=data_mesh(1), seed=21)
        m = trainer.train_batch(stacked)
        outs[remat] = (m["loss"], trainer.params)
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][1]),
                    jax.tree_util.tree_leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
