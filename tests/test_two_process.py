"""TRUE multi-process distributed training: 2 OS processes, CPU backend,
gloo cross-process collectives, rendezvous via the JAX_COORDINATOR_ADDRESS
env contract.

Every other multi-device test runs in ONE process on a virtual mesh; this
one exercises the real cross-process surface the reference's DDP trainer has
by construction (reference python/MixtureOfExpertsDNNFastDistributed.py:
928-930,1462): the coordinator rendezvous, per-rank shard-file assignment,
the per-batch all_ranks_have barrier, psum across process boundaries, and
rank-0 checkpointing — then asserts the final parameters equal a serial
in-process emulation of the same two rank streams on a 2-device mesh.

(Sharded CALLING across processes has no cross-process communication at all
— each host writes its VCF shard and the merge is a file operation — so the
in-process two-host tests in test_multihost.py are exact for it.)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "two_process_worker.py")

# failure signatures that mean "this environment cannot run 2-process jax
# CPU collectives" (acceptable skip per the build plan) rather than a bug
_ENV_MARKERS = ("coordinator", "gloo", "collective", "UNIMPLEMENTED",
                "distributed runtime", "DEADLINE_EXCEEDED")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_shards(tmp_path, n_files=4, sites_per_file=10):
    from hello_tpu.pipeline.batching import SiteWork
    from hello_tpu.train.store import write_shards

    rng = np.random.RandomState(5)

    def site(i):
        n0, n1 = int(rng.randint(3, 12)), int(rng.randint(3, 12))
        return SiteWork(
            chromosome="chr1", start=100 + 10 * i, stop=101 + 10 * i,
            alleles=["A", "C"],
            tensors0=[rng.randint(0, 255, (n0, 150, 6)).astype(np.uint8),
                      rng.randint(0, 255, (n1, 150, 6)).astype(np.uint8)],
            tensors1=None, ref_segment=np.eye(5, dtype=np.float32)[
                rng.randint(0, 5, 150)],
            labels=[1, 0], site_label=0)

    total = n_files * sites_per_file
    return write_shards(iter([site(i) for i in range(total)]),
                        str(tmp_path / "shards"),
                        sites_per_shard=sites_per_file)


EPOCHS = 2
BATCH_ALLELES = 16


def _run_two_processes(files, out_dir):
    port = _free_port()
    procs = []
    logs = []
    data_glob = os.path.join(os.path.dirname(files[0]), "*.index")
    for rank in range(2):
        env = dict(os.environ)
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(rank))
        log = open(os.path.join(out_dir, f"rank{rank}.log"), "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--data", data_glob, "--model", "illumina",
             "--out_prefix", os.path.join(out_dir, "dist"),
             "--num_epochs", str(EPOCHS),
             "--batch_alleles", str(BATCH_ALLELES),
             "--distributed"],
            env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO))
    rcs = [p.wait(timeout=900) for p in procs]
    outs = []
    for log in logs:
        log.seek(0)
        outs.append(log.read())
        log.close()
    return rcs, outs


def _emulate_serial(files):
    """Serial single-process emulation of the exact 2-rank run: same per-rank
    file shards, same per-rank loader streams and seeds, same barrier, on a
    2-virtual-device mesh (cli.train_from_shards semantics, one rank per
    device slot)."""
    import jax

    from hello_tpu.nn.moe import create_model
    from hello_tpu.parallel.mesh import data_mesh
    from hello_tpu.train.cli import model_input_channels
    from hello_tpu.train.loader import (SiteDataset, device_batches,
                                        shard_files_for_ranks)
    from hello_tpu.train.trainer import TrainConfig, Trainer

    per_rank, _ = shard_files_for_ranks(files, 2)
    # each rank's train_from_shards does ITS OWN val split on its file list
    rank_train = []
    for rf in per_rank:
        n_val = max(1, int(len(rf) * 0.1)) if len(rf) > 1 else 0
        rank_train.append(rf[n_val:] or rf)

    model = create_model("illumina")
    config = TrainConfig(lr=1e-3, optimizer="Adam", steps_per_epoch=1,
                         binary=(not model.has_meta))
    trainer = Trainer(model, config, mesh=data_mesh(2), seed=13)
    fixed = {"read_bucket": 64, "allele_bucket": 64, "site_bucket": 32}
    channels = model_input_channels(model)
    for epoch in range(EPOCHS):
        iters = [iter(device_batches(
                    SiteDataset(rt, 1000, shuffle=True, seed=13 + epoch),
                    model.hybrid, 1, BATCH_ALLELES, channels=channels,
                    fixed_shape=fixed))
                 for rt in rank_train]
        while True:
            stacked = [next(it, None) for it in iters]
            if any(s is None for s in stacked):     # all_ranks_have barrier
                break
            both = jax.tree_util.tree_map(
                lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
                stacked[0], stacked[1])
            trainer.train_batch(both)
    return trainer


def test_two_process_train_matches_serial(tmp_path):
    files = _make_shards(tmp_path)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    rcs, outs = _run_two_processes(files, out_dir)
    if any(rc != 0 for rc in rcs):
        blob = "\n".join(outs)
        if any(m.lower() in blob.lower() for m in _ENV_MARKERS):
            pytest.skip("2-process jax.distributed unsupported here: "
                        + blob[-2000:])
        raise AssertionError(f"distributed run failed (rcs={rcs}):\n"
                             + blob[-4000:])
    # rendezvous really happened: both ranks saw 2 processes
    assert "process 0/2" in outs[0], outs[0][-2000:]
    assert "process 1/2" in outs[1], outs[1][-2000:]

    ckpt = os.path.join(out_dir, "dist.final.ckpt")
    assert os.path.exists(ckpt), os.listdir(out_dir)
    from hello_tpu.train.checkpoint import load_full_checkpoint
    got = load_full_checkpoint(ckpt)

    ref = _emulate_serial(files)
    assert got["step"] == ref.step and ref.step > 0
    import jax
    for (pa, a), (_pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got["params"]),
            jax.tree_util.tree_leaves_with_path(ref.params)):
        # gloo's cross-process sum may differ from the single-process XLA
        # psum in the last ulp, and Adam's m/(sqrt(v)+eps) early updates are
        # near-sign-functions of the gradient, so ulp-level gradient noise
        # grows to ~1e-5 absolute / ~1e-3 relative on small bias leaves
        # after a few steps.  A missing/incorrect psum or an unsharded batch
        # trains on different data and shows up as O(1) relative error on
        # many leaves — far above this tolerance.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pa)}")

    # behavioural equivalence: both parameter sets must score a fixed batch
    # to near-identical logits
    import __graft_entry__ as ge
    from hello_tpu.nn.moe import create_model

    model = create_model("illumina")
    batch = ge._example_batch(np.random.RandomState(3), hybrid=False)
    out_a, _ = model.apply(got["params"], got["state"] or {}, batch)
    out_b, _ = model.apply(ref.params, ref.state or {}, batch)
    np.testing.assert_allclose(np.asarray(out_a["experts"]),
                               np.asarray(out_b["experts"]),
                               rtol=1e-3, atol=1e-4)
