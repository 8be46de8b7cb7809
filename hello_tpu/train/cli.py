"""Training CLI: train the MoE model from dumped shards on a device mesh.

Replaces the reference's multi-node DDP trainer entry point
(reference python/MixtureOfExpertsDNNFastDistributed.py:1050-1462): instead of
``--nodes/--rank/--master`` NCCL rendezvous, data parallelism is a sharded
jitted step over all local (or pod, via jax.distributed) devices; shard files
are rank-sharded with equalised epoch lengths for multi-host runs.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time

import jax
import numpy as np

from ..nn.moe import create_model
from ..parallel.mesh import data_mesh
from .loader import SiteDataset, batches, device_batches, shard_files_for_ranks
from .trainer import TrainConfig, Trainer

logger = logging.getLogger(__name__)


def prefetch_iter(it, depth: int = 2):
    """Background-thread batch prefetch: the host-side packing of the next
    ``depth`` batches overlaps the in-flight device step (the reference's
    torch DataLoader workers play this role,
    MixtureOfExpertsDNNFastDistributed.py:269-400).  Exceptions from the
    producer re-raise at the consuming ``next()``.

    Abandoning the generator mid-stream (multihost epochs break as soon as
    ANY rank runs dry; an exception may escape the train step) must not
    leak the producer: closing/exiting the generator sets a stop flag the
    producer polls between puts, releasing the thread and its buffered
    batches — callers should ``close()`` it (or rely on GC finalising the
    generator, which calls the same finally block)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    END, ERR = object(), object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not _put(item):
                    return
                if stop.is_set():   # don't pack one extra discarded batch
                    return
        except BaseException as exc:   # surfaced to the consumer
            _put((ERR, exc))
            return
        _put(END)

    threading.Thread(target=run, daemon=True,
                     name="hello-tpu-train-prefetch").start()

    def gen():
        try:
            while True:
                item = q.get()
                if item is END:
                    return
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] is ERR):
                    raise item[1]
                yield item
        finally:
            stop.set()

    return gen()


def read_file_list(spec: str):
    if spec.endswith(".lst"):
        with open(spec) as fh:
            return [line.strip() for line in fh if line.strip()]
    return sorted(glob.glob(spec))


def model_input_channels(model) -> int:
    """Input channel count of the model's read convolver (6, or 7 with the
    haplotag channel) — the data must be packed to match."""
    for layer in model.nets["read_conv0"].layers:
        if hasattr(layer, "in_channels"):
            return int(layer.in_channels)
    return 6


def train_from_shards(
    files, model_name: str, out_prefix: str,
    num_epochs: int = 10, lr: float = 1e-3, optimizer: str = "Adam",
    batch_alleles: int = 64, num_devices=None,
    val_fraction: float = 0.1, max_reads_per_site: int = 1000,
    read_bucket: int = 64, allele_bucket: int = 64, site_bucket: int = 32,
    t0: int = 10, t_mult: int = 2, min_lr: float = 0.0, warmup: bool = False,
    entropy_regularizer: float = 0.1, entropy_decay: float = 0.5,
    smoothing: float = 0.0, aux_weight: float = 0.0, weight_decay: float = 1e-4,
    seed: int = 13, channels: int = None, resume: str = None,
    coverage_range=None, checkpoint_every: int = 0,
    steps_per_epoch: int = 0, wire: bool = None, remat: bool = False,
    overlap: bool = None,
):
    import jax

    # coded-wire training batches (pipeline/compact.py, expanded on device
    # inside the jitted step): ~6x less host->device staging per step — the
    # same default policy as the inference Scorer (worth it on accelerators,
    # pure overhead on the CPU backend where transfer is free)
    if wire is None:
        env = os.environ.get("HELLO_TPU_COMPACT", "")
        if env in ("0", "1"):
            wire = env == "1"
        else:
            wire = jax.devices()[0].platform not in ("cpu",)
    # Overlapped staging + lag-1 loss sync (accelerators): the prefetch
    # thread device_puts each stacked batch with the step's sharding, and
    # the loop syncs step i's loss while step i+1 is in flight — neither
    # the host->device upload nor the loss readback gates the device
    # (through a remote tunnel both are tens to hundreds of ms; bench.py's
    # sustained train leg measures the difference).  Numerics are
    # unchanged: same batches, same order, same step math.  On CPU the
    # transfer is free, so the plain synchronous loop stays the default.
    if overlap is None:
        overlap = jax.devices()[0].platform not in ("cpu",)

    model = create_model(model_name)
    mesh = data_mesh(num_devices)
    # stack as many per-device batches as THIS PROCESS addresses; the trainer
    # assembles the global array across processes (multi-host)
    n_dev = sum(1 for d in mesh.devices.flat
                if d.process_index == jax.process_index())
    binary = (not model.has_meta)
    if channels is None:
        channels = model_input_channels(model)
    elif channels != model_input_channels(model):
        raise ValueError(
            f"data packed with {channels} channels but model "
            f"{model_name!r} expects {model_input_channels(model)} — "
            "channel count is a property of the model config")
    if steps_per_epoch <= 0 and (optimizer == "SGDR" or warmup):
        # the SGDR/warmup schedules step fractionally per batch (reference
        # LRSchedulers epoch = j + i/len(loader)); estimate the batches per
        # epoch from the shard indexes (sites are cheap to count; ~2 alleles
        # per site is the typical calling-mode density)
        from .store import open_shard
        total_sites = sum(len(open_shard(p)) for p in files)
        per_batch = min(site_bucket, max(1, batch_alleles // 2))
        steps_per_epoch = max(1, -(-total_sites // per_batch))
        logger.info("estimated steps_per_epoch=%d for the LR schedule",
                    steps_per_epoch)
    config = TrainConfig(
        lr=lr, min_lr=min_lr, optimizer=optimizer, weight_decay=weight_decay,
        t0=t0, t_mult=t_mult, warmup=warmup,
        steps_per_epoch=max(steps_per_epoch, 1),
        entropy_regularizer=entropy_regularizer, entropy_decay=entropy_decay,
        smoothing=smoothing, aux_weight=aux_weight, binary=binary,
        remat=remat)
    trainer = Trainer(model, config, mesh=mesh, seed=seed)
    start_epoch, skip_batches = 0, 0
    best_val = float("inf")
    if resume:
        trainer.restore(resume)
        # full-state resume: the per-epoch data order is a pure function of
        # (seed, epoch), so replaying the recorded position restores the
        # exact batch sequence the interrupted run would have seen (the
        # reference restores RNG state and fast-forwards its sampler,
        # AlleleSearcherDNN.py:2105-2203)
        extra = getattr(trainer, "resume_extra", {})
        start_epoch = int(extra.get("epoch", 0))
        skip_batches = int(extra.get("batches_done", 0))
        best_val = float(extra.get("best_val", float("inf")))
        ckpt_seed = extra.get("seed")
        if ckpt_seed is not None and ckpt_seed != seed:
            logger.warning(
                "resume seed mismatch: checkpoint trained with seed %s, "
                "current run uses %s — data order will differ", ckpt_seed, seed)
        logger.info("resumed from %s at step %d (epoch %d, %d batches done)",
                    resume, trainer.step, start_epoch, skip_batches)

    # val_fraction <= 0 means NO holdout (the soak's gate training and other
    # train-on-everything callers); the max(1, ...) floor only applies when
    # a validation split was actually requested
    n_val = (max(1, int(len(files) * val_fraction))
             if len(files) > 1 and val_fraction > 0 else 0)
    val_files = files[:n_val]
    train_files = files[n_val:] or files

    # a grouping budget above the fixed allele bucket can never pack; widen
    # the bucket (and the site bucket proportionally) instead of crashing
    if batch_alleles > allele_bucket:
        logger.info("raising allele_bucket %d -> %d to fit batch_alleles",
                    allele_bucket, batch_alleles)
        site_bucket = max(site_bucket,
                          site_bucket * batch_alleles // allele_bucket)
        allele_bucket = batch_alleles
    fixed = {"read_bucket": read_bucket, "allele_bucket": allele_bucket,
             "site_bucket": site_bucket}
    # rank-0-style scalar telemetry (replaces the reference's TensorBoard
    # writer, MixtureOfExpertsDNNFastDistributed.py:932-939)
    # checkpoints and the metrics stream are RANK 0's job in multi-process
    # runs — every rank writing the same paths races the atomic-replace save
    # (the reference checkpoints on global rank 0 only,
    # MixtureOfExpertsDNNFastDistributed.py:904-907,932-939)
    rank0 = jax.process_index() == 0
    metrics_path = f"{out_prefix}.metrics.jsonl"
    metrics_fh = open(metrics_path, "a") if rank0 else None
    for epoch in range(start_epoch, num_epochs):
        dataset = SiteDataset(train_files, max_reads_per_site,
                              shuffle=True, seed=seed + epoch,
                              coverage_range=coverage_range)
        epoch_loss, n_batches, n_trained = 0.0, 0, 0
        start_t = time.time()
        batch_src = device_batches(dataset, model.hybrid, n_dev,
                                   batch_alleles, channels=channels,
                                   fixed_shape=fixed, wire=wire)
        if overlap:
            # staging runs in the prefetch producer thread (blocking
            # device_put with the step's sharding), so uploads overlap the
            # in-flight step
            batch_src = map(trainer.stage_batches, batch_src)
        batch_iter = prefetch_iter(batch_src)
        multihost = jax.process_count() > 1

        pending = None      # overlap mode: the in-flight step's metrics
        metrics = {}

        def _sync_pending():
            """Sync the previous step's on-device loss (one step behind the
            dispatch, so the readback overlaps the next step).  The
            non-finite forensic dump here is one step LATE: parameters have
            advanced one extra (garbage) step past the offending update —
            the payload is exact, the params are post-NaN."""
            nonlocal pending, epoch_loss, n_trained, metrics
            if pending is None:
                return
            m, payload, step_no = pending
            pending = None
            loss = float(m["loss_device"])
            if not np.isfinite(loss):
                prefix = f"{out_prefix}.step{step_no}.err"
                if jax.process_count() > 1:   # crash dumps must not collide
                    prefix += f".rank{jax.process_index()}"
                trainer.save(f"{prefix}.ckpt")
                import pickle
                with open(f"{prefix}.payload.pkl", "wb") as fh:
                    pickle.dump(jax.tree_util.tree_map(np.asarray, payload),
                                fh)
                raise FloatingPointError(
                    f"non-finite training loss at step {step_no}; "
                    f"post-step params and payload dumped to {prefix}.*")
            epoch_loss += loss
            n_trained += 1
            metrics = {"loss": loss,
                       "per_expert": np.asarray(
                           m["per_expert_device"]).tolist()}

        try:
            while True:
                stacked = next(batch_iter, None)
                if multihost:
                    # every rank must enter the psum collectives the same
                    # number of times per epoch: stop as soon as ANY rank
                    # runs dry (ranks' shard files never split sites
                    # identically)
                    if not trainer.all_ranks_have(stacked is not None):
                        break
                elif stacked is None:
                    break
                n_batches += 1        # absolute position within the epoch
                if skip_batches > 0:
                    # deterministic sampler fast-forward on mid-epoch resume
                    skip_batches -= 1
                    continue
                if overlap:
                    m = trainer.train_batch(stacked, sync=False)
                    _sync_pending()          # previous step, while this runs
                    pending = (m, stacked, trainer.step)
                else:
                    metrics = trainer.train_batch(stacked)
                    epoch_loss += metrics["loss"]
                    n_trained += 1
                if rank0 and checkpoint_every \
                        and trainer.step % checkpoint_every == 0:
                    trainer.save(
                        f"{out_prefix}.step{trainer.step}.ckpt",
                        extra={"epoch": epoch, "batches_done": n_batches,
                               "seed": seed, "best_val": best_val})
            _sync_pending()                  # drain the last in-flight step
        finally:
            # release the prefetch producer (multihost epochs break while
            # the local iterator still has batches; see prefetch_iter)
            batch_iter.close()
        elapsed = time.time() - start_t

        val_loss = None
        if val_files:
            val_ds = SiteDataset(val_files, max_reads_per_site, shuffle=False)
            val_loss = trainer.evaluate(
                batches(val_ds, model.hybrid, batch_alleles, channels=channels,
                        wire=wire))
        logger.info(
            "epoch %d: train_loss=%.4f (%d batches, %.1fs) val_loss=%s",
            epoch, epoch_loss / max(n_trained, 1), n_trained, elapsed,
            f"{val_loss:.4f}" if val_loss is not None else "n/a")
        if rank0:
            metrics_fh.write(json.dumps({
                "epoch": epoch, "step": trainer.step,
                "train_loss": epoch_loss / max(n_trained, 1),
                "val_loss": val_loss, "batches": n_trained,
                "seconds": round(elapsed, 2),
                "per_expert": metrics.get("per_expert") if n_trained else None,
            }) + "\n")
            metrics_fh.flush()

        if val_loss is not None and val_loss < best_val:
            best_val = val_loss
        epoch_extra = {"epoch": epoch + 1, "batches_done": 0,
                       "seed": seed, "best_val": best_val}
        if rank0 and val_loss is not None and val_loss == best_val:
            trainer.save(f"{out_prefix}.best.ckpt", extra=epoch_extra)
        if rank0:
            trainer.save(f"{out_prefix}.epoch{epoch}.ckpt", extra=epoch_extra)
    if rank0:
        trainer.save(f"{out_prefix}.final.ckpt",
                     extra={"epoch": num_epochs, "batches_done": 0,
                            "seed": seed})
        metrics_fh.close()
    return trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="hello_tpu MoE trainer")
    parser.add_argument("--data", required=True,
                        help=".lst file of shard indices, or a glob")
    parser.add_argument("--model", default="hybrid")
    parser.add_argument("--out_prefix", required=True)
    parser.add_argument("--num_epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--optimizer", default="Adam",
                        help="Adam | SGD | SGDR")
    parser.add_argument("--batch_alleles", type=int, default=64)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--val_fraction", type=float, default=0.1)
    parser.add_argument("--max_reads_per_site", type=int, default=1000)
    parser.add_argument("--read_bucket", type=int, default=64)
    parser.add_argument("--entropy_regularizer", type=float, default=0.1)
    parser.add_argument("--entropy_decay", type=float, default=0.5)
    parser.add_argument("--smoothing", type=float, default=0.0)
    parser.add_argument("--aux_loss", type=float, default=0.0)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--warmup", action="store_true")
    parser.add_argument("--T0", type=int, default=10)
    parser.add_argument("--Tmult", type=int, default=2)
    parser.add_argument("--minLr", type=float, default=0.0)
    parser.add_argument("--include_hp", action="store_true",
                        help="assert 7-channel (haplotagged) data; the "
                             "channel count itself derives from --model")
    parser.add_argument("--seed", type=int, default=13)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise the forward in the backward "
                             "(jax.checkpoint): ~37%% slower steps for "
                             "activation-memory headroom (see "
                             "TrainConfig.remat for measured limits)")
    parser.add_argument("--subsample_coverage", default=None,
                        help="LO,HI coverage-fraction range for per-site "
                             "read-thinning augmentation (e.g. 0.3,1.0)")
    parser.add_argument("--resume", default=None,
                        help="checkpoint to resume full training state from")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="also checkpoint every N optimisation steps "
                             "(mid-epoch, resumable at the exact batch)")
    parser.add_argument("--distributed", action="store_true",
                        help="initialise jax.distributed (multi-host pod; "
                             "coordinator via JAX_COORDINATOR_ADDRESS etc.)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of the run here")
    parser.add_argument("--wire", choices=["auto", "0", "1"], default="auto",
                        help="coded-wire training batches (1-byte cells "
                             "expanded on device): auto = on for "
                             "accelerators, off on the CPU backend")
    parser.add_argument("--overlap", choices=["auto", "0", "1"],
                        default="auto",
                        help="stage batches to device on the prefetch "
                             "thread and sync each step's loss one step "
                             "late, overlapping both transfer directions "
                             "with the in-flight step: auto = on for "
                             "accelerators")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from ..parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    if args.distributed:
        # multi-host: replaces the reference's NCCL env:// rendezvous
        # (MixtureOfExpertsDNNFastDistributed.py:928-930).  On recognised
        # clusters (TPU pods, Slurm, MPI) jax autodetects everything; for
        # manual launches the env:// equivalent is JAX_COORDINATOR_ADDRESS +
        # JAX_NUM_PROCESSES + JAX_PROCESS_ID (the reference's
        # MASTER_ADDR/MASTER_PORT/RANK contract).  Plain multi-process CPU
        # needs gloo cross-process collectives.
        kw = {}
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if addr:
            kw = dict(coordinator_address=addr,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
        # config read only — jax.default_backend() would initialise the XLA
        # backend, which must not happen before distributed.initialize()
        if "cpu" in (jax.config.jax_platforms or "").split(","):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(**kw)
        logger.info("jax.distributed: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    files = read_file_list(args.data)
    assert files, f"no shard files found for {args.data}"
    coverage_range = None
    if args.subsample_coverage:
        try:
            lo, hi = (float(x) for x in args.subsample_coverage.split(","))
        except ValueError:
            parser.error("--subsample_coverage expects LO,HI (e.g. 0.3,1.0), "
                         f"got {args.subsample_coverage!r}")
        if not (0 < lo <= hi <= 1):
            parser.error("--subsample_coverage needs 0 < LO <= HI <= 1, "
                         f"got {args.subsample_coverage!r}")
        coverage_range = (lo, hi)
    if args.distributed and jax.process_count() > 1:
        # files are balanced across ranks here; exact per-epoch step-count
        # equalisation happens per batch via Trainer.all_ranks_have
        per_rank, _ = shard_files_for_ranks(files, jax.process_count())
        files = per_rank[jax.process_index()]
        logger.info("rank %d takes %d shard files", jax.process_index(), len(files))
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    train_from_shards(
        files, args.model, args.out_prefix,
        num_epochs=args.num_epochs, lr=args.lr, optimizer=args.optimizer,
        batch_alleles=args.batch_alleles, num_devices=args.num_devices,
        val_fraction=args.val_fraction,
        max_reads_per_site=args.max_reads_per_site,
        read_bucket=args.read_bucket, t0=args.T0, t_mult=args.Tmult,
        min_lr=args.minLr, warmup=args.warmup,
        entropy_regularizer=args.entropy_regularizer,
        entropy_decay=args.entropy_decay, smoothing=args.smoothing,
        aux_weight=args.aux_loss, weight_decay=args.weight_decay,
        seed=args.seed, channels=7 if args.include_hp else None,
        resume=args.resume, coverage_range=coverage_range,
        checkpoint_every=args.checkpoint_every,
        wire=None if args.wire == "auto" else args.wire == "1",
        remat=args.remat,
        overlap=None if args.overlap == "auto" else args.overlap == "1")
    if args.profile_dir:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.profile_dir)
    logger.info("Completed running the script")


if __name__ == "__main__":
    main()
