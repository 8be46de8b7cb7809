"""Chromosome-scale capacity soak: generate a >=100 Mb dataset with a
multi-GB sorted BAM (streaming, bounded memory), run the production
worker-pool caller end-to-end, and record peak RSS, sustained windows/s and
BAI region-open latency into SOAK.md / SOAK.json.

This is the evidence for BASELINE config 5's scale assumptions (whole-genome
calling decomposed into chunks, reference python/call.py:125): memory must
stay bounded by the chunked decomposition — never by whole-file residency —
and throughput must hold at two orders of magnitude more sequence than the
benchmark region.

Usage: python -m hello_tpu.pipeline.soak [--mb 100] [--coverage 30]
           [--workers 4] [--out SOAK.md]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import threading
import time

import numpy as np


def _tree_rss_mb() -> float:
    """Total resident set of this process and every descendant, in MB."""
    try:
        import psutil
        p = psutil.Process()
        procs = [p] + p.children(recursive=True)
        total = 0
        for q in procs:
            try:
                total += q.memory_info().rss
            except Exception:
                pass
        return total / 1e6
    except ImportError:
        pass
    # /proc fallback: walk pids, sum VmRSS of self + descendants
    me = os.getpid()
    ppids, rss = {}, {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as fh:
                fields = dict(line.split(":", 1) for line in fh
                              if ":" in line)
            ppids[int(pid)] = int(fields.get("PPid", "0").strip() or 0)
            rss[int(pid)] = int(fields.get("VmRSS", "0 kB").split()[0])
        except Exception:
            continue
    mine = {me}
    changed = True
    while changed:
        changed = False
        for pid, pp in ppids.items():
            if pp in mine and pid not in mine:
                mine.add(pid)
                changed = True
    return sum(rss.get(pid, 0) for pid in mine) / 1e3


class RssSampler(threading.Thread):
    def __init__(self, interval: float = 1.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak_mb = 0.0
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            self.peak_mb = max(self.peak_mb, _tree_rss_mb())
            self._halt.wait(self.interval)

    def stop(self):
        self._halt.set()
        self.join(timeout=5)
        return self.peak_mb


def generate_streaming(outdir: str, total_bases: int, chrom_bases: int,
                       coverage: float, read_length: int, seed: int,
                       variants_per_mb: int = 3200):
    """Build ref.fa + truth.vcf + one sorted+indexed illumina BAM spanning
    ``total_bases`` across ``total_bases // chrom_bases`` chromosomes,
    generating and writing one chromosome at a time so memory stays bounded
    by a single chromosome's reads, not the whole file."""
    from .. import sim
    from ..io.bam import BamStreamWriter
    from ..io.vcf import VcfRecord, write_vcf

    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(seed)
    n_chroms = max(1, total_bases // chrom_bases)
    names = [f"chrS{i + 1}" for i in range(n_chroms)]
    lengths = {}

    # pass 1: reference (chromosome sequences are regenerated per pass from
    # per-chromosome seeds so only one sequence is alive at a time)
    chrom_seeds = [rng.randrange(2 ** 60) for _ in names]

    def chrom_seq(i):
        return sim.random_reference(chrom_bases, random.Random(chrom_seeds[i]))

    fasta_path = os.path.join(outdir, "ref.fa")
    with open(fasta_path, "w") as fh:
        for i, name in enumerate(names):
            seq = chrom_seq(i)
            lengths[name] = len(seq)
            fh.write(f">{name}\n")
            for j in range(0, len(seq), 80):
                fh.write(seq[j:j + 80] + "\n")
    # .fai sidecar via the fasta writer's convention
    from ..io.fasta import FastaFile
    FastaFile(fasta_path)          # builds/validates the index

    n_var = max(1, int(variants_per_mb * chrom_bases / 1e6))
    bam_path = os.path.join(outdir, "illumina.bam")
    truth_records = []
    writer = BamStreamWriter(bam_path, [(n, lengths[n]) for n in names])
    t0 = time.time()
    total_reads = 0
    for i, name in enumerate(names):
        crng = random.Random(chrom_seeds[i] ^ 0xBEEF)
        seq = chrom_seq(i)
        variants = sim.plant_variants(seq, n_var, crng)
        # varied per-base qualities: real BAM quality strings are
        # high-entropy (most of a real file's compressed bytes), so the
        # soak's file size is honest only with non-constant quals
        reads = sim.simulate_reads(seq, variants, name, coverage,
                                   read_length, crng, qual=(20, 40),
                                   name_prefix=f"il_{name}_")
        writer.add_reads(reads)
        total_reads += len(reads)
        for v in variants:
            truth_records.append(VcfRecord(name, v.position, v.ref, [v.alt],
                                           (v.genotype[0], v.genotype[1]),
                                           qual=50.0))
        del reads, seq, variants
    writer.close()
    truth_path = os.path.join(outdir, "truth.vcf")
    write_vcf(truth_path, truth_records, contigs=lengths)
    gen_s = time.time() - t0
    return {
        "fasta": fasta_path, "bam": bam_path, "truth": truth_path,
        "chromosomes": names, "lengths": lengths, "reads": total_reads,
        "bam_bytes": os.path.getsize(bam_path),
        "truth_variants": len(truth_records), "generation_s": round(gen_s, 1),
    }


def measure_bai_latency(bam_path: str, lengths: dict, n: int = 20,
                        span: int = 200_000, seed: int = 7):
    """Open-time of indexed region fetches at random loci (the O(region)
    guarantee the BAI work exists for)."""
    from .. import native

    rng = random.Random(seed)
    names = list(lengths)
    times = []
    for _ in range(n):
        name = rng.choice(names)
        start = rng.randrange(0, max(1, lengths[name] - span))
        t0 = time.perf_counter()
        bam = native.NativeBam(bam_path, region=(name, start, start + span))
        _ = bam.ref_starts.shape[0]   # region records are decoded at open
        del bam
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "n": n, "span": span,
        "p50_ms": round(1e3 * statistics.median(times), 2),
        "p95_ms": round(1e3 * times[int(0.95 * (n - 1))], 2),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=int, default=100)
    parser.add_argument("--chrom_mb", type=int, default=10)
    parser.add_argument("--coverage", type=float, default=30.0)
    # cpus + 2, capped at 8: the worker-oversubscription policy bench.py's
    # pipeline leg A/B'd on small hosts (workers block on BAM IO and IPC
    # enough that modest oversubscription keeps cores busy)
    parser.add_argument("--workers", type=int,
                        default=min(8, (os.cpu_count() or 2) + 2))
    parser.add_argument("--dir", default="/tmp/hello_tpu_soak")
    parser.add_argument("--out", default="SOAK.md")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--keep", action="store_true",
                        help="keep the generated dataset")
    parser.add_argument("--reuse", action="store_true",
                        help="reuse an existing dataset in --dir (from a "
                             "previous --keep run); implies --keep")
    parser.add_argument("--untrained", action="store_true",
                        help="skip the gate-checkpoint training step and "
                             "call with random weights (capacity-only soak)")
    parser.add_argument("--gate_checkpoint", default=None,
                        help="reuse an existing gate checkpoint instead of "
                             "retraining (call-phase reruns)")
    parser.add_argument("--train_mb", type=int, default=2,
                        help="Mb of the first chromosome to dump+train the "
                             "accuracy-gate checkpoint on")
    parser.add_argument("--gen_only", action="store_true",
                        help="generate the dataset and stop (pair with "
                             "--reuse later); implies --keep")
    args = parser.parse_args(argv)

    sampler = RssSampler()
    sampler.start()

    meta_path = os.path.join(args.dir, "soak_meta.json")
    if args.reuse and os.path.exists(meta_path):
        with open(meta_path) as fh:
            ds = json.load(fh)
        print(f"reusing dataset under {args.dir}", flush=True)
    else:
        print(f"generating {args.mb} Mb dataset under {args.dir} ...",
              flush=True)
        ds = generate_streaming(args.dir, args.mb * 1_000_000,
                                args.chrom_mb * 1_000_000, args.coverage, 120,
                                args.seed)
        with open(meta_path, "w") as fh:
            json.dump(ds, fh)
    if args.gen_only:
        sampler.stop()
        print(json.dumps({"generated": ds["bam_bytes"],
                          "generation_s": ds["generation_s"]}), flush=True)
        return
    gen_peak_mb = sampler.peak_mb
    print(f"dataset: {ds['bam_bytes'] / 1e9:.2f} GB BAM, {ds['reads']} reads, "
          f"{ds['truth_variants']} variants in {ds['generation_s']}s "
          f"(gen peak RSS {gen_peak_mb:.0f} MB)", flush=True)

    bai = measure_bai_latency(ds["bam"], ds["lengths"])
    print(f"BAI region open: p50 {bai['p50_ms']} ms, p95 {bai['p95_ms']} ms",
          flush=True)

    from ..parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    # the production precision (call.py's CLI default) — without this the
    # soak measured the f32 path: ~2x device time AND a separate compile
    # cache namespace, so no prior production run pre-warms its shapes
    from ..nn import layers
    layers.set_precision(os.environ.get("HELLO_TPU_PRECISION", "bf16"))
    from .call import load_scorer
    from .parallel_call import HostWorkerPool, call_parallel

    # Train a real checkpoint on a small slice of the dataset first (unless
    # --untrained): the soak's calling accuracy is then a genotype-level
    # correctness gate at planted-truth scale, not a random-weight smoke.
    # The slice is disjoint in reads (fresh dump of the first chromosome's
    # head) but same simulator statistics — the generalization setting of
    # tests/test_train_call_cycle.py.
    checkpoint = None
    train_s = None
    if args.gate_checkpoint:
        checkpoint = args.gate_checkpoint
        print(f"reusing gate checkpoint {checkpoint}", flush=True)
    elif not args.untrained:
        from ..io.fasta import FastaFile
        from ..train.cli import train_from_shards
        from .dump import dump_region

        t0 = time.perf_counter()
        slice_stop = min(args.train_mb * 1_000_000,
                         ds["lengths"][ds["chromosomes"][0]])
        chrom0 = ds["chromosomes"][0]
        bed = os.path.join(args.dir, "train_slice.bed")
        with open(bed, "w") as fh:
            fh.write(f"{chrom0}\t0\t{slice_stop}\n")
        ref = FastaFile(ds["fasta"])
        shards = dump_region([ds["bam"]], ref, chrom0, 0, slice_stop,
                             ds["truth"], bed,
                             os.path.join(args.dir, "train_dump"))
        train_from_shards(shards, "illumina",
                          os.path.join(args.dir, "soak_model"),
                          num_epochs=4, lr=1e-3, num_devices=1,
                          batch_alleles=32, read_bucket=64,
                          max_reads_per_site=48, val_fraction=0.0)
        checkpoint = os.path.join(args.dir, "soak_model.final.ckpt")
        train_s = time.perf_counter() - t0
        print(f"trained gate checkpoint on {chrom0}:0-{slice_stop} "
              f"in {train_s:.0f}s", flush=True)

    scorer = load_scorer("illumina", checkpoint)
    pool = HostWorkerPool(args.workers)
    pool.wait_ready()
    call_peak_before = sampler.peak_mb
    # tunnel-phase probes bracketing the call phase (bench.py's policy): the
    # sustained rate is upload-bandwidth-bound through the remote tunnel, so
    # a degraded-phase capture must be self-explaining
    from ..telemetry import tunnel_health
    tunnel_before = tunnel_health(seed=41)
    print(f"tunnel before call: {tunnel_before}", flush=True)
    stats = {}
    t0 = time.perf_counter()
    try:
        call_parallel([ds["bam"]], ds["fasta"], scorer,
                      os.path.join(args.dir, "calls.vcf"), pool=pool,
                      stats=stats)
    finally:
        pool.shutdown()
    wall = time.perf_counter() - t0
    tunnel_after = tunnel_health(seed=42)
    print(f"tunnel after call: {tunnel_after}", flush=True)
    peak_mb = sampler.stop()
    sites = stats.get("sites", 0)
    rate = sites / wall if wall else 0.0

    # Calling accuracy vs the planted truth: the soak is a CORRECTNESS gate,
    # not just a capacity gate — at 100 Mb a spill/merge or wire bug that
    # drops 0.1% of records would otherwise pass unnoticed (the truth
    # machinery role of reference trainDataTools.py:356-399).  With the
    # default trained gate checkpoint these numbers gate GENOTYPES at
    # planted-truth scale; under --untrained (random weights) only the
    # candidate-level gates are meaningful: recall of planted sites and
    # zero representation-level corruption.
    from .evaluate import evaluate
    t0 = time.perf_counter()
    accuracy = evaluate(os.path.join(args.dir, "calls.vcf"), ds["truth"],
                        ds["fasta"])
    eval_s = time.perf_counter() - t0
    print(f"accuracy vs planted truth ({eval_s:.0f}s): "
          f"{accuracy['all']}", flush=True)

    result = {
        "total_mb": args.mb, "coverage": args.coverage,
        "workers": args.workers,
        "bam_gb": round(ds["bam_bytes"] / 1e9, 3),
        "reads": ds["reads"], "truth_variants": ds["truth_variants"],
        "generation_s": ds["generation_s"],
        "bai_open_p50_ms": bai["p50_ms"], "bai_open_p95_ms": bai["p95_ms"],
        "call_wall_s": round(wall, 1), "scorable_sites": sites,
        "sustained_windows_per_s": round(rate, 1),
        "tunnel_before": tunnel_before, "tunnel_after": tunnel_after,
        "peak_rss_mb": round(peak_mb, 0),
        "peak_rss_vs_bam": round(peak_mb * 1e6 / ds["bam_bytes"], 3),
        "stages": {k: round(v, 2) for k, v in stats.items()
                   if k.endswith("_s")},
        "gate_checkpoint": checkpoint, "gate_train_s": (
            round(train_s, 1) if train_s is not None else None),
        "accuracy": accuracy,
    }
    with open(args.out.replace(".md", ".json"), "w") as fh:
        json.dump(result, fh, indent=1)
    with open(args.out, "w") as fh:
        fh.write(f"""# Capacity soak — {args.mb} Mb, {args.coverage:.0f}x

Simulated {args.mb} Mb over {len(ds['chromosomes'])} chromosomes at
{args.coverage:.0f}x ({ds['bam_bytes'] / 1e9:.2f} GB sorted+indexed BAM,
{ds['reads']:,} reads, {ds['truth_variants']:,} planted variants;
generated streaming in {ds['generation_s']}s), then ran the production
worker-pool caller (`pipeline/parallel_call.py`, {args.workers} workers)
end-to-end.

| metric | value |
|---|---|
| BAM size | {ds['bam_bytes'] / 1e9:.2f} GB |
| BAI region open (200 kb) | p50 {bai['p50_ms']} ms / p95 {bai['p95_ms']} ms |
| calling wall time | {wall:.1f} s |
| scorable sites | {sites:,} |
| sustained throughput | {rate:,.0f} windows/s |
| tunnel phase (up MB/s before/after) | {tunnel_before['up_mbps']} / {tunnel_after['up_mbps']} (rtt {tunnel_before['rtt_ms']}/{tunnel_after['rtt_ms']} ms) |
| peak tree RSS (whole run incl. generation) | {peak_mb:.0f} MB |
| peak RSS / BAM size | {result['peak_rss_vs_bam']:.2f} |
| main-loop stages (s) | {result['stages']} |
| accuracy vs planted truth (all) | {accuracy['all']} |
| accuracy: snv / ins / del | {accuracy['snv']} / {accuracy['ins']} / {accuracy['del']} |
| gate checkpoint | {'untrained (capacity-only run)' if checkpoint is None
                    else (f"trained on {args.train_mb} Mb in {train_s:.0f}s"
                          if train_s is not None
                          else f"reused {checkpoint}")} |

Memory stays bounded by the chunked decomposition (region-indexed BAI
fetches, one genome chunk per worker at a time), not by file size: peak
RSS is a fixed working set, no whole-file residency.  The accuracy row
makes the soak a correctness gate at planted-truth scale: a spill/merge or
wire bug dropping records would surface as recall loss here.
""")
    print(json.dumps(result), flush=True)
    if not (args.keep or args.reuse or args.gen_only):
        import shutil
        shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
