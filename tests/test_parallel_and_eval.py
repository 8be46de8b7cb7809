"""Tests for the process-parallel caller and the evaluation tooling."""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.io.vcf import read_vcf, write_vcf
from hello_tpu.pipeline.call import call_region
from hello_tpu.pipeline.evaluate import evaluate
from hello_tpu.pipeline.parallel_call import host_sites_for_chunk, make_chunks

from test_pipeline_e2e import OracleScorer, canonical_map, normalize_gt


def test_host_sites_for_chunk_matches_inline(tmp_path):
    """The worker-side host stage must produce the same sites as the inline
    path (same count, positions, alleles)."""
    ds = sim.make_dataset(str(tmp_path), ref_length=20000, num_variants=30,
                          coverage=30, read_length=120, seed=41)
    sites = host_sites_for_chunk([ds.bams["illumina"]], ds.fasta,
                                 ds.chromosome, 0, 20000, {})
    truth_positions = {v.position for v in ds.variants}
    got_spans = [(s.start, s.stop) for s in sites]
    # every truth variant is inside some generated site span
    for p in truth_positions:
        assert any(a <= p < b for a, b in got_spans), p


def test_make_chunks():
    regions = [("chr1", 0, 450_000), ("chr2", 100, 200)]
    chunks = list(make_chunks(regions, 200_000))
    assert chunks == [("chr1", 0, 200_000), ("chr1", 200_000, 400_000),
                      ("chr1", 400_000, 450_000), ("chr2", 100, 200)]


def test_evaluate_oracle_calls_are_perfect(tmp_path):
    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=12,
                          coverage=30, read_length=120, seed=7)
    ref = FastaFile(ds.fasta)
    records = call_region([ds.bams["illumina"]], ref, ds.chromosome, 0,
                          ref.length(ds.chromosome), OracleScorer())
    calls_vcf = str(tmp_path / "calls.vcf")
    write_vcf(calls_vcf, records, contigs={ds.chromosome: 6000})

    metrics = evaluate(calls_vcf, ds.truth_vcf, ds.fasta)
    assert metrics["all"]["precision"] == 1.0
    assert metrics["all"]["recall"] == 1.0
    assert metrics["all"]["gt_mismatch"] == 0


def test_evaluate_detects_errors(tmp_path):
    """Dropping a truth variant from the calls must show up as FN; adding a
    fake one as FP."""
    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=10,
                          coverage=30, read_length=120, seed=3)
    ref = FastaFile(ds.fasta)
    records = call_region([ds.bams["illumina"]], ref, ds.chromosome, 0,
                          ref.length(ds.chromosome), OracleScorer())
    # drop one, fabricate one
    dropped = records[:-1]
    from hello_tpu.io.vcf import VcfRecord
    fake_pos = 5500
    fake = VcfRecord(ds.chromosome, fake_pos, ref.fetch(ds.chromosome, fake_pos, fake_pos + 1),
                     ["T" if ref.fetch(ds.chromosome, fake_pos, fake_pos + 1) != "T" else "A"],
                     (0, 1), qual=50.0)
    calls_vcf = str(tmp_path / "calls.vcf")
    write_vcf(calls_vcf, dropped + [fake], contigs={ds.chromosome: 6000})
    metrics = evaluate(calls_vcf, ds.truth_vcf, ds.fasta)
    assert metrics["all"]["fn"] >= 1
    assert metrics["all"]["fp"] >= 1


def test_determine_max_q_loss(tmp_path):
    import math

    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.pipeline.evaluate import determine_max_q_loss
    from hello_tpu.train.store import ShardReader

    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=10,
                          coverage=30, read_length=120, seed=5)
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t6000\n")
    ref = FastaFile(ds.fasta)
    shards = dump_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 6000,
                         ds.truth_vcf, bed, str(tmp_path / "d"))
    q = determine_max_q_loss(shards)

    # hand-compute the reference determineMaxQLoss.py semantics:
    # mean over sites of (0 if site_label==0 else -ln 0.5)
    n_sites = n_het = 0
    for path in shards:
        for site in ShardReader(path):
            n_sites += 1
            n_het += int(site.site_label == 1)
    assert n_sites > 0
    expected = n_het * -math.log(0.5) / n_sites
    assert abs(q - expected) < 1e-12
    # a diploid sim with het variants must have some -ln(0.5) sites
    assert 0 < q <= -math.log(0.5)


def test_vectorized_decode_matches_scalar(rng):
    """The vectorised pair-probability decode must match the per-pair scalar
    reference implementation."""
    from hello_tpu.nn.genotype import (decode_site,
                                       expert_pair_probabilities)

    for n in (1, 2, 3, 5, 8):
        alleles = [f"A{i}" for i in range(n)]
        logits = rng.randn(n, 3).astype(np.float32) * 3
        meta = rng.rand(3).astype(np.float32)
        meta /= meta.sum()
        combined, per_expert, meta_used = decode_site(logits, meta, alleles)

        sig = 1.0 / (1.0 + np.exp(-logits))
        for k in range(3):
            scalar = expert_pair_probabilities(sig[:, k], alleles)
            assert set(scalar) == set(per_expert[k])
            for pair, p in scalar.items():
                np.testing.assert_allclose(p, per_expert[k][pair],
                                           rtol=1e-5, atol=1e-7)
        for pair in combined:
            expected = sum(meta[k] * per_expert[k][pair] for k in range(3))
            np.testing.assert_allclose(combined[pair], expected, rtol=1e-5)


def test_fast_decode_matches_full(rng):
    """decode_batch(full=False) — the plain-calling fast path — must produce
    the identical best pair / probability / quality as the full decode,
    including on exact probability ties (same (p, pair) max semantics)."""
    from hello_tpu.nn.genotype import decode_batch
    from hello_tpu.pipeline.batching import SiteWork

    for e_dim, with_meta in ((1, False), (3, True)):
        sites, index, logits_rows, metas = [], [], [], []
        slot = 0
        for si, n in enumerate((1, 2, 3, 5, 8)):
            alleles = [f"chr1_{si}_{chr(ord('A') + i)}" for i in range(n)]
            sites.append(SiteWork("chr1", 100 + si, 101 + si, alleles,
                                  [np.zeros((1, 150, 6), np.uint8)] * n))
            for ai in range(n):
                index.append((si, ai))
                slot += 1
            metas.append(rng.rand(3).astype(np.float32))
        experts = (rng.randn(slot, e_dim).astype(np.float32) * 3)
        # saturate some logits so sigmoids hit exactly 0.0/1.0 in f32 and
        # several pairs tie at identical probabilities
        experts[: min(4, slot)] = 40.0
        meta = np.stack(metas) if with_meta else None

        full = decode_batch(experts, meta, index, sites, full=True)
        fast = decode_batch(experts, meta, index, sites, full=False)
        for f, s in zip(full, fast):
            assert f["best_pair"] == s["best_pair"]
            assert f["probability"] == s["probability"]
            assert f["quality"] == s["quality"]
            assert s["site"] is f["site"]


def test_failure_analysis_joins_features(tmp_path):
    """FP/FN variants are joined with the persisted per-site expert features
    (the reference evaluator.py Stepper/Analyzer role)."""
    from hello_tpu.pipeline.call import call_genome, load_scorer
    from hello_tpu.pipeline.failure_analysis import analyze, main as fa_main

    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=8,
                          coverage=30, read_length=120, seed=11)
    out = str(tmp_path / "calls.vcf")
    # untrained weights: calls will disagree with truth, producing failures
    call_genome([ds.bams["illumina"]], ds.fasta, load_scorer("illumina"), out,
                regions=[(ds.chromosome, 0, 6000)], provide_experts=True)

    failures = analyze(out, ds.truth_vcf, ds.fasta,
                       str(tmp_path / "calls.features.pkl"))
    assert failures, "untrained model should produce at least one failure"
    kinds = {f["kind"] for f in failures}
    assert kinds <= {"FN", "FP", "GT"}
    joined = [f for f in failures if f["num_candidate_sites"] >= 1]
    # truth variants sit on detected hotspots, so FN/GT failures must join
    assert joined, failures
    site = joined[0]["sites"][0]
    assert {"alleles", "meta", "experts", "experts_disagree",
            "called_pair", "quality"} <= set(site)
    assert len(site["experts"]) == 3
    assert abs(sum(site["meta"]) - 1.0) < 1e-3

    # CLI surface writes JSONL
    out_jsonl = str(tmp_path / "failures.jsonl")
    fa_main(["--calls", out, "--truth", ds.truth_vcf, "--ref", ds.fasta,
             "--features", str(tmp_path / "calls.features.pkl"),
             "--out", out_jsonl])
    import json
    lines = [json.loads(l) for l in open(out_jsonl).read().splitlines()]
    assert len(lines) == len(failures)


def test_call_parallel_matches_inline_vcf(tmp_path):
    """The worker-pool caller (with cross-chunk site buffering) must produce
    the same VCF as the inline caller.  Runs in a subprocess because
    call_parallel's spawn workers need an importable __main__."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import jax
jax.config.update("jax_platforms", "cpu")
from hello_tpu import sim
from hello_tpu.pipeline.call import call_genome, load_scorer

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=30000, num_variants=25,
                          coverage=30, read_length=120, seed=31)
    scorer = load_scorer("illumina")
    call_genome([ds.bams["illumina"]], ds.fasta, scorer,
                out_dir + "/inline.vcf", regions=[(ds.chromosome, 0, 30000)])
    from hello_tpu.pipeline.parallel_call import HostWorkerPool, call_parallel
    call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                  out_dir + "/parallel.vcf", num_workers=2, chunk_size=8000,
                  regions=[(ds.chromosome, 0, 30000)])
    # persistent pool reused across two invocations (production amortisation)
    with HostWorkerPool(2) as pool:
        pool.wait_ready()
        for name in ("pooled1.vcf", "pooled2.vcf"):
            call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                          out_dir + "/" + name, pool=pool, chunk_size=8000,
                          regions=[(ds.chromosome, 0, 30000)])
    print("DRIVER_OK")
""")
    env = dict(__import__('os').environ)
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=600, env=env)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]

    from hello_tpu.io.vcf import read_vcf
    inline = [(r.chromosome, r.position, r.ref, tuple(r.alt), tuple(r.gt))
              for r in read_vcf(str(tmp_path / "inline.vcf"))]
    par = [(r.chromosome, r.position, r.ref, tuple(r.alt), tuple(r.gt))
           for r in read_vcf(str(tmp_path / "parallel.vcf"))]
    assert inline, "inline caller produced no records"
    assert par == inline
    for name in ("pooled1.vcf", "pooled2.vcf"):
        pooled = [(r.chromosome, r.position, r.ref, tuple(r.alt), tuple(r.gt))
                  for r in read_vcf(str(tmp_path / name))]
        assert pooled == inline


def test_call_parallel_retries_transient_chunk_failure(tmp_path):
    """Recovery model parity: a chunk that fails once (injected transient
    fault) is retried and the run completes with the full call set."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
from hello_tpu import sim
from hello_tpu.pipeline.call import call_genome, load_scorer

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=24000, num_variants=30,
                          coverage=30, read_length=120, seed=55)
    scorer = load_scorer("illumina")
    call_genome([ds.bams["illumina"]], ds.fasta, scorer,
                out_dir + "/inline.vcf", regions=[(ds.chromosome, 0, 24000)])
    from hello_tpu.pipeline.parallel_call import call_parallel
    call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                  out_dir + "/retried.vcf", num_workers=2, chunk_size=8000,
                  regions=[(ds.chromosome, 0, 24000)],
                  fail_once_marker=out_dir + "/fault.marker")
    print("DRIVER_OK")
""")
    env = dict(__import__('os').environ)
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=600, env=env)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]
    assert (tmp_path / "fault.marker").exists()   # the fault actually fired

    from hello_tpu.io.vcf import read_vcf
    key = lambda r: (r.chromosome, r.position, r.ref, tuple(r.alt),
                     tuple(r.gt))
    inline = [key(r) for r in read_vcf(str(tmp_path / "inline.vcf"))]
    retried = [key(r) for r in read_vcf(str(tmp_path / "retried.vcf"))]
    assert inline and sorted(retried) == sorted(inline)


def test_call_parallel_hybrid_multichrom(tmp_path):
    """Worker-pool soak on the heaviest configuration: hybrid
    Illumina+PacBio input spanning two chromosomes, sub-chromosome chunks,
    compared against the inline caller record-for-record."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.pipeline.call import call_genome, load_scorer

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=40000, num_variants=60,
                          coverage=28, read_length=120, seed=91,
                          platforms=("illumina", "pacbio"),
                          pacbio_read_length=1200, num_chromosomes=2)
    ref = FastaFile(ds.fasta)
    regions = [(c, 0, ref.length(c)) for c in ref.chromosomes()]
    bams = [ds.bams["illumina"], ds.bams["pacbio"]]
    scorer = load_scorer("hybrid")
    call_genome(bams, ds.fasta, scorer, out_dir + "/inline.vcf",
                regions=regions)
    from hello_tpu.pipeline.parallel_call import call_parallel
    call_parallel(bams, ds.fasta, scorer, out_dir + "/parallel.vcf",
                  num_workers=2, chunk_size=9000, regions=regions)
    print("DRIVER_OK")
""")
    env = dict(__import__('os').environ)
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=900, env=env)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]

    from hello_tpu.io.vcf import read_vcf
    key = lambda r: (r.chromosome, r.position, r.ref, tuple(r.alt),
                     tuple(r.gt))
    inline = [key(r) for r in read_vcf(str(tmp_path / "inline.vcf"))]
    par = [key(r) for r in read_vcf(str(tmp_path / "parallel.vcf"))]
    chroms = {c for c, *_ in inline}
    assert len(chroms) == 2 and len(inline) >= 40
    assert par == inline


def test_gen_dump_combinations(tmp_path):
    """Random hybrid pairing generator emits one runnable dump command per
    (base bam, chromosome), mixing platforms (reference
    gen_random_dump_combinations.py role)."""
    from hello_tpu.pipeline.gen_dump_combinations import main as gen_main

    ds = sim.make_dataset(str(tmp_path), ref_length=4000, num_variants=4,
                          coverage=10, read_length=100, seed=2,
                          platforms=("illumina", "pacbio"),
                          pacbio_read_length=800)
    ibams = tmp_path / "ibams.lst"
    pbams = tmp_path / "pbams.lst"
    ibams.write_text(ds.bams["illumina"] + "\n")
    pbams.write_text(ds.bams["pacbio"] + "\n")
    work = tmp_path / "work"
    commands = gen_main([
        "--ibams", str(ibams), "--pbams", str(pbams), "--ref", ds.fasta,
        "--truth", ds.truth_vcf, "--highconf", str(tmp_path / "conf.bed"),
        "--workdir", str(work)])
    assert len(commands) == 1          # 1 ibam x 1 chromosome
    cmd = commands[0]
    assert "hello_tpu.pipeline.dump" in cmd
    assert f"--bam {ds.bams['illumina']},{ds.bams['pacbio']}" in cmd
    assert (work / "commands.sh").exists()


# ---------------------------------------------------------------------------
# _AsyncDrainer: the background consumer both callers hand their dispatched
# batches to (pipeline/parallel_call.py); these pin its contract directly —
# completeness, bounded in-flight window, and failure propagation without
# hangs — independent of the e2e paths that exercise it implicitly.
# ---------------------------------------------------------------------------

class _FakeScorer:
    """Duck-typed scorer: finalize_many is the only method the drainer needs;
    optionally fails on the nth finalize call."""

    def __init__(self, fail_on=None):
        self.calls = 0
        self.fail_on = fail_on

    def finalize_many(self, outs):
        self.calls += 1
        if self.fail_on is not None and self.calls >= self.fail_on:
            raise RuntimeError("injected finalize failure")
        return [o * 10 for o in outs]


def test_async_drainer_drains_everything_in_order():
    from hello_tpu.pipeline.parallel_call import _AsyncDrainer
    got = []
    t_acc = {"backpressure_s": 0.0, "drain_s": 0.0, "fetch_s": 0.0,
             "decode_s": 0.0}
    d = _AsyncDrainer(_FakeScorer(), lambda g, b, fin: got.append((g, fin)),
                      t_acc, max_in_flight=3)
    for i in range(20):
        d.put(f"g{i}", None, i)
    d.close()
    assert got == [(f"g{i}", i * 10) for i in range(20)]
    assert t_acc["drain_s"] >= 0.0


def test_async_drainer_bounds_in_flight():
    """put() must block while max_in_flight entries are queued: the window
    is what bounds live batch inputs in device memory."""
    import threading
    import time

    from hello_tpu.pipeline.parallel_call import _AsyncDrainer

    release = threading.Event()
    seen_peak = [0]

    class SlowScorer:
        def finalize_many(self, outs):
            release.wait(5.0)
            return list(outs)

    t_acc = {"backpressure_s": 0.0, "drain_s": 0.0, "fetch_s": 0.0,
             "decode_s": 0.0}
    d = _AsyncDrainer(SlowScorer(), lambda g, b, fin: None, t_acc,
                      max_in_flight=2)
    d.put("a", None, 1)
    d.put("b", None, 2)   # fills the window (one popped + one queued is fine)

    def putter():
        d.put("c", None, 3)
        seen_peak[0] = 1

    t = threading.Thread(target=putter)
    t.start()
    time.sleep(0.2)
    blocked = seen_peak[0] == 0   # third put is parked on the window
    release.set()
    t.join(5.0)
    d.close()
    assert blocked
    assert seen_peak[0] == 1
    assert t_acc["backpressure_s"] > 0.0


def test_async_drainer_propagates_consumer_failure():
    """A finalize failure on the drainer thread must surface on the caller
    thread (via put or close), never hang or vanish."""
    from hello_tpu.pipeline.parallel_call import _AsyncDrainer

    t_acc = {"backpressure_s": 0.0, "drain_s": 0.0, "fetch_s": 0.0,
             "decode_s": 0.0}
    d = _AsyncDrainer(_FakeScorer(fail_on=1), lambda g, b, fin: None, t_acc,
                      max_in_flight=2)
    with pytest.raises(RuntimeError, match="injected finalize failure"):
        for i in range(50):
            d.put(f"g{i}", None, i)
        d.close()


def test_async_drainer_propagates_callback_failure():
    from hello_tpu.pipeline.parallel_call import _AsyncDrainer

    def bad_callback(g, b, fin):
        raise ValueError("decode exploded")

    t_acc = {"backpressure_s": 0.0, "drain_s": 0.0, "fetch_s": 0.0,
             "decode_s": 0.0}
    d = _AsyncDrainer(_FakeScorer(), bad_callback, t_acc, max_in_flight=2)
    with pytest.raises(ValueError, match="decode exploded"):
        d.put("g", None, 1)
        d.close()


def test_async_stager_stages_in_order_and_propagates_failure():
    """The stager dispatches groups strictly in arrival order (the drainer's
    bulk fetch assumes in-order device completion) and surfaces staging
    failures at put/close."""
    from hello_tpu.pipeline.parallel_call import _AsyncStager

    staged = []
    t_acc = {"stage_backpressure_s": 0.0}
    s = _AsyncStager(staged.append, t_acc, max_groups=3)
    for i in range(20):
        s.put(i)
    s.close()
    assert staged == list(range(20))

    def boom(group):
        raise RuntimeError("stage exploded")

    s = _AsyncStager(boom, {"stage_backpressure_s": 0.0}, max_groups=2)
    with pytest.raises(RuntimeError, match="stage exploded"):
        for i in range(50):
            s.put(i)
        s.close()


def test_async_stager_bounds_queue_and_abort_discards():
    import threading
    import time

    from hello_tpu.pipeline.parallel_call import _AsyncStager

    release = threading.Event()
    staged = []

    def slow_stage(group):
        release.wait(5.0)
        staged.append(group)

    t_acc = {"stage_backpressure_s": 0.0}
    s = _AsyncStager(slow_stage, t_acc, max_groups=2)
    s.put("a")            # picked up by the thread, parks in slow_stage
    s.put("b")
    s.put("c")            # fills the queue (one in-stage + two queued)
    done = [False]

    def putter():
        s.put("d")
        done[0] = True

    t = threading.Thread(target=putter)
    t.start()
    time.sleep(0.2)
    blocked = not done[0]
    release.set()
    t.join(5.0)
    s.close()
    assert blocked and done[0]
    assert staged == ["a", "b", "c", "d"]
    assert t_acc["stage_backpressure_s"] > 0.0

    # abort path: queued groups are discarded, no further staging happens
    release.clear()
    entered = threading.Event()
    staged2 = []

    def slow2(group):
        entered.set()
        release.wait(5.0)
        staged2.append(group)

    s2 = _AsyncStager(slow2, {"stage_backpressure_s": 0.0}, max_groups=4)
    s2.put("x")
    assert entered.wait(5.0)   # "x" is in-flight on the stager thread
    s2.put("y")
    s2.put("z")
    # abort (clearing "y"/"z") BEFORE releasing the in-flight stage: if
    # release came first, the stager thread could legally pop "y" ahead of
    # close() clearing the queue and the assertion would race
    closer = threading.Thread(target=lambda: s2.close(abort=True))
    closer.start()
    time.sleep(0.2)            # close() clears the queue, then joins
    release.set()
    closer.join(10.0)
    assert not closer.is_alive()
    assert staged2 == ["x"]   # only the in-flight group completed


def test_saturation_budget_ramp(tmp_path):
    """The per-class allele budget starts at max_alleles_per_batch (early
    first batch) and ramps to saturation_alleles after a class's first
    flush; the produced VCF is identical to a fixed-budget run."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from hello_tpu import sim
from hello_tpu.pipeline.call import load_scorer

class RecordingScorer:
    '''Duck-typed dense scorer that logs real-allele counts per batch.'''
    def __init__(self, inner):
        self.inner = inner
        self.model = inner.model
        self.batch_alleles = []
    def __call__(self, batch):
        self.batch_alleles.append(int(batch.allele_mask.sum()))
        return self.inner.finalize(self.inner.score_async(batch))

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=120000, num_variants=360,
                          coverage=25, read_length=120, seed=47)
    from hello_tpu.pipeline.parallel_call import HostWorkerPool, call_parallel
    base = load_scorer("illumina")
    with HostWorkerPool(2) as pool:
        pool.wait_ready()
        ramped = RecordingScorer(base)
        call_parallel([ds.bams["illumina"]], ds.fasta, ramped,
                      out_dir + "/ramped.vcf", pool=pool, chunk_size=15000,
                      regions=[(ds.chromosome, 0, 120000)],
                      max_alleles_per_batch=16, saturation_alleles=64)
        flat = RecordingScorer(base)
        call_parallel([ds.bams["illumina"]], ds.fasta, flat,
                      out_dir + "/flat.vcf", pool=pool, chunk_size=15000,
                      regions=[(ds.chromosome, 0, 120000)],
                      max_alleles_per_batch=16, saturation_alleles=16)
    json.dump({{"ramped": ramped.batch_alleles, "flat": flat.batch_alleles}},
              open(out_dir + "/batches.json", "w"))
    print("DRIVER_OK")
""")
    env = dict(__import__('os').environ)
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=600, env=env)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]

    import json

    from hello_tpu.io.vcf import read_vcf
    sizes = json.load(open(tmp_path / "batches.json"))
    # the ramped run formed batches beyond the initial budget ...
    assert max(sizes["ramped"]) > 16, sizes
    # ... the fixed-budget run never did (tails under budget are fine)
    assert max(sizes["flat"]) <= 16, sizes
    # and output records are identical
    key = lambda r: (r.chromosome, r.position, r.ref, tuple(r.alt),
                     tuple(r.gt))
    ramped = [key(r) for r in read_vcf(str(tmp_path / "ramped.vcf"))]
    flat = [key(r) for r in read_vcf(str(tmp_path / "flat.vcf"))]
    assert ramped, "no records produced"
    assert ramped == flat


def test_call_parallel_spill_matches_in_memory(tmp_path):
    """A tiny spill threshold (forcing many disk spill shards + streamed
    merge) must produce a byte-identical VCF to the in-memory path, and
    clean its temp shards up."""
    import glob
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import jax
jax.config.update("jax_platforms", "cpu")
from hello_tpu import sim
from hello_tpu.pipeline.call import load_scorer
from hello_tpu.pipeline.parallel_call import call_parallel

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=30000, num_variants=25,
                          coverage=30, read_length=120, seed=31)
    scorer = load_scorer("illumina")
    for name, spill in (("memory.vcf", 400000), ("spilled.vcf", 5)):
        call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                      out_dir + "/" + name, num_workers=2, chunk_size=8000,
                      regions=[(ds.chromosome, 0, 30000)],
                      spill_records=spill)
    print("DRIVER_OK")
""")
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=600)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]
    mem = (tmp_path / "memory.vcf").read_text()
    spl = (tmp_path / "spilled.vcf").read_text()
    assert mem == spl
    assert len([l for l in mem.splitlines() if not l.startswith("#")]) >= 20
    assert not glob.glob(str(tmp_path / "*.tmp.vcf"))   # spills cleaned up


def test_record_spiller_gz_output(tmp_path):
    """Spilled runs writing a .vcf.gz output stream the merged records into
    BGZF with a .tbi index (the spill shards stay plain VCF)."""
    import os

    from hello_tpu.io.vcf import VcfRecord, fetch_vcf_gz, read_vcf
    from hello_tpu.pipeline.parallel_call import _RecordSpiller

    out = str(tmp_path / "calls.vcf.gz")
    sp = _RecordSpiller(out, {"chr1": 10_000}, threshold=3)
    for pos in (50, 10, 90, 30, 70, 20, 60):
        sp.add(VcfRecord("chr1", pos, "A", ["T"], (0, 1)))
    n = sp.finish()
    assert n == 7
    got = [r.position for r in read_vcf(out)]
    assert got == [10, 20, 30, 50, 60, 70, 90]
    assert os.path.exists(out + ".tbi")
    assert [r.position for r in fetch_vcf_gz(out, "chr1", 25, 65)] == \
        [30, 50, 60]
    import glob
    assert not glob.glob(str(tmp_path / "*.tmp.vcf"))


def test_row_budget_grouping_unit():
    """Coded classes are additionally budgeted by real read rows: every
    group (except single-site backstops) stays under the per-platform row
    budget, the partition preserves site order, and dense SiteWork classes
    are unaffected."""
    import numpy as np

    from hello_tpu.pipeline.batching import (CodedSiteWork,
                                             group_sites_for_batching,
                                             row_budgets_for_class,
                                             site_row_counts)

    def coded_site(i, reads0, reads1):
        mk = lambda n: [np.zeros((r, 150), np.uint8) for r in n]
        mks = lambda n: [np.zeros((r, 2), np.uint8) for r in n]
        return CodedSiteWork("chr1", 100 + i, 101 + i, ["A", "C"],
                             mk(reads0), mks(reads0), mk(reads1), mks(reads1),
                             np.zeros(150, np.uint8))

    rng = np.random.RandomState(3)
    sites = [coded_site(i, rng.randint(8, 33, size=2),
                        rng.randint(4, 17, size=2)) for i in range(60)]
    budget_alleles = 16
    groups = list(group_sites_for_batching(sites, budget_alleles,
                                           by_read_bucket=True,
                                           row_budget_frac=0.5))
    # partition: same sites, each exactly once (order within class kept)
    flat = [s for g in groups for s in g]
    assert sorted(id(s) for s in flat) == sorted(id(s) for s in sites)
    from hello_tpu.pipeline.batching import site_read_bucket
    for g in groups:
        key = site_read_bucket(g[0])
        rb = row_budgets_for_class(key, budget_alleles, 0.5)
        rows = [sum(r) for r in zip(*(site_row_counts(s) for s in g))]
        if len(g) > 1:
            assert all(rows[i] <= rb[i] for i in range(len(rb))), (rows, rb)
    # a row-bound class must actually split below the allele budget
    assert any(sum(len(s.alleles) for s in g) < budget_alleles
               for g in groups[:-1] if len(g) > 1)


def test_row_budget_identical_vcf(tmp_path):
    """The worker-pool caller with packed-row row budgeting (the coded-wire
    production default) must produce the identical VCF to a run with row
    budgeting disabled, while forming row-bounded batches."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys; sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
import os
os.environ["HELLO_TPU_COMPACT"] = "1"
os.environ["HELLO_TPU_PACKED_CONV"] = "1"
import json
import jax
jax.config.update("jax_platforms", "cpu")
from hello_tpu import sim
from hello_tpu.pipeline.call import load_scorer

if __name__ == "__main__":
    out_dir = {repr(str(tmp_path))}
    ds = sim.make_dataset(out_dir, ref_length=120000, num_variants=360,
                          coverage=25, read_length=120, seed=48)
    from hello_tpu.pipeline.parallel_call import HostWorkerPool, call_parallel
    scorer = load_scorer("illumina")
    assert scorer.compact and scorer.packed_conv
    with HostWorkerPool(2) as pool:
        pool.wait_ready()
        call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                      out_dir + "/budgeted.vcf", pool=pool, chunk_size=15000,
                      regions=[(ds.chromosome, 0, 120000)],
                      max_alleles_per_batch=32)
        os.environ["HELLO_TPU_ROW_BUDGET"] = "0"
        call_parallel([ds.bams["illumina"]], ds.fasta, scorer,
                      out_dir + "/plain.vcf", pool=pool, chunk_size=15000,
                      regions=[(ds.chromosome, 0, 120000)],
                      max_alleles_per_batch=32)
    print("DRIVER_OK")
""")
    import os
    env = dict(os.environ)
    res = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=600, env=env)
    assert "DRIVER_OK" in res.stdout, res.stderr[-3000:]

    from hello_tpu.io.vcf import read_vcf
    key = lambda r: (r.chromosome, r.position, r.ref, tuple(r.alt),
                     tuple(r.gt))
    budgeted = [key(r) for r in read_vcf(str(tmp_path / "budgeted.vcf"))]
    plain = [key(r) for r in read_vcf(str(tmp_path / "plain.vcf"))]
    assert budgeted, "no records produced"
    assert budgeted == plain


def test_async_stager_two_stage_pipeline():
    """With dispatch_fn, pack and dispatch run on separate threads but
    items flow strictly in order; failures in EITHER stage surface at
    put/close."""
    import threading

    from hello_tpu.pipeline.parallel_call import _AsyncStager

    packed, dispatched = [], []
    t_acc = {"stage_backpressure_s": 0.0}
    pack_tid, dispatch_tid = set(), set()

    def pack(g):
        pack_tid.add(threading.get_ident())
        packed.append(g)
        return g * 10

    def dispatch(item):
        dispatch_tid.add(threading.get_ident())
        dispatched.append(item)

    s = _AsyncStager(pack, t_acc, max_groups=3, dispatch_fn=dispatch)
    for i in range(20):
        s.put(i)
    s.close()
    assert packed == list(range(20))
    assert dispatched == [i * 10 for i in range(20)]
    assert pack_tid != dispatch_tid, "stages must run on separate threads"

    def boom(item):
        raise RuntimeError("dispatch exploded")

    s = _AsyncStager(lambda g: g, {"stage_backpressure_s": 0.0},
                     max_groups=2, dispatch_fn=boom)
    with pytest.raises(RuntimeError, match="dispatch exploded"):
        for i in range(50):
            s.put(i)
        s.close()
