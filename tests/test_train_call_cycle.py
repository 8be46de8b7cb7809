"""Full-cycle integration test: simulate -> dump labeled shards -> train on a
2-device mesh -> checkpoint -> call variants -> exact truth recovery."""

import numpy as np
import pytest


def _canonical(records, ref):
    from hello_tpu.io.vcf import left_align_normalize
    lookup = lambda c, p: ref.fetch(c, p, p + 1)
    out = {}
    for r in records:
        for alt in r.alt:
            pos, ra, aa = left_align_normalize(
                r.chromosome, r.position, r.ref, alt, lookup)
            out[(pos, ra, aa)] = tuple(sorted(r.gt))
    return out


def test_train_then_call_recovers_truth(tmp_path):
    from hello_tpu import sim
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.io.vcf import read_vcf
    from hello_tpu.pipeline.call import call_region, load_scorer
    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.train.cli import train_from_shards

    ds = sim.make_dataset(str(tmp_path), ref_length=8000, num_variants=16,
                          coverage=30, read_length=120, seed=9)
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t8000\n")

    ref = FastaFile(ds.fasta)
    shards = dump_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 8000,
                         ds.truth_vcf, bed, str(tmp_path / "dump"))
    assert shards

    train_from_shards(
        shards, "illumina", str(tmp_path / "model"),
        num_epochs=4, lr=1e-3, num_devices=2, batch_alleles=16,
        read_bucket=32, max_reads_per_site=32, val_fraction=0.0)

    scorer = load_scorer("illumina", str(tmp_path / "model.final.ckpt"))
    records = call_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 8000,
                          scorer)

    called = _canonical(records, ref)
    truth = _canonical(read_vcf(ds.truth_vcf), ref)
    missed = set(truth) - set(called)
    spurious = set(called) - set(truth)
    assert not missed, f"missed: {missed}"
    assert not spurious, f"spurious: {spurious}"
    wrong_gt = {k for k in truth if called[k] != truth[k]}
    assert not wrong_gt, f"wrong genotypes: {wrong_gt}"


def test_train_then_call_generalizes_under_noise(tmp_path):
    """Noise-robust learning: train on one noisy simulated dataset (1%
    substitution + 0.1% indel errors), call a DIFFERENT noisy dataset, and
    require high precision/recall.  Unlike the error-free cycle above, the
    model here must actually learn to separate variant evidence from
    sequencing noise, and the evaluation is true generalization (disjoint
    reference, variants, and reads)."""
    from hello_tpu import sim
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.io.vcf import read_vcf
    from hello_tpu.pipeline.call import call_region, load_scorer
    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.train.cli import train_from_shards

    noise = dict(sub_error_rate=0.01, indel_error_rate=0.001)
    tr = sim.make_dataset(str(tmp_path / "train"), ref_length=40_000,
                          num_variants=100, coverage=35, read_length=120,
                          seed=23, **noise)
    te = sim.make_dataset(str(tmp_path / "test"), ref_length=20_000,
                          num_variants=50, coverage=35, read_length=120,
                          seed=77, **noise)

    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{tr.chromosome}\t0\t40000\n")
    ref_tr = FastaFile(tr.fasta)
    shards = dump_region([tr.bams["illumina"]], ref_tr, tr.chromosome, 0,
                         40_000, tr.truth_vcf, bed, str(tmp_path / "dump"))
    train_from_shards(shards, "illumina", str(tmp_path / "model"),
                      num_epochs=6, lr=1e-3, num_devices=2, batch_alleles=32,
                      read_bucket=64, max_reads_per_site=48, val_fraction=0.0)

    scorer = load_scorer("illumina", str(tmp_path / "model.final.ckpt"))
    ref_te = FastaFile(te.fasta)
    records = call_region([te.bams["illumina"]], ref_te, te.chromosome, 0,
                          20_000, scorer)

    called = {k: gt for k, gt in _canonical(records, ref_te).items()
              if gt != (0, 0)}
    truth = _canonical(read_vcf(te.truth_vcf), ref_te)
    assert len(truth) >= 45
    tp = len(set(truth) & set(called))
    recall = tp / len(truth)
    precision = tp / max(len(called), 1)
    gt_ok = sum(1 for k in truth if called.get(k) == truth[k]) / len(truth)
    assert recall >= 0.90, (recall, set(truth) - set(called))
    assert precision >= 0.95, (precision, set(called) - set(truth))
    assert gt_ok >= 0.88, gt_ok
