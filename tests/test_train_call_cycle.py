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
