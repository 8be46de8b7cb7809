"""Hybrid-model training: the EM mixture loss must train the full 3-expert +
meta model end to end on simulated hybrid data, and the trained model must
recover the truth when calling."""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.io.vcf import read_vcf

from test_pipeline_e2e import canonical_map


def test_hybrid_train_and_call(tmp_path):
    from hello_tpu.pipeline.call import call_region, load_scorer
    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.train.cli import train_from_shards

    ds = sim.make_dataset(str(tmp_path), ref_length=9000, num_variants=14,
                          coverage=30, read_length=120, seed=37,
                          platforms=("illumina", "pacbio"),
                          pacbio_read_length=1200)
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t9000\n")
    ref = FastaFile(ds.fasta)

    shards = dump_region(
        [ds.bams["illumina"], ds.bams["pacbio"]], ref, ds.chromosome, 0, 9000,
        ds.truth_vcf, bed, str(tmp_path / "dump"))
    assert shards

    trainer = train_from_shards(
        shards, "hybrid", str(tmp_path / "model"),
        num_epochs=6, lr=1e-3, num_devices=2, batch_alleles=16,
        read_bucket=32, max_reads_per_site=32, val_fraction=0.0,
        entropy_regularizer=0.01)

    scorer = load_scorer("hybrid", str(tmp_path / "model.final.ckpt"))
    records = call_region(
        [ds.bams["illumina"], ds.bams["pacbio"]], ref, ds.chromosome, 0,
        9000, scorer)

    called = canonical_map(records, ref)
    truth = canonical_map(read_vcf(ds.truth_vcf), ref)
    missing = set(truth) - set(called)
    assert not missing, f"missed: {missing}"
    wrong = {k for k in truth if called[k] != truth[k]}
    assert not wrong, f"wrong genotypes: {wrong}"


def test_provide_experts_streams(tmp_path):
    from hello_tpu.pipeline.call import call_genome, load_scorer

    ds = sim.make_dataset(str(tmp_path), ref_length=5000, num_variants=6,
                          coverage=30, read_length=120, seed=41,
                          platforms=("illumina", "pacbio"),
                          pacbio_read_length=1200)
    scorer = load_scorer("hybrid")
    out = str(tmp_path / "calls.vcf")
    call_genome([ds.bams["illumina"], ds.bams["pacbio"]], ds.fasta, scorer,
                out, regions=[(ds.chromosome, 0, 5000)], provide_experts=True)
    for suffix in ("", ".expert0", ".expert1", ".expert2", ".best", ".mean"):
        path = str(tmp_path / f"calls{suffix}.vcf")
        recs = read_vcf(path)
        assert len(recs) >= 1, path

    # choices.bed: one line per scored site, expert index in column 4
    choices = [l.split("\t") for l in
               open(tmp_path / "calls.choices.bed").read().splitlines()]
    assert choices and all(len(c) == 4 and c[3] in "012" for c in choices)

    # persisted per-site features (for the failure-analysis evaluator)
    import pickle
    feats = pickle.load(open(tmp_path / "calls.features.pkl", "rb"))
    assert len(feats) == len(choices)
    f0 = feats[0]
    assert {"chromosome", "position", "length", "meta",
            "expertPredictions"} <= set(f0)
    assert len(f0["expertPredictions"]) == 3
    # each expert prediction maps unordered allele pairs -> probability
    pair, prob = next(iter(f0["expertPredictions"][0].items()))
    assert len(pair) == 2 and 0.0 <= float(prob) <= 1.0
