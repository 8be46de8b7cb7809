"""End-to-end pipeline test on simulated data.

Uses an *oracle scorer* that assigns high logits to well-supported alleles —
bypassing the (separately parity-tested) neural network — so that the full
pipeline (BAM -> hotspots -> candidates -> assembly -> featurization ->
batching -> decode -> VCF normalisation) must reproduce the simulated truth
set exactly.
"""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.io.vcf import read_vcf, write_vcf
from hello_tpu.pipeline.call import call_region, vcf_record_from_call
from hello_tpu.pipeline.batching import PaddedBatch


class OracleScorer:
    """Logit +12 for alleles supported by >=25% of the site's max-support
    allele, else -12.  Mimics the Scorer interface."""

    class _Model:
        hybrid = False

    model = _Model()

    def __call__(self, batch: PaddedBatch):
        A = batch.reads0.shape[0]
        support = batch.read_mask0.sum(axis=1)  # [A]
        experts = np.full((A, 1), -12.0, np.float32)
        for site_idx in range(batch.num_sites):
            rows = [i for i in range(A)
                    if batch.allele_mask[i] > 0 and batch.site_ids[i] == site_idx]
            if not rows:
                continue
            peak = max(support[i] for i in rows)
            for i in rows:
                if support[i] >= 0.25 * peak:
                    experts[i, 0] = 12.0
        return experts, None


def normalize_gt(gt):
    return tuple(sorted(gt))


def canonical_map(records, ref):
    """Representation-invariant call map: canonical (pos, ref, alt) -> gt."""
    from hello_tpu.io.vcf import left_align_normalize
    lookup = lambda chrom, pos: ref.fetch(chrom, pos, pos + 1)
    out = {}
    for r in records:
        for alt in r.alt:
            pos, ra, aa = left_align_normalize(r.chromosome, r.position, r.ref,
                                               alt, lookup)
            out[(r.chromosome, pos, ra, aa)] = normalize_gt(r.gt)
    return out


@pytest.mark.parametrize("seed", [7, 21])
def test_end_to_end_oracle_calls_match_truth(tmp_path, seed):
    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=12,
                          coverage=30, read_length=120, seed=seed)
    ref = FastaFile(ds.fasta)
    records = call_region(
        [ds.bams["illumina"]], ref, ds.chromosome, 0,
        ref.length(ds.chromosome), OracleScorer())

    truth = read_vcf(ds.truth_vcf)
    called = canonical_map(records, ref)
    truth_map = canonical_map(truth, ref)

    missing = set(truth_map) - set(called)
    extra = set(called) - set(truth_map)
    assert not missing, f"missed variants: {missing}"
    assert not extra, f"spurious calls: {extra}"
    for key in truth_map:
        assert called[key] == truth_map[key], \
            f"genotype mismatch at {key}: {called[key]} vs {truth_map[key]}"


def test_end_to_end_with_sequencing_errors(tmp_path):
    """Candidate generation must be robust to realistic read noise: 1%
    substitution + 0.1% indel errors at 35x.  Noise allele fractions sit far
    below the 12% hotspot threshold, so the oracle-scored call set should
    still recover the truth exactly (this exercises the frequency/min-count
    thresholds doing their actual job, which error-free reads never do)."""
    ds = sim.make_dataset(str(tmp_path), ref_length=20_000, num_variants=40,
                          coverage=35, read_length=120, seed=5,
                          sub_error_rate=0.01, indel_error_rate=0.001)
    ref = FastaFile(ds.fasta)
    records = call_region(
        [ds.bams["illumina"]], ref, ds.chromosome, 0,
        ref.length(ds.chromosome), OracleScorer())

    truth_map = canonical_map(read_vcf(ds.truth_vcf), ref)
    # ignore homozygous-ref records (sites surfaced but called 0/0)
    called = {k: gt for k, gt in canonical_map(records, ref).items()
              if gt != (0, 0)}
    assert len(truth_map) >= 30
    missing = set(truth_map) - set(called)
    extra = set(called) - set(truth_map)
    wrong_gt = {k for k in truth_map if k in called
                and called[k] != truth_map[k]}
    assert not missing and not extra and not wrong_gt, (
        missing, extra, wrong_gt)


def test_noisy_pacbio_recall(tmp_path):
    """PacBio-style noise (1% indel + 0.5% substitution errors on 1.2 kb
    reads) must not break long-read candidate generation: every true variant
    is still recovered with the right genotype, and spurious non-ref calls
    stay rare (noise can occasionally assemble into a surfaced allele, but
    the thresholds keep it exceptional)."""
    ds = sim.make_dataset(str(tmp_path), ref_length=20_000, num_variants=40,
                          coverage=28, read_length=120, seed=9,
                          platforms=("pacbio",), pacbio_read_length=1200,
                          sub_error_rate=0.005, indel_error_rate=0.01)
    ref = FastaFile(ds.fasta)
    records = call_region(
        [ds.bams["pacbio"]], ref, ds.chromosome, 0,
        ref.length(ds.chromosome), OracleScorer(), pacbio=True)

    truth_map = canonical_map(read_vcf(ds.truth_vcf), ref)
    called = {k: gt for k, gt in canonical_map(records, ref).items()
              if gt != (0, 0)}
    missing = set(truth_map) - set(called)
    wrong_gt = {k for k in truth_map if k in called
                and called[k] != truth_map[k]}
    extra = set(called) - set(truth_map)
    assert not missing, f"missed under noise: {missing}"
    assert not wrong_gt, f"genotype errors under noise: {wrong_gt}"
    assert len(extra) <= max(2, len(truth_map) // 20), f"spurious: {extra}"


def test_quality_is_capped_and_positive(tmp_path):
    ds = sim.make_dataset(str(tmp_path), ref_length=3000, num_variants=5,
                          coverage=30, read_length=120, seed=3)
    ref = FastaFile(ds.fasta)
    records = call_region(
        [ds.bams["illumina"]], ref, ds.chromosome, 0,
        ref.length(ds.chromosome), OracleScorer())
    assert records
    for r in records:
        assert 0 < r.qual <= 80.0 + 1e-6
