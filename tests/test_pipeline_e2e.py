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
