"""Labeler tests: haplotype enumeration, path matching, end-to-end labeled
dump correctness on simulated data (labels must match the planted truth)."""

import collections

import numpy as np
import pytest

from hello_tpu.labels import (Labeler, RegionTooLongException,
                              enumerate_truth_haplotypes, match_path)
from hello_tpu.pipeline.candidates import CandidateRecord


Rec = CandidateRecord


def test_match_path_simple_snv():
    #            0123456789
    segment = "ACGTACGTAC"
    sites = [Rec("c", 3, "T", ["G"], [0, 1])]
    from hello_tpu.labels import _Site
    srecs = [_Site(["T", "G"], 3, 4)]
    # haplotype with the alt
    assert match_path("ACGGACGTAC", srecs, segment, 0) == ["G"]
    assert match_path(segment, srecs, segment, 0) == ["T"]
    assert match_path("ACGAACGTAC", srecs, segment, 0) is None


def test_match_path_indel():
    segment = "ACGTACGTAC"
    from hello_tpu.labels import _Site
    # deletion site: ref TAC -> T at 3..6
    srecs = [_Site(["TAC", "T"], 3, 6)]
    assert match_path("ACGTGTAC", srecs, segment, 0) == ["T"]
    assert match_path(segment, srecs, segment, 0) == ["TAC"]


def test_enumerate_truth_haplotypes_het():
    segment = "AAAACAAAA"
    Truth = collections.namedtuple("Truth", ["position", "ref", "alt", "gt"])
    truths = [Truth(4, "C", ["G"], (0, 1))]
    results = enumerate_truth_haplotypes(truths, segment, 0)
    haps = {pair for pair, n1, n2 in results}
    # the correct het pair appears with zero errors
    exact = [(p, n1, n2) for p, n1, n2 in results
             if p in {("AAAACAAAA", "AAAAGAAAA"), ("AAAAGAAAA", "AAAACAAAA")}]
    assert any(n1 == 0 and n2 == 0 for _p, n1, n2 in exact)


def test_labeler_het_snv():
    segment = "AAAACAAAA"
    Truth = collections.namedtuple("Truth", ["position", "ref", "alt", "gt"])
    truths = [Truth(4, "C", ["G"], (0, 1))]
    labeler = Labeler(truths, segment, 0)
    flag, alleles = labeler([Rec("c", 4, "C", ["G"], [0, 1])])
    assert flag
    assert set(alleles[0]) == {"C", "G"}


def test_labeler_hom_alt():
    segment = "AAAACAAAA"
    Truth = collections.namedtuple("Truth", ["position", "ref", "alt", "gt"])
    truths = [Truth(4, "C", ["G"], (1, 1))]
    labeler = Labeler(truths, segment, 0)
    flag, alleles = labeler([Rec("c", 4, "C", ["G"], [0, 1])])
    assert flag
    assert alleles[0] == ("G", "G")


def test_labeler_no_truth_means_homref():
    segment = "AAAACAAAA"
    labeler = Labeler([], segment, 0)
    flag, alleles = labeler([Rec("c", 4, "C", ["G"], [0, 1])])
    assert flag
    assert alleles[0] == ("C", "C")


def test_labeler_too_many_truths_raises():
    Truth = collections.namedtuple("Truth", ["position", "ref", "alt", "gt"])
    segment = "A" * 200
    truths = [Truth(i * 15 + 3, "A", ["C"], (0, 1)) for i in range(12)]
    with pytest.raises(RegionTooLongException):
        Labeler(truths, segment, 0)


def test_end_to_end_dump_labels_match_truth(tmp_path):
    """Dump labeled training data from simulation; every planted alt allele
    must be labeled 1 and spurious alleles 0."""
    from hello_tpu import sim
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.train.store import ShardReader

    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=12,
                          coverage=30, read_length=120, seed=5)
    # high-confidence BED covering everything
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t6000\n")

    ref = FastaFile(ds.fasta)
    stats = {}
    paths = dump_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 6000,
                        ds.truth_vcf, bed, str(tmp_path / "dump"),
                        stats=stats)
    assert paths, f"no shards written (stats={stats})"

    sites = [s for p in paths for s in ShardReader(p)]
    assert len(sites) >= len(ds.variants) - stats.get("too_long", 0) - stats.get("missed", 0)

    # index truth by canonical variant span
    truth_by_pos = {}
    for v in ds.variants:
        truth_by_pos[v.position] = v

    labeled_pos = 0
    for site in sites:
        assert site.labels is not None
        assert len(site.labels) == len(site.alleles)
        n_pos = sum(site.labels)
        # a labeled site has 1 (hom) or up to 2 positive alleles (het: ref+alt)
        assert 1 <= n_pos <= 2, (site.start, site.alleles, site.labels)
        labeled_pos += n_pos
    assert labeled_pos > 0

    # spot-check: het SNVs should label both ref and alt positively
    het_snvs = [v for v in ds.variants
                if len(v.ref) == 1 and len(v.alt) == 1 and v.genotype != (1, 1)]
    for v in het_snvs:
        matching = [s for s in sites if s.start <= v.position < s.stop]
        assert matching, f"no dumped site covers truth variant at {v.position}"
        site = matching[0]
        positive = {a for a, l in zip(site.alleles, site.labels) if l}
        assert v.alt in "".join(positive) or any(v.alt in a for a in positive), \
            (v, site.alleles, site.labels)
        assert len(positive) == 2  # ref allele + alt allele


def test_store_roundtrip(tmp_path, rng):
    from hello_tpu.pipeline.batching import SiteWork
    from hello_tpu.train.store import ShardReader, ShardWriter

    sites = []
    for i in range(5):
        n = rng.randint(1, 4)
        sites.append(SiteWork(
            "chr1", 100 * i, 100 * i + 2,
            [f"A{j}" for j in range(n)],
            [rng.randint(0, 255, (rng.randint(1, 6), 150, 6)).astype(np.uint8)
             for _ in range(n)],
            None,
            np.eye(5, dtype=np.float32)[rng.randint(0, 5, 150)],
            labels=[int(rng.rand() < 0.5) for _ in range(n)],
            site_label=0))
    w = ShardWriter(str(tmp_path / "shard"))
    for s in sites:
        w.add_site(s)
    index = w.close()

    reader = ShardReader(index)
    assert len(reader) == 5
    for orig, rt in zip(sites, reader):
        assert rt.chromosome == orig.chromosome
        assert rt.start == orig.start
        assert rt.alleles == orig.alleles
        assert rt.labels == orig.labels
        for a, b in zip(orig.tensors0, rt.tensors0):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(orig.ref_segment, rt.ref_segment)


def test_loader_subsample_and_batches(tmp_path, rng):
    from hello_tpu.pipeline.batching import SiteWork
    from hello_tpu.train.loader import SiteDataset, device_batches
    from hello_tpu.train.store import ShardWriter

    w = ShardWriter(str(tmp_path / "s"))
    for i in range(8):
        w.add_site(SiteWork(
            "c", i, i + 1, ["A", "B"],
            [rng.randint(0, 255, (20, 150, 6)).astype(np.uint8) for _ in range(2)],
            None, np.eye(5, dtype=np.float32)[rng.randint(0, 5, 150)],
            labels=[1, 0], site_label=0))
    index = w.close()

    ds = SiteDataset([index], max_reads_per_site=5)
    got = list(ds)
    assert len(got) == 8
    assert all(t.shape[0] == 5 for s in got for t in s.tensors0)

    stacked = list(device_batches(
        ds, hybrid=False, num_devices=2, max_alleles_per_batch=4,
        fixed_shape={"read_bucket": 8, "allele_bucket": 4, "site_bucket": 2}))
    assert stacked
    b = stacked[0]
    assert b["reads0"].shape == (2, 4, 8, 150, 6)
    assert b["labels"].shape == (2, 4)


def test_labels_to_vcf_reconstructs_truth(tmp_path):
    """The label-derived VCF must match the planted truth set (canonical)."""
    from hello_tpu import sim
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.io.vcf import read_vcf
    from hello_tpu.pipeline.dump import dump_region
    from hello_tpu.pipeline.labels_to_vcf import main as l2v_main
    from test_pipeline_e2e import canonical_map

    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=10,
                          coverage=30, read_length=120, seed=51)
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write(f"{ds.chromosome}\t0\t6000\n")
    ref = FastaFile(ds.fasta)
    shards = dump_region([ds.bams["illumina"]], ref, ds.chromosome, 0, 6000,
                         ds.truth_vcf, bed, str(tmp_path / "d"))
    lst = str(tmp_path / "d.lst")
    with open(lst, "w") as fh:
        fh.write("\n".join(shards) + "\n")
    out = str(tmp_path / "labels.vcf")
    l2v_main(["--data", lst, "--ref", ds.fasta, "--out", out])

    called = canonical_map(read_vcf(out), ref)
    truth = canonical_map(read_vcf(ds.truth_vcf), ref)
    assert set(called) == set(truth)
    for k in truth:
        assert called[k] == truth[k]


def test_detect_chr_prefix():
    from hello_tpu.io.bam import detect_chr_prefix

    assert detect_chr_prefix([("chr1", 10), ("chr2", 10)], ["1", "2"]) == "chr"
    assert detect_chr_prefix([("1", 10), ("2", 10)], ["1", "2"]) == ""
    import pytest as _pytest
    # stripping (BAM "20" vs FASTA "chr20") cannot be expressed as a prefix
    with _pytest.raises(ValueError, match="strip"):
        detect_chr_prefix([("20", 10)], ["chr20"])
    with _pytest.raises(ValueError):
        detect_chr_prefix([("weird", 10)], ["1"])
