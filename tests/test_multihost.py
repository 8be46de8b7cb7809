"""Multi-host workflow tests: region sharding across simulated hosts, per-host
VCFs, and the merge step reproducing the single-host call set."""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.io.vcf import read_vcf
from hello_tpu.parallel.mesh import shard_regions
from hello_tpu.pipeline.call import call_genome
from hello_tpu.pipeline.merge import main as merge_main

from test_pipeline_e2e import OracleScorer, canonical_map


def test_shard_regions_partition():
    regions = [("chr1", 0, 100), ("chr2", 0, 100), ("chr3", 0, 100),
               ("chr4", 0, 100)]
    shards = [shard_regions(regions, i, 3) for i in range(3)]
    combined = sorted(r for s in shards for r in s)
    assert combined == sorted(regions)
    # deterministic: every host computes the same assignment
    assert shards[0] == shard_regions(regions, 0, 3)


def test_granular_sharding_balances_uneven_chromosomes():
    """Load-balance evidence for the >=80% multi-host scaling-efficiency
    target: with granular sharding, per-host base counts stay within a few
    percent on human-like chromosome size skew (work is ~ bases at uniform
    variant density), for any host count."""
    # human-like length skew (Mb-scaled chr1..chr22,X)
    lengths = [248, 242, 198, 190, 182, 171, 159, 145, 138, 134, 135, 133,
               114, 107, 102, 90, 83, 80, 59, 64, 47, 51, 156]
    regions = [(f"chr{i+1}", 0, mb * 1_000_000) for i, mb in enumerate(lengths)]
    total = sum(stop for _, _, stop in regions)
    for hosts in (2, 3, 4, 8):
        loads = []
        seen = []
        for pi in range(hosts):
            mine = shard_regions(regions, pi, hosts, granularity=4_000_000)
            loads.append(sum(stop - start for _, start, stop in mine))
            seen.extend(mine)
        # exact partition
        assert sum(loads) == total and len(seen) == len(set(seen))
        assert max(loads) / (total / hosts) < 1.02, (hosts, loads)
        # deterministic
        assert shard_regions(regions, 0, hosts, granularity=4_000_000) == \
            shard_regions(regions, 0, hosts, granularity=4_000_000)


def test_two_host_granular_shards_merge_equals_single(tmp_path):
    """Granule boundaries inside a chromosome behave exactly like worker
    chunk boundaries: two hosts sharded at sub-chromosome granularity merge
    to the single-host call set."""
    ds = sim.make_dataset(str(tmp_path), ref_length=24_000, num_variants=40,
                          coverage=30, read_length=120, seed=31)
    ref = FastaFile(ds.fasta)
    regions = [(c, 0, ref.length(c)) for c in ref.chromosomes()]

    single = str(tmp_path / "single.vcf")
    call_genome([ds.bams["illumina"]], ds.fasta, OracleScorer(), single,
                regions=regions)

    host_vcfs = []
    for pi in range(2):
        mine = shard_regions(regions, pi, 2, granularity=6_000)
        assert 0 < len(mine) < 4
        out = str(tmp_path / f"ghost{pi}.vcf")
        call_genome([ds.bams["illumina"]], ds.fasta, OracleScorer(), out,
                    regions=mine)
        host_vcfs.append(out)

    merged = str(tmp_path / "gmerged.vcf")
    merge_main(["--inputs"] + host_vcfs + ["--out", merged, "--ref", ds.fasta])
    want = canonical_map(read_vcf(single), ref)
    got = canonical_map(read_vcf(merged), ref)
    assert got == want and len(want) >= 30


def test_two_host_call_and_merge_equals_single(tmp_path):
    ds = sim.make_dataset(str(tmp_path), ref_length=6000, num_variants=8,
                          coverage=30, read_length=120, seed=47,
                          num_chromosomes=2)
    ref = FastaFile(ds.fasta)
    regions = [(c, 0, ref.length(c)) for c in ref.chromosomes()]
    assert len(regions) == 2

    # single-host reference run
    single = str(tmp_path / "single.vcf")
    call_genome([ds.bams["illumina"]], ds.fasta, OracleScorer(), single,
                regions=regions)

    # two "hosts", each calling its shard
    host_vcfs = []
    for pi in range(2):
        mine = shard_regions(regions, pi, 2)
        out = str(tmp_path / f"host{pi}.vcf")
        call_genome([ds.bams["illumina"]], ds.fasta, OracleScorer(), out,
                    regions=mine)
        host_vcfs.append(out)

    merged = str(tmp_path / "merged.vcf")
    merge_main(["--inputs"] + host_vcfs + ["--out", merged, "--ref", ds.fasta])

    def keyset(path):
        return {(r.chromosome, r.position, r.ref, tuple(r.alt), tuple(sorted(r.gt)))
                for r in read_vcf(path)}

    assert keyset(merged) == keyset(single)
    assert len(keyset(merged)) > 0

    # and the merged set matches the truth exactly
    called = canonical_map(read_vcf(merged), ref)
    truth = canonical_map(read_vcf(ds.truth_vcf), ref)
    assert set(called) == set(truth)


def test_multi_chromosome_simulation(tmp_path):
    ds = sim.make_dataset(str(tmp_path), ref_length=4000, num_variants=5,
                          coverage=20, read_length=100, seed=3,
                          num_chromosomes=3)
    ref = FastaFile(ds.fasta)
    assert len(ref.chromosomes()) == 3
    truth = read_vcf(ds.truth_vcf)
    chroms = {r.chromosome for r in truth}
    assert len(chroms) == 3
