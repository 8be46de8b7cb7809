"""I/O tests: BAM roundtrip, FASTA indexing, VCF normalisation, simulator sanity."""

import os

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.constants import BAM_CDEL, BAM_CINS, BAM_CMATCH
from hello_tpu.io.bam import BamReader, write_bam
from hello_tpu.io.fasta import FastaFile, write_fasta, ChromView
from hello_tpu.io.vcf import (VcfRecord, make_record, normalize_site, read_vcf,
                              write_vcf)
from hello_tpu.reads import AlignedRead


def test_bam_roundtrip(tmp_path):
    reads = [
        AlignedRead("r1", 16, "chr1", 100, 60,
                    [(BAM_CMATCH, 10), (BAM_CDEL, 2), (BAM_CMATCH, 5)],
                    "ACGTACGTACGTACG", list(range(15)), hp=2),
        AlignedRead("r2", 0, "chr1", 200, 33,
                    [(BAM_CMATCH, 8), (BAM_CINS, 3), (BAM_CMATCH, 4)],
                    "TTTTGGGGCCCAAGG"[:15], [40] * 15, hp=0),
        AlignedRead("r3", 0, "chr2", 50, 10, [(BAM_CMATCH, 6)],
                    "ACGTAC", [20] * 6),
    ]
    path = str(tmp_path / "test.bam")
    write_bam(path, [("chr1", 1000), ("chr2", 500)], reads)

    reader = BamReader(path)
    assert reader.references == [("chr1", 1000), ("chr2", 500)]
    got = list(reader)
    assert len(got) == 3
    for orig, rt in zip(reads, got):
        assert rt.name == orig.name
        assert rt.flag == orig.flag
        assert rt.chromosome == orig.chromosome
        assert rt.reference_start == orig.reference_start
        assert rt.mapq == orig.mapq
        assert rt.cigartuples == orig.cigartuples
        assert rt.sequence == orig.sequence
        assert rt.qualities == orig.qualities
        assert rt.hp == orig.hp

    # region fetch overlap semantics
    assert [r.name for r in reader.fetch("chr1", 0, 101)] == ["r1"]
    assert [r.name for r in reader.fetch("chr1", 110, 120)] == ["r1"]
    assert [r.name for r in reader.fetch("chr1", 117, 300)] == ["r2"]
    assert [r.name for r in reader.fetch("chr2", 0, 500)] == ["r3"]
    assert [r.name for r in reader.fetch("chr3", 0, 10)] == []


def test_fasta_roundtrip(tmp_path):
    seqs = {"chr1": "ACGTACGTACGTACGTACGT" * 7, "chr2": "TTTTACGGA"}
    path = str(tmp_path / "ref.fa")
    write_fasta(path, seqs, line_width=13)
    f = FastaFile(path)
    assert f.chromosomes() == ["chr1", "chr2"]
    assert f.length("chr1") == 140
    assert f.fetch("chr1", 0, 140) == seqs["chr1"]
    assert f.fetch("chr1", 25, 40) == seqs["chr1"][25:40]
    assert f.fetch("chr2", 3, 9) == seqs["chr2"][3:9]
    view = ChromView(f, "chr1")
    assert view[10:23] == seqs["chr1"][10:23]
    assert len(view) == 140


def test_vcf_normalization():
    ref_seq = "ACGTACGTAC"
    ref_lookup = lambda chrom, pos: ref_seq[pos]
    # deletion 'TAC' -> 'T' stays put
    pos, ref, alts = normalize_site("c", 3, "TAC", ["T"], ref_lookup)
    assert (pos, ref, alts) == (3, "TAC", ["T"])
    # trailing shared base trimmed: TACG/TG -> TAC/T
    pos, ref, alts = normalize_site("c", 3, "TACG", ["TG"], ref_lookup)
    assert (pos, ref, alts) == (3, "TAC", ["T"])
    # empty alt gets left extension: pos 4 'AC'->'' becomes pos 3 'TAC'->'T'
    pos, ref, alts = normalize_site("c", 4, "AC", [""], ref_lookup)
    assert (pos, ref, alts) == (3, "TAC", ["T"])
    # left parsimony: AAC->AAT trims to C->T
    pos, ref, alts = normalize_site("c", 3, "TAC", ["TAT"], ref_lookup)
    assert (pos, ref, alts) == (5, "C", ["T"])


def test_vcf_roundtrip(tmp_path):
    records = [
        VcfRecord("chr2", 99, "A", ["T"], (0, 1), qual=50.0),
        VcfRecord("chr1", 9, "AC", ["A"], (1, 1), qual=30.0),
    ]
    path = str(tmp_path / "out.vcf")
    write_vcf(path, records, contigs={"chr1": 1000, "chr2": 1000})
    got = read_vcf(path)
    # sorted on write
    assert [r.chromosome for r in got] == ["chr1", "chr2"]
    assert got[0].position == 9 and got[0].ref == "AC" and got[0].alt == ["A"]
    assert got[0].gt == (1, 1)
    assert got[1].gt == (0, 1)


def test_simulator_consistency(tmp_path):
    """Simulated reads must re-align perfectly: walking each read's cigar
    against the reference reproduces its sequence outside variant sites."""
    ds = sim.make_dataset(str(tmp_path), ref_length=4000, num_variants=8,
                          coverage=20, read_length=100, seed=7)
    reader = BamReader(ds.bams["illumina"])
    reads = list(reader)
    assert len(reads) > 100
    var_positions = set()
    for v in ds.variants:
        var_positions.update(range(v.position, v.position + len(v.ref)))
    checked = 0
    for read in reads[:200]:
        rf, rd = read.reference_start, 0
        for op, length in read.cigartuples:
            if op == BAM_CMATCH:
                for j in range(length):
                    if (rf + j) not in var_positions:
                        assert read.sequence[rd + j] == ds.reference[rf + j]
                        checked += 1
                rf += length
                rd += length
            elif op == BAM_CDEL:
                rf += length
            elif op == BAM_CINS:
                rd += length
    assert checked > 1000
    truth = read_vcf(ds.truth_vcf)
    assert len(truth) == len(ds.variants)


def _random_sorted_reads(rng, chromosomes, n_reads, chrom_len=300_000,
                         read_len=100):
    reads = []
    for ci, chrom in enumerate(chromosomes):
        starts = np.sort(rng.randint(0, chrom_len - read_len,
                                     size=n_reads // len(chromosomes)))
        for i, start in enumerate(starts):
            seq = "".join("ACGT"[b] for b in rng.randint(0, 4, read_len))
            reads.append(AlignedRead(
                f"r{ci}_{i}", 0, chrom, int(start), 60,
                [(BAM_CMATCH, read_len)], seq, [30] * read_len))
    return reads


def test_bai_indexed_fetch_matches_linear_scan(tmp_path):
    """Fuzz: indexed fetch must return exactly the reads a full scan finds
    overlapping the region, for many random regions on a multi-chromosome
    BAM (reference parity: pysam bam.fetch, PileupContainerLite.py:505-527)."""
    rng = np.random.RandomState(0)
    chroms = [("chrA", 300_000), ("chrB", 300_000), ("chrC", 300_000)]
    reads = _random_sorted_reads(rng, [c for c, _ in chroms], 3000)
    path = str(tmp_path / "indexed.bam")
    write_bam(path, chroms, reads)
    assert os.path.exists(path + ".bai")

    reader = BamReader(path)
    all_reads = list(reader)
    for _ in range(25):
        chrom = ["chrA", "chrB", "chrC"][rng.randint(0, 3)]
        start = int(rng.randint(0, 299_000))
        stop = start + int(rng.randint(1, 5000))
        got = {(r.name, r.reference_start)
               for r in reader.fetch(chrom, start, stop)}
        want = {(r.name, r.reference_start) for r in all_reads
                if r.chromosome == chrom and r.reference_start < stop
                and r.reference_end > start}
        assert got == want, (chrom, start, stop)


def test_build_index_for_unindexed_bam(tmp_path):
    """A sorted BAM without a .bai gets one built (and persisted) on the
    first fetch; results match the linear scan."""
    rng = np.random.RandomState(1)
    reads = _random_sorted_reads(rng, ["chrA"], 500)
    path = str(tmp_path / "noindex.bam")
    write_bam(path, [("chrA", 300_000)], reads, write_index=False)
    assert not os.path.exists(path + ".bai")

    reader = BamReader(path)
    got = {r.name for r in reader.fetch("chrA", 100_000, 110_000)}
    assert os.path.exists(path + ".bai"), "index should be persisted"
    want = {r.name for r in reads
            if r.reference_start < 110_000 and r.reference_end > 100_000}
    assert got == want

    # a fresh reader loads the persisted index
    reader2 = BamReader(path)
    assert {r.name for r in reader2.fetch("chrA", 100_000, 110_000)} == want


def test_unsorted_bam_fetch_falls_back_to_scan(tmp_path):
    rng = np.random.RandomState(2)
    reads = _random_sorted_reads(rng, ["chrA"], 200)
    rng.shuffle(reads)
    path = str(tmp_path / "unsorted.bam")
    write_bam(path, [("chrA", 300_000)], reads)
    assert not os.path.exists(path + ".bai")   # writer detects unsortedness

    reader = BamReader(path)
    got = {r.name for r in reader.fetch("chrA", 50_000, 60_000)}
    want = {r.name for r in reads
            if r.reference_start < 60_000 and r.reference_end > 50_000}
    assert got == want
    assert not os.path.exists(path + ".bai")


def test_indexed_fetch_is_o_region(tmp_path):
    """Region fetch must decompress only the blocks covering the region,
    not the whole file."""
    from hello_tpu.io import bam as bam_mod

    rng = np.random.RandomState(3)
    chroms = [("chrA", 300_000), ("chrB", 300_000)]
    reads = _random_sorted_reads(rng, ["chrA", "chrB"], 6000)
    path = str(tmp_path / "big.bam")
    write_bam(path, chroms, reads)

    reader = BamReader(path)
    counting = {"n": 0}
    orig = bam_mod.BgzfFile.read_block

    def counted(self, coffset):
        counting["n"] += 1
        return orig(self, coffset)

    bam_mod.BgzfFile.read_block = counted
    try:
        counting["n"] = 0
        list(reader.fetch("chrB", 200_000, 201_000))
        region_blocks = counting["n"]
        counting["n"] = 0
        list(reader)
        full_blocks = counting["n"]
    finally:
        bam_mod.BgzfFile.read_block = orig
    assert region_blocks < full_blocks / 5, (region_blocks, full_blocks)


def test_long_cigar_cg_tag_roundtrip(tmp_path):
    """Alignments with >65535 cigar ops use the SAM long-cigar encoding
    (kS/mN placeholder + CG:B,I aux); both codecs must transparently
    restore the real cigar."""
    n_pairs = 40_000                                 # 80_001 ops total
    cigars = []
    seq_len = 0
    ref_len = 0
    for _ in range(n_pairs):
        cigars.append((BAM_CMATCH, 2))
        cigars.append((BAM_CINS, 1))
        seq_len += 3
        ref_len += 2
    cigars.append((BAM_CMATCH, 4))
    seq_len += 4
    ref_len += 4
    assert len(cigars) > 65535
    rng = np.random.RandomState(0)
    seq = "".join("ACGT"[b] for b in rng.randint(0, 4, seq_len))
    read = AlignedRead("ultra", 0, "chr1", 100, 60, cigars, seq,
                       [30] * seq_len, hp=2)
    path = str(tmp_path / "long.bam")
    write_bam(path, [("chr1", ref_len + 1000)], [read])

    got = list(BamReader(path))
    assert len(got) == 1
    rt = got[0]
    assert rt.cigartuples == cigars
    assert rt.sequence == seq
    assert rt.hp == 2                                # tags after CG still parse
    assert rt.reference_end == 100 + ref_len

    # indexed fetch sees the correct span
    hits = list(BamReader(path).fetch("chr1", 100 + ref_len - 10,
                                      100 + ref_len + 5))
    assert [r.name for r in hits] == ["ultra"]

    # native codec parity
    from hello_tpu import native
    if native.available():
        nb = native.NativeBam(path)
        nr = nb.read(0)
        assert nr.cigartuples == cigars
        assert nr.sequence == seq
        assert nr.hp == 2
        assert int(nb.ref_ends[0]) == 100 + ref_len


def test_bai_cache_fallback_for_readonly_dir(tmp_path, monkeypatch):
    """A BAM in a read-only directory still gets O(region) access: the built
    index persists in the per-user cache, is found by _bai_path_for, and the
    native region open uses it (no whole-file decode)."""
    import os

    from hello_tpu import native, sim
    from hello_tpu.io import bam as bam_mod

    d = tmp_path / "ro"
    ds = sim.make_dataset(str(d), ref_length=12_000, num_variants=10,
                          coverage=20, read_length=100, seed=4)
    bam = ds.bams["illumina"]
    os.remove(bam + ".bai")                # drop the simulator-written index
    cache = bam_mod._bai_cache_path(bam)
    if os.path.exists(cache):
        os.remove(cache)

    # simulate a read-only BAM directory (chmod is useless as root): saving
    # next to the BAM raises, the cache location stays writable
    real_save = bam_mod.BaiIndex.save

    def guarded_save(self, path):
        if os.path.dirname(os.path.abspath(path)) == str(d):
            raise OSError(30, "Read-only file system", path)
        return real_save(self, path)

    monkeypatch.setattr(bam_mod.BaiIndex, "save", guarded_save)
    try:
        idx = bam_mod.build_index(bam)
        assert idx is not None
        assert not os.path.exists(bam + ".bai")
        assert os.path.exists(cache), "index not persisted to the cache"
        assert bam_mod._bai_path_for(bam) == cache
        if native.available():
            nb = native.NativeBam(bam, region=(ds.chromosome, 2_000, 4_000))
            # region open decoded a strict subset of the file
            whole = native.NativeBam(bam)
            assert 0 < nb.num_reads < whole.num_reads
    finally:
        if os.path.exists(cache):
            os.remove(cache)


def test_vcf_normalize_at_chromosome_start_terminates():
    """A deletion at position 0 in a homopolymer must not left-extend into an
    infinite loop when the reference lookup runs out of chromosome."""
    from hello_tpu.io.vcf import left_align_normalize, normalize_site

    seq = "AAAATG"
    lookup = lambda c, p: seq[p] if 0 <= p < len(seq) else ""
    pos, ref, alts = normalize_site("c", 0, "AA", ["A"], lookup)
    assert ref and alts and all(alts)
    pos2, r2, a2 = left_align_normalize("c", 0, "AA", "A", lookup)
    assert r2 and a2


def test_vcf_sorts_in_contig_header_order(tmp_path):
    """Record order must follow the ##contig header order, not lexicographic
    chromosome names (chr1, chr10, ..., chr2 breaks tabix/bcftools)."""
    from hello_tpu.io.vcf import VcfRecord, write_vcf

    contigs = {f"chr{i}": 1000 for i in list(range(1, 23))}
    records = [VcfRecord(f"chr{i}", 10, "A", ["T"], (0, 1))
               for i in (10, 2, 1, 22)]
    out = tmp_path / "order.vcf"
    write_vcf(str(out), records, contigs=contigs)
    body = [l.split("\t")[0] for l in open(out) if not l.startswith("#")]
    assert body == ["chr1", "chr2", "chr10", "chr22"]


def test_bed_half_open_boundary():
    from hello_tpu.io.bed import BedRegions

    bed = BedRegions({"c": [(10, 23)]})
    assert not bed.intersects("c", 5, 10)    # adjacent, not overlapping
    assert bed.intersects("c", 5, 11)
    assert not bed.intersects("c", 23, 30)


def test_stream_writer_matches_write_bam(tmp_path):
    """BamStreamWriter fed in arbitrary chunks must produce byte-identical
    .bam and .bai to the one-shot write_bam (it is the bounded-memory path
    genome-scale simulation uses)."""
    import random

    from hello_tpu.io.bam import BamStreamWriter

    rng = random.Random(3)
    ref = sim.random_reference(9000, rng)
    variants = sim.plant_variants(ref, 12, rng)
    reads = sim.simulate_reads(ref, variants, "chrZ", 25.0, 110, rng)
    refs = [("chrZ", len(ref))]

    one = str(tmp_path / "one.bam")
    write_bam(one, refs, reads)
    two = str(tmp_path / "two.bam")
    with BamStreamWriter(two, refs) as w:
        # uneven chunks, including a tiny one straddling block boundaries
        w.add_reads(reads[:7])
        w.add_reads(reads[7:8])
        w.add_reads(reads[8:])
    with open(one, "rb") as a, open(two, "rb") as b:
        assert a.read() == b.read()
    with open(one + ".bai", "rb") as a, open(two + ".bai", "rb") as b:
        assert a.read() == b.read()


def test_merge_vcfs_streams_sorted_shards(tmp_path):
    """Per-shard sorted VCFs k-way merge into one sorted output (the
    whole-genome path: O(shards) memory, reference prepareVcf.py:185-260)."""
    from hello_tpu.io.vcf import VcfRecord, merge_vcfs, read_vcf, write_vcf

    contigs = {"chr2": 1000, "chr10": 1000}   # header order != lexicographic
    a = [VcfRecord("chr2", 5, "A", ["T"], (0, 1)),
         VcfRecord("chr10", 7, "C", ["G"], (1, 1))]
    b = [VcfRecord("chr2", 3, "G", ["C"], (0, 1)),
         VcfRecord("chr2", 50, "T", ["A"], (0, 1)),
         VcfRecord("chr10", 2, "A", ["AC"], (0, 1))]
    pa, pb = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    write_vcf(pa, a, contigs=contigs)
    write_vcf(pb, b, contigs=contigs)
    out = str(tmp_path / "merged.vcf")
    merge_vcfs([pa, pb], out, contigs=contigs)
    got = read_vcf(out)
    assert [(r.chromosome, r.position) for r in got] == [
        ("chr2", 3), ("chr2", 5), ("chr2", 50), ("chr10", 2), ("chr10", 7)]


def test_merge_vcfs_unsorted_input_falls_back(tmp_path):
    """A foreign, internally-unsorted input must still merge correctly
    (in-memory fallback — the reference's vcf-sort accepts any order)."""
    from hello_tpu.io.vcf import VcfRecord, format_record, merge_vcfs, read_vcf

    # hand-write an UNSORTED shard (write_vcf would sort it)
    unsorted = tmp_path / "u.vcf"
    recs = [VcfRecord("chr1", 90, "A", ["T"], (0, 1)),
            VcfRecord("chr1", 10, "C", ["G"], (1, 1))]
    with open(unsorted, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL"
                 "\tFILTER\tINFO\tFORMAT\tS\n")
        for r in recs:
            fh.write(format_record(r) + "\n")
    out = str(tmp_path / "merged.vcf")
    merge_vcfs([str(unsorted)], out)
    got = read_vcf(out)
    assert [(r.chromosome, r.position) for r in got] == [
        ("chr1", 10), ("chr1", 90)]


def test_merge_vcfs_hierarchical_many_shards(tmp_path):
    """More shards than max_open merge hierarchically (bounded file handles)
    with output identical to a flat merge."""
    from hello_tpu.io.vcf import VcfRecord, merge_vcfs, read_vcf, write_vcf

    paths = []
    for i in range(9):
        p = str(tmp_path / f"s{i}.vcf")
        write_vcf(p, [VcfRecord("chr1", 10 * i + j, "A", ["T"], (0, 1))
                      for j in range(3)])
        paths.append(p)
    flat, hier = str(tmp_path / "flat.vcf"), str(tmp_path / "hier.vcf")
    merge_vcfs(paths, flat)
    merge_vcfs(paths, hier, max_open=2)
    assert open(flat).read() == open(hier).read()
    assert len(read_vcf(hier)) == 27


def test_vcf_gz_roundtrip_and_region_fetch(tmp_path):
    """BGZF .vcf.gz + .tbi: gzip-readable roundtrip, and the indexed region
    fetch returns exactly the overlapping records (the index's
    self-verification — no htslib in this environment)."""
    import os
    import random

    from hello_tpu.io.vcf import (VcfRecord, fetch_vcf_gz, read_vcf,
                                  write_vcf, write_vcf_gz)

    rng = random.Random(7)
    contigs = {"chr2": 400_000, "chr10": 400_000}
    records = []
    for chrom in contigs:
        for _ in range(2000):
            p = rng.randrange(0, 399_000)
            records.append(VcfRecord(chrom, p, "ACGT"[p % 4] * (1 + p % 3),
                                     ["T"], (0, 1)))
    path = str(tmp_path / "calls.vcf.gz")
    tbi = write_vcf_gz(path, records, contigs=contigs)
    assert os.path.exists(tbi)

    got = read_vcf(path)              # gzip reads BGZF (multi-member gzip)
    assert len(got) == len(records)
    assert [r.chromosome for r in got[:1]] == ["chr2"]

    # region fetches vs a brute-force scan, incl. spanning-deletion overlap
    for chrom, start, stop in (("chr2", 100_000, 120_000),
                               ("chr10", 0, 5_000),
                               ("chr10", 399_000, 400_000),
                               ("chr2", 0, 400_000)):
        want = [(r.chromosome, r.position, r.ref) for r in got
                if r.chromosome == chrom
                and r.position + len(r.ref) > start and r.position < stop]
        have = [(r.chromosome, r.position, r.ref)
                for r in fetch_vcf_gz(path, chrom, start, stop)]
        assert have == want, (chrom, start, stop, len(have), len(want))
    assert list(fetch_vcf_gz(path, "chrMissing", 0, 100)) == []


def test_write_vcf_delegates_gz(tmp_path):
    """write_vcf with a .gz path produces indexed BGZF output — so every
    caller/merge path supports --out calls.vcf.gz transparently."""
    import os

    from hello_tpu.io.vcf import VcfRecord, read_vcf, write_vcf

    recs = [VcfRecord("chr1", 5, "A", ["G"], (1, 1)),
            VcfRecord("chr1", 2, "C", ["T"], (0, 1))]
    path = str(tmp_path / "out.vcf.gz")
    write_vcf(path, recs, contigs={"chr1": 1000})
    assert os.path.exists(path + ".tbi")
    got = read_vcf(path)
    assert [(r.position, r.ref) for r in got] == [(2, "C"), (5, "A")]


def test_merge_vcfs_output_among_inputs(tmp_path):
    """Re-running `merge --inputs 'dir/*.vcf' --out dir/calls.vcf` globs the
    previous output as an input; the merge must not truncate it before
    reading (staged write + atomic replace)."""
    from hello_tpu.io.vcf import VcfRecord, merge_vcfs, read_vcf, write_vcf

    a = str(tmp_path / "a.vcf")
    out = str(tmp_path / "calls.vcf")
    write_vcf(a, [VcfRecord("chr1", 1, "A", ["T"], (0, 1)),
                  VcfRecord("chr1", 9, "C", ["G"], (1, 1))])
    write_vcf(out, [VcfRecord("chr1", 4, "G", ["C"], (0, 1)),
                    VcfRecord("chr1", 6, "T", ["A"], (0, 1))])
    merge_vcfs([a, out], out)
    got = [(r.position, r.ref) for r in read_vcf(out)]
    assert got == [(1, "A"), (4, "G"), (6, "T"), (9, "C")]
