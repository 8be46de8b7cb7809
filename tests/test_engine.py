"""Golden tests for the host engine: counting, hotspot detection, assembly,
support maps, and the colored featurizer.

The featurizer golden follows the reference's test strategy (reference
python/test_aligner.py): an *independent* aligned-pairs-based encoder is
implemented here in the test and compared element-wise against the engine's
cigar-walk featurizer on hand-constructed reads.
"""

import numpy as np
import pytest

from hello_tpu.constants import (
    BAM_CDEL, BAM_CINS, BAM_CMATCH, HP_TRACK, POSITION_MARKER_TRACK,
    READ_BASE_TRACK, READ_MAPQ_TRACK, READ_ORIENTATION_TRACK, READ_QUAL_TRACK,
    REF_BASE_TRACK,
)
from hello_tpu.reads import AlignedRead, FLAG_REVERSE
from hello_tpu.window import Window


class RefView:
    """Minimal chromosome view over a plain string."""

    def __init__(self, seq):
        self.seq = seq

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, index):
        if isinstance(index, slice):
            return self.seq[max(0, index.start):index.stop]
        return self.seq[index]


def mk_read(name, seq, qual, cigars, ref_start, mapq=40, reverse=False,
            pacbio=False, hp=0):
    return AlignedRead(
        name=name, flag=(FLAG_REVERSE if reverse else 0), chromosome="ref",
        reference_start=ref_start, mapq=mapq, cigartuples=cigars,
        sequence=seq, qualities=list(qual), hp=hp, pacbio=pacbio)


# -- independent golden encoder (aligned-pairs walk, distinct from the
#    engine's cigar-walk renderer) -------------------------------------------

BASE_COLORS = {"A": 250, "G": 180, "T": 100, "C": 30, "*": 0}
STRAND = {1: 70, -1: 240}
HP_COLORS = {0: 0, 1: 120, 2: 240}


def qcolor(q, cap):
    return int(254 * (min(q, cap) / cap))


def golden_encode(read, reference, feature_length, variant_range, include_hp):
    channels = 7 if include_hp else 6
    arr = np.zeros((feature_length, channels), np.uint8)
    mid = sum(variant_range) // 2
    start_point = mid - feature_length // 2
    allele = ""
    rd, rf = 0, read.reference_start

    def write(fp, ref_base, read_base, read_q, pos):
        arr[fp, READ_BASE_TRACK] = BASE_COLORS[read_base]
        arr[fp, REF_BASE_TRACK] = BASE_COLORS[ref_base]
        arr[fp, READ_QUAL_TRACK] = qcolor(read_q, 40)
        arr[fp, READ_MAPQ_TRACK] = qcolor(read.mapq, 60)
        arr[fp, READ_ORIENTATION_TRACK] = STRAND[read.orientation]
        arr[fp, POSITION_MARKER_TRACK] = \
            240 if variant_range[0] <= pos < variant_range[1] else 70
        if include_hp:
            arr[fp, HP_TRACK] = HP_COLORS[read.hp]

    for op, length in read.cigartuples:
        if op == BAM_CMATCH:
            for _ in range(length):
                if start_point <= rf < start_point + feature_length:
                    write(rf - start_point, reference[rf], read.sequence[rd],
                          read.qualities[rd], rf)
                if variant_range[0] <= rf < variant_range[1]:
                    allele += read.sequence[rd]
                rf += 1
                rd += 1
        elif op == BAM_CDEL:
            for i in range(-1, length):
                p = rf + i
                if start_point <= p < start_point + feature_length:
                    write(p - start_point, reference[p], "*",
                          read.qualities[rd - 1] if i == -1 else 0, p)
            rf += length
        elif op == BAM_CINS:
            if start_point <= rf - 1 < start_point + feature_length:
                write(rf - 1 - start_point, reference[rf - 1], "*",
                      min(read.qualities[rd - 1:rd + length]), rf - 1)
            if variant_range[0] <= rf - 1 < variant_range[1]:
                allele += read.sequence[rd:rd + length]
            rd += length
    return arr, allele


PAD = 20  # shift the scenario away from position 0 (windows extend -10bp)
REFERENCE = "A" * PAD + "ACGATACCGTACGGATCGGATCGT"


def scenario_reads(hp_tags=False):
    """The reference test_aligner scenario: deletion, insertion, and SNV reads
    over a 24bp reference segment (shifted by PAD)."""
    read0 = mk_read("r0", "TAATCG", [26] * 6,
                    [(BAM_CMATCH, 2), (BAM_CDEL, 3), (BAM_CMATCH, 4)], PAD + 9,
                    mapq=30, reverse=True, hp=1 if hp_tags else 0)
    read1 = mk_read("r1", "TAACGGATCG", [30] * 10,
                    [(BAM_CMATCH, 2), (BAM_CINS, 1), (BAM_CMATCH, 7)], PAD + 9,
                    mapq=44, hp=0)
    read2 = mk_read("r2", "TGCGGATCG", [15] * 9,
                    [(BAM_CMATCH, 9)], PAD + 9, mapq=75, hp=2 if hp_tags else 0)
    return [read0, read1, read2]


@pytest.mark.parametrize("hp_tags", [False, True])
def test_featurizer_golden(hp_tags):
    reads = scenario_reads(hp_tags)
    window = Window(reads, PAD, len(REFERENCE), RefView(REFERENCE), "ref",
                    min_mapq=5, q_threshold=10,
                    snv_threshold=0.0, indel_threshold=0.0, min_count=0,
                    include_hp=hp_tags)
    regions = window.differing_regions(strict=True)
    assert len(regions) >= 1
    start, stop = regions[0]

    # independent golden encodings grouped by extracted allele
    feature_length = 10
    window.feature_length = feature_length
    golden = {}
    for r in reads:
        arr, allele = golden_encode(r, REFERENCE, feature_length, (start, stop), hp_tags)
        golden.setdefault(allele, []).append(arr)

    window.assemble_region(reassemble=False)
    window.assemble(start, stop)

    assert set(window.alleles_at_site) == set(golden.keys())
    for allele, rows in golden.items():
        expected = np.stack(rows, axis=0)
        computed = window.compute_features(allele, 0)
        np.testing.assert_array_equal(expected, computed)


def test_snv_detection_and_supports():
    """Het SNV at position 30: half the reads carry the alt."""
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 52bp
    reads = []
    for i in range(10):
        seq = list(ref[12:44])
        if i % 2 == 0:
            seq[30 - 12] = "T"  # ref base at 30 is 'C' (30 % 4 == 2 -> G? compute below)
        reads.append(mk_read(f"r{i}", "".join(seq), [30] * len(seq),
                             [(BAM_CMATCH, len(seq))], 12))
    window = Window(reads, 12, 44, RefView(ref), "ref")
    regions = window.differing_regions()
    assert regions == [(30, 31)]
    window.assemble_region(reassemble=False)
    window.assemble(30, 31)
    alleles = set(window.alleles_at_site)
    ref_base = ref[30]
    assert alleles == {ref_base, "T"}
    assert window.num_reads_supporting_allele("T", False) == 5
    assert window.num_reads_supporting_allele(ref_base, False) == 5


def test_deletion_detection():
    """3bp homozygous deletion: all reads skip ref[25:28]."""
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    seq = ref[10:25] + ref[28:40]
    reads = [mk_read(f"r{i}", seq, [30] * len(seq),
                     [(BAM_CMATCH, 15), (BAM_CDEL, 3), (BAM_CMATCH, 12)], 10)
             for i in range(6)]
    window = Window(reads, 10, 40, RefView(ref), "ref")
    regions = window.differing_regions()
    # deletion marks left flank through right flank: [24, 29)
    assert regions == [(24, 29)]
    window.assemble_region(reassemble=False)
    window.assemble(24, 29)
    # the deletion allele spans [24,29) minus the deleted bases
    expected_allele = ref[24] + ref[28]
    assert expected_allele in window.alleles_at_site
    assert window.num_reads_supporting_allele(expected_allele, False) == 6


def test_insertion_detection():
    """2bp insertion after position 20 in all reads."""
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    ins = "TT"
    seq = ref[12:25] + ins + ref[25:40]
    cigars = [(BAM_CMATCH, 13), (BAM_CINS, 2), (BAM_CMATCH, 15)]
    reads = [mk_read(f"r{i}", seq, [30] * len(seq), cigars, 12)
             for i in range(6)]
    window = Window(reads, 12, 40, RefView(ref), "ref")
    regions = window.differing_regions()
    # insertion marks [pos, pos + len(ref_allele) + 1) = [24, 26)
    assert regions == [(24, 26)]
    window.assemble_region(reassemble=False)
    window.assemble(24, 26)
    expected_allele = ref[24] + ins + ref[25]
    assert expected_allele in window.alleles_at_site
    assert window.num_reads_supporting_allele(expected_allele, False) == 6


def test_low_quality_bases_filtered():
    """Alt observations below the quality threshold don't count."""
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    reads = []
    for i in range(8):
        seq = list(ref[12:44])
        seq[30 - 12] = "T"
        qual = [30] * len(seq)
        qual[30 - 12] = 5  # below the q=10 threshold
        reads.append(mk_read(f"r{i}", "".join(seq), qual,
                             [(BAM_CMATCH, len(seq))], 12))
    window = Window(reads, 12, 44, RefView(ref), "ref")
    assert window.differing_regions() == []


def test_low_mapq_reads_skipped():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    reads = []
    for i in range(8):
        seq = list(ref[12:44])
        seq[30 - 12] = "T"
        reads.append(mk_read(f"r{i}", "".join(seq), [30] * len(seq),
                             [(BAM_CMATCH, len(seq))], 12, mapq=5))
    window = Window(reads, 12, 44, RefView(ref), "ref")
    assert window.differing_regions() == []
