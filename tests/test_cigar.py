"""CIGAR left-alignment tests: the reference's 6 compile-gated C++ test cases
(reference c++/src/leftAlignCigars.cpp:428-524) plus invariants."""

import pytest

from hello_tpu.cigar import (count_mismatches, left_align_cigars,
                             simplify_cigars)
from hello_tpu.constants import (BAM_CDEL, BAM_CINS, BAM_CMATCH,
                                 BAM_CSOFT_CLIP)

REF = "ACGATATATACCAGTATATATATATATATATATATATATAGGATACGATA"

M, I, D, S = BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP


def align(read, start, cigars, ref=REF):
    return left_align_cigars(read, start, cigars, ref)


def read_len(cigars):
    return sum(l for op, l in cigars if op in (M, I, S))


def ref_len(cigars):
    return sum(l for op, l in cigars if op in (M, D))


def test_case1_pure_match_unchanged():
    read = "TATACCAGTATATATATATATATATATATATATAGGA"
    start, cigars = align(read, 6, [(M, len(read))])
    assert cigars == [(M, len(read))]
    assert start == 6


def test_case2_deletion_left_shifts():
    read = "TATACCAGTATATATATATATATATATATATAGGA"
    start, cigars = align(read, 6, [(M, 25), (D, 2), (M, 10)])
    # the TA deletion in the TA-repeat shifts to the repeat's left edge
    assert ref_len(cigars) == 37
    assert read_len(cigars) == len(read)
    assert (D, 2) in cigars
    d_at = sum(l for op, l in cigars[:cigars.index((D, 2))] if op in (M, D))
    assert d_at < 25  # strictly left of where it started
    assert count_mismatches(read, start, cigars, REF) == 0


def test_case3_insertion_and_deletion_both_shift():
    read = "TATACCAGTATATATATATATATATATATATATAGGA"
    start, cigars = align(read, 6, [(M, 10), (I, 2), (M, 15), (D, 2), (M, 10)])
    assert read_len(cigars) == len(read)
    assert count_mismatches(read, start, cigars, REF) == 0
    ins_idx = [k for k, (op, _l) in enumerate(cigars) if op == I]
    del_idx = [k for k, (op, _l) in enumerate(cigars) if op == D]
    if ins_idx and del_idx:
        # both present: each shifted into the repeat's left edge
        i_at = sum(l for op, l in cigars[:ins_idx[0]] if op in (M, I))
        assert i_at <= 10


def test_case4_adjacent_ins_del_collapse_to_match():
    read = "TATACCAGTATAGATATATATATATATATATATAGGA"
    start, cigars = align(read, 6, [(M, 12), (I, 1), (D, 1), (M, 24)])
    # the G insertion + A deletion cannot collapse (G != A at that spot),
    # but alignment invariants must hold
    assert read_len(cigars) == len(read)
    assert ref_len(cigars) == 12 + 1 + 24


def test_case5_softclip_preserved():
    read = "TATATATATATATATATATATATAGGATACTTTT"
    start, cigars = align(read, 14, [(M, 2), (D, 2), (M, 28), (S, 4)])
    assert cigars[-1] == (S, 4)
    assert read_len(cigars) == len(read)


def test_case6_no_shift_across_mismatch():
    ref = "ACGATATATACCAGTATATATATATACATATATATATATAGGATACGATA"
    read = "CAGTATATATATATATATATATATATAGG"
    start, cigars = align(read, 11, [(M, 22), (D, 2), (M, 7)], ref=ref)
    # expected 16M 2D 13M: the shift stops at the C->T mismatch boundary
    assert cigars == [(M, 16), (D, 2), (M, 13)], cigars
    assert start == 11


def test_simplify_merges_adjacent():
    ref = "ACGTACGTAC"
    read = "ACGTACGT"
    out = simplify_cigars([(M, 3), (M, 5)], read, 0, ref)
    assert out == [(M, 8)]


def test_simplify_collapses_id_pair_spelling_matches():
    # read == ref: an equal-length I/D pair that spells matches collapses
    ref = "ACGTACGTAC"
    read = "ACGTACGTAC"
    out = simplify_cigars([(M, 4), (I, 2), (D, 2), (M, 4)], read, 0, ref)
    assert out == [(M, 10)]


def test_mismatch_count_preserved_fuzz():
    import random
    rng = random.Random(3)
    for _ in range(50):
        ref = "".join(rng.choice("AT") for _ in range(60))
        # random alignment with one indel in a repeat-ish reference
        start = rng.randint(5, 10)
        m1 = rng.randint(3, 12)
        indel = (I, rng.randint(1, 3)) if rng.random() < 0.5 else (D, rng.randint(1, 3))
        m2 = rng.randint(5, 20)
        cigars = [(M, m1), indel, (M, m2)]
        rlen = read_len(cigars)
        # build the read consistent with the alignment
        read = []
        rd, rf = 0, start
        for op, l in cigars:
            if op == M:
                read.append(ref[rf:rf + l])
                rf += l
            elif op == I:
                read.append("".join(rng.choice("AT") for _ in range(l)))
            elif op == D:
                rf += l
        read = "".join(read)
        before = count_mismatches(read, start, cigars, ref)
        new_start, new_cigars = left_align_cigars(read, start, list(cigars), ref)
        after = count_mismatches(read, new_start, new_cigars, ref)
        assert after == before, (ref, read, cigars, new_cigars)
        assert read_len(new_cigars) == rlen


def test_window_left_align_option():
    """Window(left_align=True) normalises repeat-region indels so reads with
    equivalent but differently-placed deletions agree on the hotspot."""
    from hello_tpu.reads import AlignedRead
    from hello_tpu.window import Window

    class RefView:
        def __init__(self, seq):
            self.seq = seq

        def __len__(self):
            return len(self.seq)

        def __getitem__(self, index):
            if isinstance(index, slice):
                return self.seq[max(0, index.start):index.stop]
            return self.seq[index]

    pad = 30
    core = "ACGA" + "TA" * 14 + "GGATACGATA"
    ref = "C" * pad + core + "C" * 30
    # two reads with the same TA deletion placed at different repeat offsets
    reads = []
    for i, del_at in enumerate([8, 16]):
        start = pad + 2
        seq = ref[start:pad + 4 + del_at] + ref[pad + 4 + del_at + 2:pad + 50]
        m1 = (pad + 4 + del_at) - start
        m2 = len(seq) - m1
        reads.append(AlignedRead(
            f"r{i}", 0, "c", start, 60,
            [(M, m1), (D, 2), (M, m2)], seq, [30] * len(seq)))
    reads = reads * 3  # reach the min-count threshold
    for k, r in enumerate(reads):
        r.name = f"r{k}"

    view = RefView(ref)
    aligned = Window([AlignedRead(r.name, r.flag, r.chromosome,
                                  r.reference_start, r.mapq,
                                  list(r.cigartuples), r.sequence,
                                  list(r.qualities)) for r in reads],
                     pad, pad + 60, view, "c", backend="python",
                     left_align=True)
    regions = aligned.differing_regions()
    # after left-alignment both deletions anchor at the repeat's left edge:
    # exactly one differing region
    assert len(regions) == 1, regions
