"""PacBio strict flank clipping: parity with the reference implementation and
clip-invariance of window outputs.

The production pipeline does NOT clip long reads (window extraction happens at
featurization), which is only sound if clipping cannot change feature/allele
outputs.  These tests provide that evidence:

  1. ``strict_clip_read`` reproduces the reference's ``strictClipRead``
     (PileupContainerLite.py:255-468) exactly, fuzz-checked against the
     reference code itself (imported with a stubbed pysam).
  2. Window outputs (differing regions, alleles, supports, feature bytes)
     are identical between raw long reads and strictly-clipped long reads
     spanning the window boundaries.
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

from hello_tpu.constants import (BAM_CDEL, BAM_CINS, BAM_CMATCH,
                                 BAM_CSOFT_CLIP)
from hello_tpu.reads import AlignedRead, strict_clip, strict_clip_read


def _load_reference_clip():
    """Import the reference strictClipRead with pysam/Bio stubbed out."""
    for mod in ("pysam",):
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import PileupContainer
        import PileupContainerLite
        return PileupContainer, PileupContainerLite
    finally:
        sys.path.pop(0)


def _random_read(rng, max_ops=12):
    """Random alignment: M runs mixed with I/D, optional soft-clip edges."""
    cigars = []
    if rng.rand() < 0.3:
        cigars.append((BAM_CSOFT_CLIP, int(rng.randint(1, 20))))
    cigars.append((BAM_CMATCH, int(rng.randint(5, 60))))
    for _ in range(rng.randint(0, max_ops)):
        op = [BAM_CINS, BAM_CDEL][rng.randint(0, 2)]
        cigars.append((op, int(rng.randint(1, 8))))
        cigars.append((BAM_CMATCH, int(rng.randint(5, 60))))
    if rng.rand() < 0.3:
        cigars.append((BAM_CSOFT_CLIP, int(rng.randint(1, 20))))
    n_read = sum(l for op, l in cigars
                 if op in (BAM_CMATCH, BAM_CINS, BAM_CSOFT_CLIP))
    seq = "".join("ACGT"[b] for b in rng.randint(0, 4, n_read))
    start = int(rng.randint(0, 500))
    return AlignedRead("r", 0, "chrT", start, 60, cigars, seq,
                       list(rng.randint(10, 40, n_read)))


@requires_reference
def test_strict_clip_matches_reference_fuzz():
    PileupContainer, PCL = _load_reference_clip()
    rng = np.random.RandomState(7)
    checked = 0
    for _ in range(300):
        read = _random_read(rng)
        span = read.reference_end - read.reference_start
        position = read.reference_start + int(rng.randint(0, max(span, 1)))
        left = bool(rng.randint(0, 2))
        flank = int(rng.randint(0, 80))

        seg = PileupContainer.AlignedSegmentDummy()
        seg.reference_start = read.reference_start
        seg.reference_end = read.reference_end
        seg.cigartuples = list(read.cigartuples)
        seg.query_sequence = read.sequence
        seg.query_qualities = list(read.qualities)
        # aligned view: full sequence minus soft clips
        lead = read.cigartuples[0][1] if read.cigartuples[0][0] == BAM_CSOFT_CLIP else 0
        tail = read.cigartuples[-1][1] if read.cigartuples[-1][0] == BAM_CSOFT_CLIP else 0
        seg.query_alignment_sequence = read.sequence[lead:len(read.sequence) - tail]
        seg.query_alignment_qualities = list(read.qualities[lead:len(read.qualities) - tail])
        pr = PCL.PileupReadDummy(seg)

        PCL.strictClipRead(pr, position, left=left, flankLength=flank)
        ours = strict_clip_read(read, position, left=left, flank_length=flank)

        assert seg.reference_start == ours.reference_start, (read, position, left, flank)
        assert list(seg.cigartuples) == list(ours.cigartuples), (read, position, left, flank)
        assert seg.query_sequence == ours.sequence, (read, position, left, flank)
        assert list(seg.query_qualities) == list(ours.qualities)
        checked += 1
    assert checked == 300


def _long_reads_spanning(rng, reference, region_start, region_stop,
                         n_reads=30, read_len=1500):
    """Long error-free reads (with one het SNV) spanning the region."""
    snv_pos = (region_start + region_stop) // 2
    reads = []
    for i in range(n_reads):
        # SNV lands well inside the read; read spans far past both region
        # boundaries so the 200 bp clip genuinely truncates it
        start = max(0, snv_pos - int(rng.randint(400, read_len - 400)))
        seq = list(reference[start:start + read_len])
        if i % 2 == 0:
            ref_base = reference[snv_pos]
            alt = "ACGT"[("ACGT".index(ref_base) + 1) % 4]
            seq[snv_pos - start] = alt
        reads.append(AlignedRead(
            f"pb{i}", 0, "chrT", start, 60, [(BAM_CMATCH, len(seq))],
            "".join(seq), [30] * len(seq), pacbio=True))
    return reads


def test_window_outputs_clip_invariant():
    """Feature/allele outputs are identical whether or not long reads are
    strictly clipped to the reference's 200 bp fetch flanks — the evidence
    that omitting clipReads (PileupDataTools.py:153) cannot change calls."""
    from hello_tpu.window import Window

    rng = np.random.RandomState(5)
    reference = "".join("ACGT"[b] for b in rng.randint(0, 4, 4000))
    region_start, region_stop = 1900, 2000

    raw = _long_reads_spanning(rng, reference, region_start, region_stop)
    clipped = [strict_clip(r, region_start, region_stop, flank_length=200)
               for r in raw]
    # the clip must actually remove bases for this test to mean anything
    assert sum(len(r.sequence) for r in clipped) < \
        sum(len(r.sequence) for r in raw)

    class RefView:
        def __getitem__(self, sl):
            return reference[sl]

        def __len__(self):
            return len(reference)

    outs = []
    for reads in (raw, clipped):
        w = Window(reads, region_start, region_stop, RefView(), "chrT",
                   pacbio=True)
        regions = w.differing_regions(strict=True)
        w.assemble_region(reassemble=False)
        alleles, feats, supports = [], [], []
        for a, b in regions:
            w.assemble(a, b)
            site_alleles = sorted(w.alleles_at_site)
            alleles.append((a, b, tuple(site_alleles)))
            for al in site_alleles:
                supports.append(
                    w.num_reads_supporting_allele(al, pacbio=True))
                feats.append(w.compute_features(al).tobytes())
        outs.append((regions, alleles, supports, feats))
    assert outs[0][0], "test must produce at least one differing region"
    assert outs[0] == outs[1]
