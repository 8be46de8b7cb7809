"""Adversarial cigar fuzzing: random valid reads (soft clips, boundary
insertions/deletions, low qualities, mixed platforms) through both engines.

The regular e2e tests use simulated reads with clean M/I/D cigars; this fuzz
targets the partial-insertion resolution, read-boundary and quality-filter
paths (reference c++ updateAlleleCounts fallthroughs) by comparing the native
engine against the pure-Python semantic reference on everything observable.
"""

import random

import numpy as np
import pytest

from hello_tpu import native
from hello_tpu.constants import (BAM_CDEL, BAM_CINS, BAM_CMATCH,
                                 BAM_CSOFT_CLIP)
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


def random_read(rng: random.Random, ref: str, read_id: int) -> AlignedRead:
    """A syntactically valid read with adversarial cigar structure."""
    ref_start = rng.randint(20, len(ref) - 220)
    cigars = []
    seq = []
    quals = []
    rf = ref_start

    def emit_match(length):
        nonlocal rf
        for i in range(length):
            if rng.random() < 0.06:
                seq.append(rng.choice("ACGTN"))
            else:
                seq.append(ref[rf + i])
            quals.append(rng.choice([2, 8, 12, 30, 40]))
        rf += length
        cigars.append((BAM_CMATCH, length))

    # optionally open with a soft clip or an insertion
    opening = rng.random()
    if opening < 0.25:
        n = rng.randint(1, 8)
        seq.extend(rng.choice("ACGT") for _ in range(n))
        quals.extend(rng.choice([10, 30]) for _ in range(n))
        cigars.append((BAM_CSOFT_CLIP, n))
    elif opening < 0.4:
        n = rng.randint(1, 4)
        seq.extend(rng.choice("ACGT") for _ in range(n))
        quals.extend(rng.choice([10, 30]) for _ in range(n))
        cigars.append((BAM_CINS, n))

    emit_match(rng.randint(5, 40))
    for _ in range(rng.randint(0, 4)):
        op = rng.random()
        if op < 0.4:
            n = rng.randint(1, 5)
            seq.extend(rng.choice("ACGT") for _ in range(n))
            quals.extend(rng.choice([5, 30]) for _ in range(n))
            cigars.append((BAM_CINS, n))
        elif op < 0.8:
            n = rng.randint(1, 5)
            rf += n
            cigars.append((BAM_CDEL, n))
        emit_match(rng.randint(3, 30))

    # optionally close with an insertion or a soft clip
    closing = rng.random()
    if closing < 0.2:
        n = rng.randint(1, 4)
        seq.extend(rng.choice("ACGT") for _ in range(n))
        quals.extend(rng.choice([10, 30]) for _ in range(n))
        cigars.append((BAM_CINS, n))
    elif closing < 0.4:
        n = rng.randint(1, 8)
        seq.extend(rng.choice("ACGT") for _ in range(n))
        quals.extend(rng.choice([10, 30]) for _ in range(n))
        cigars.append((BAM_CSOFT_CLIP, n))

    return AlignedRead(
        name=f"fz{read_id}", flag=16 if read_id % 2 else 0, chromosome="f",
        reference_start=ref_start, mapq=rng.choice([0, 5, 20, 60]),
        cigartuples=cigars, sequence="".join(seq), qualities=quals,
        hp=rng.choice([0, 1, 2]), pacbio=bool(rng.random() < 0.4))


@pytest.mark.skipif(not native.available(), reason="native library not built")
@pytest.mark.parametrize("seed", range(8))
def test_adversarial_cigars_native_vs_python(seed):
    rng = random.Random(1000 + seed)
    ref = "".join(rng.choice("ACGT") for _ in range(600))
    reads = [random_read(rng, ref, i) for i in range(30)]
    view = RefView(ref)

    kw = dict(min_mapq=10, q_threshold=10,
              snv_threshold=0.05, indel_threshold=0.05, min_count=1)
    wp = Window(reads, 50, 550, view, "f", backend="python", **kw)
    wn = Window(reads, 50, 550, view, "f", backend="native", **kw)

    rp = wp.differing_regions()
    rn = wn.differing_regions()
    assert rp == rn, f"seed {seed}: regions {rp} vs {rn}"
    if not rp:
        return

    wp.assemble_region(reassemble=True)
    wn.assemble_region(reassemble=True)
    for region in rp:
        assert wp.determine_alleles_in_region(*region) == \
            wn.determine_alleles_in_region(*region), (seed, region)
        wp.assemble(*region)
        wn.assemble(*region)
        assert sorted(wp.alleles_at_site) == sorted(wn.alleles_at_site), \
            (seed, region)
        for allele in sorted(wp.alleles_at_site):
            for pacbio in (False, True):
                assert wp.num_reads_supporting_allele(allele, pacbio) == \
                    wn.num_reads_supporting_allele(allele, pacbio), \
                    (seed, region, allele, pacbio)
            fp = wp.compute_features(allele, 0)
            fn = wn.compute_features(allele, 0)
            np.testing.assert_array_equal(fp, fn, err_msg=f"{seed} {region} {allele}")


def test_counting_invariants(rng):
    """Total counts at matched positions equal usable read depth."""
    import random as pyrandom
    prng = pyrandom.Random(5)
    ref = "".join(prng.choice("ACGT") for _ in range(400))
    reads = []
    for i in range(15):
        start = 50 + i * 10
        seq = ref[start:start + 100]
        reads.append(AlignedRead(f"r{i}", 0, "c", start, 60,
                                 [(BAM_CMATCH, 100)], seq, [30] * 100))
    view = RefView(ref)
    w = Window(reads, 40, 360, view, "c", backend="python")
    counts = w._backend.counts.counts_i
    for pos in range(100, 150):
        depth = sum(1 for r in reads
                    if r.reference_start <= pos < r.reference_start + 100)
        c = counts[pos - w.window_start]
        assert c.total == depth, (pos, c.total, depth)
        assert c.ref_count == depth  # error-free reads
