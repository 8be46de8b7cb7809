"""Native (C++) engine equivalence tests: fuzz the native backend against the
pure-Python semantic reference on simulated windows, and the native BAM
loader against the Python codec."""

import random

import numpy as np
import pytest

from hello_tpu import native, sim
from hello_tpu.reads import AlignedRead
from hello_tpu.window import Window

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class RefView:
    def __init__(self, seq):
        self.seq = seq

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, index):
        if isinstance(index, slice):
            return self.seq[max(0, index.start):index.stop]
        return self.seq[index]


def random_window(seed, hybrid=False):
    """Simulated reads over a random reference with planted variants.

    The reference is padded at the front so windows never go below zero."""
    rng = random.Random(seed)
    pad = 50
    ref = sim.random_reference(1500, rng)
    variants = sim.plant_variants(ref, 5, rng, min_gap=100, start=300)
    reads = sim.simulate_reads(ref, variants, "chrF", 25, 150, rng,
                               name_prefix="i_")
    # adversarial CIGAR rewrites the simulator never produces: splices (N),
    # leading and trailing insertions — the engines must agree on partial
    # start/stop semantics and last_position across all of them
    for i, r in enumerate(reads):
        if len(r.cigartuples) != 1 or r.cigartuples[0][0] != 0:
            continue
        n = r.cigartuples[0][1]
        # keep the spliced span inside the (padded) window bounds
        budget = 1450 - (r.reference_start + n)
        if budget < 10 or n <= 40:
            continue
        gap = rng.randint(5, min(60, budget))
        if i % 7 == 3:
            a = rng.randint(10, n - 30)
            r.cigartuples = [(0, a), (3, gap), (0, n - a - 4), (1, 4)]
        elif i % 7 == 5:
            r.cigartuples = [(1, 3), (0, n - 3 - 10), (3, gap), (0, 10)]
        elif i % 7 == 1:
            # soft-clipped ends (query-only ops the simulator never makes)
            r.cigartuples = [(4, 6), (0, n - 12), (4, 6)]
    if hybrid:
        pb = sim.simulate_reads(ref, variants, "chrF", 12, 400, rng,
                                pacbio=True, hp_tags=True, name_prefix="p_")
        reads = reads + pb
    for r in reads:
        r.reference_start += pad
    return "A" * pad + ref, reads


def build_windows(ref, reads, hybrid, **kw):
    view = RefView(ref)
    wp = Window(reads, 250, 1350, view, "chrF", hybrid=hybrid,
                backend="python", **kw)
    wn = Window(reads, 250, 1350, view, "chrF", hybrid=hybrid,
                backend="native", **kw)
    return wp, wn


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("hybrid", [False, True])
def test_fuzz_native_vs_python(seed, hybrid):
    ref, reads = random_window(seed, hybrid)
    wp, wn = build_windows(ref, reads, hybrid)

    rp = wp.differing_regions()
    rn = wn.differing_regions()
    assert rp == rn, f"regions differ: {rp} vs {rn}"
    if not rp:
        return

    wp.assemble_region(reassemble=hybrid)
    wn.assemble_region(reassemble=hybrid)

    for region in rp:
        assert wp.determine_alleles_in_region(*region) == \
            wn.determine_alleles_in_region(*region)
        wp.assemble(*region)
        wn.assemble(*region)
        ap = sorted(wp.alleles_at_site)
        an = sorted(wn.alleles_at_site)
        assert ap == an, f"alleles differ at {region}: {ap} vs {an}"
        for allele in ap:
            for pacbio in ([False, True] if hybrid else [False]):
                assert wp.num_reads_supporting_allele(allele, pacbio) == \
                    wn.num_reads_supporting_allele(allele, pacbio)
            for index in ([0, 1] if hybrid else [0]):
                fp = wp.compute_features(allele, index)
                fn = wn.compute_features(allele, index)
                np.testing.assert_array_equal(fp, fn)

        # batched site query: native single-call path == python generic path
        # == the per-allele primitives above
        sp = wp.query_site(region[0], region[1], 100)
        sn = wn.query_site(region[0], region[1], 100)
        assert sorted(sp) == sorted(sn)
        for allele in sp:
            np.testing.assert_array_equal(sp[allele][0], sn[allele][0])
            if hybrid:
                np.testing.assert_array_equal(sp[allele][1], sn[allele][1])
            else:
                assert sp[allele][1] is None and sn[allele][1] is None
            if allele in ap:
                wp.assemble(*region)
                np.testing.assert_array_equal(
                    sp[allele][0], wp.compute_features(allele, 0))


def test_native_bam_matches_python(tmp_path):
    from hello_tpu.io.bam import BamReader

    ds = sim.make_dataset(str(tmp_path), ref_length=4000, num_variants=8,
                          coverage=20, read_length=120, seed=17)
    path = ds.bams["illumina"]

    py = BamReader(path)
    nb = native.NativeBam(path)
    assert nb.references == py.references
    py_reads = list(py)
    assert nb.num_reads == len(py_reads)
    for i in [0, 1, len(py_reads) // 2, len(py_reads) - 1]:
        a, b = py_reads[i], nb.read(i)
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.reference_start == b.reference_start
        assert a.mapq == b.mapq
        assert a.cigartuples == b.cigartuples
        assert a.sequence == b.sequence
        assert a.qualities == b.qualities
        assert a.hp == b.hp

    # region fetch parity
    for start, stop in [(0, 500), (1000, 1300), (3900, 4000)]:
        got_py = sorted(r.name for r in py.fetch("chrS", start, stop))
        got_nb = sorted(r.name for r in nb.fetch("chrS", start, stop))
        assert got_py == got_nb


def test_native_hp_features(tmp_path):
    """HP channel propagates through the native path."""
    ref, reads = random_window(42, hybrid=True)
    wp, wn = build_windows(ref, reads, True, include_hp=True)
    regions = wp.differing_regions()
    assert regions == wn.differing_regions()
    if not regions:
        pytest.skip("no regions in this seed")
    wp.assemble_region(reassemble=False)
    wn.assemble_region(reassemble=False)
    region = regions[0]
    wp.assemble(*region)
    wn.assemble(*region)
    for allele in sorted(wp.alleles_at_site):
        fp = wp.compute_features(allele, 1)
        fn = wn.compute_features(allele, 1)
        assert fp.shape[2] == 7
        np.testing.assert_array_equal(fp, fn)


def test_native_region_open_matches_whole_file(tmp_path):
    """htpu_bam_open_region (BAI seek) must contain exactly the records of
    the whole-file decode that overlap the region, and selections over it
    must match whole-file selections."""
    import numpy as np

    from hello_tpu import native, sim
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    ds = sim.make_dataset(str(tmp_path), ref_length=60_000, num_variants=30,
                          coverage=20, read_length=120, seed=23)
    path = ds.bams["illumina"]
    whole = native.NativeBam(path)
    for start, stop in [(10_000, 12_000), (0, 2_000), (55_000, 60_000),
                        (30_000, 30_100)]:
        region = native.NativeBam(path, region=(ds.chromosome, start, stop))
        got = {(region.read(i).name, int(region.ref_starts[i]))
               for i in range(region.num_reads)}
        rid = whole.ref_id(ds.chromosome)
        mask = ((whole.ref_ids == rid) & (whole.ref_starts < stop)
                & (whole.ref_ends > start))
        want = {(whole.read(int(i)).name, int(whole.ref_starts[int(i)]))
                for i in np.nonzero(mask)[0]}
        assert got == want, (start, stop)

        # selection parity: same seed on the same overlapping read set
        sel_r = region.select(ds.chromosome, start, stop, max_reads=10000,
                              seed=99)
        sel_w = whole.select(ds.chromosome, start, stop, max_reads=10000,
                             seed=99)
        names_r = {region.read(int(i)).name for i in sel_r.indices}
        names_w = {whole.read(int(i)).name for i in sel_w.indices}
        assert names_r == names_w


@pytest.mark.parametrize("seed", [1, 5])
def test_repeated_assemble_with_disjoint_regions(seed):
    """A second assemble_region over different (wider/disjoint) regions must
    behave identically in both engines.  The native engine expands aligned
    pairs clipped to the first call's span and re-expands for the union on a
    later, wider call — this exercises that re-expansion path directly
    (extraction stays one-shot in BOTH engines, so alleles come from the
    first call's regions; supports/features for the new span must still
    agree)."""
    ref, reads = random_window(seed, True)
    wp, wn = build_windows(ref, reads, True)
    regions = wp.differing_regions()
    if len(regions) < 3:
        pytest.skip("need several regions")

    # first assemble: a narrow span (the middle region only)
    mid = [regions[len(regions) // 2]]
    wp._backend.assemble_region(mid, False)
    wn._backend.assemble_region(mid, False)

    # second assemble: the full span (forces the native union re-expansion)
    wp._backend.assemble_region(regions, True)
    wn._backend.assemble_region(regions, True)

    for region in regions:
        wp.assemble(*region)
        wn.assemble(*region)
        assert sorted(wp.alleles_at_site) == sorted(wn.alleles_at_site), region
        for allele in sorted(wp.alleles_at_site):
            for pacbio in (False, True):
                assert wp.num_reads_supporting_allele(allele, pacbio) == \
                    wn.num_reads_supporting_allele(allele, pacbio), \
                    (region, allele, pacbio)


def test_spliced_reads_parity():
    """Reads with N (reference-skip) CIGAR ops — which the simulator never
    emits — must behave identically in both engines: the partial
    insertion/start flags and last_position are CIGAR properties that the
    native clip-scan must reproduce for splices, leading/trailing
    insertions, and insertions right after a skip."""
    rng = random.Random(11)
    ref = sim.random_reference(1200, rng)
    variants = sim.plant_variants(ref, 4, rng, min_gap=120, start=300)
    reads = sim.simulate_reads(ref, variants, "chrF", 25, 150, rng,
                               name_prefix="m_")

    def mk(name, start, cigars, seq_len):
        seq = "".join(rng.choice("ACGT") for _ in range(seq_len))
        return AlignedRead(name=name, flag=0, chromosome="chrF",
                           reference_start=start, mapq=60,
                           cigartuples=cigars, sequence=seq,
                           qualities=[30] * seq_len)

    # spliced read: M N M with an insertion right after the skip
    reads.append(mk("n1", 300, [(0, 60), (3, 200), (1, 4), (0, 56)], 120))
    # spliced read with a trailing insertion
    reads.append(mk("n2", 320, [(0, 80), (3, 150), (0, 36), (1, 4)], 120))
    # leading insertion + splice
    reads.append(mk("n3", 350, [(1, 5), (0, 70), (3, 100), (0, 45)], 120))
    reads.sort(key=lambda r: r.reference_start)

    view = RefView(ref)
    wp = Window(reads, 100, 1100, view, "chrF", backend="python")
    wn = Window(reads, 100, 1100, view, "chrF", backend="native")
    rp = wp.differing_regions()
    rn = wn.differing_regions()
    assert rp == rn and rp, (rp, rn)
    wp.assemble_region()
    wn.assemble_region()
    for region in rp:
        wp.assemble(*region)
        wn.assemble(*region)
        assert sorted(wp.alleles_at_site) == sorted(wn.alleles_at_site), region
        for allele in sorted(wp.alleles_at_site):
            assert wp.num_reads_supporting_allele(allele, False) == \
                wn.num_reads_supporting_allele(allele, False), (region, allele)
            np.testing.assert_array_equal(wp.compute_features(allele, 0),
                                          wn.compute_features(allele, 0))
