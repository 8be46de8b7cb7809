"""Exact-parity tests for the native chunk orchestrator.

native/src/chunk.cpp runs the whole per-chunk host pipeline (hotspot
subchunks -> active regions -> candidate intervals -> assembly -> per-site
featurization) in one call; the staged Python pipeline in
hello_tpu/pipeline/{hotspots,candidates}.py is the semantic reference.  The
orchestrator consumes the caller's RNG through a callback in the same draw
order, so outputs must match the staged path BIT-EXACTLY: same sites, same
alleles, same labels, byte-identical feature tensors.
"""

import random

import numpy as np
import pytest

from hello_tpu import native, sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.pipeline import parallel_call
from hello_tpu.pipeline.candidates import native_chunk_site_work

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _staged_sites(bam_paths, ref_path, chromosome, start, stop, options,
                  monkeypatch):
    """The reference staged pipeline (fast path disabled)."""
    monkeypatch.setenv("HELLO_TPU_NATIVE_CHUNK", "0")
    try:
        return parallel_call.host_sites_for_chunk(
            bam_paths, ref_path, chromosome, start, stop, options)
    finally:
        monkeypatch.delenv("HELLO_TPU_NATIVE_CHUNK")


def _native_sites(bam_paths, ref_path, chromosome, start, stop, options):
    ref = FastaFile(ref_path)
    rng = random.Random(options.get("seed", 13))
    out = native_chunk_site_work(bam_paths, ref, chromosome, start, stop,
                                 options, rng)
    assert out is not None, "native fast path unexpectedly unavailable"
    return out


def _assert_site_work_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for sa, sb in zip(a, b):
        assert sa.chromosome == sb.chromosome
        assert (sa.start, sa.stop) == (sb.start, sb.stop)
        assert sa.alleles == sb.alleles
        assert list(sa.labels) == list(sb.labels)
        assert sa.site_label == sb.site_label
        np.testing.assert_array_equal(sa.ref_segment, sb.ref_segment)
        assert len(sa.tensors0) == len(sb.tensors0)
        for ta, tb in zip(sa.tensors0, sb.tensors0):
            np.testing.assert_array_equal(ta, tb)
        if sa.tensors1 is None or sb.tensors1 is None:
            assert sa.tensors1 is None and sb.tensors1 is None
        else:
            for ta, tb in zip(sa.tensors1, sb.tensors1):
                np.testing.assert_array_equal(ta, tb)


def _run_case(tmp_path, monkeypatch, platforms, options, **sim_kwargs):
    d = tmp_path / "data"
    ds = sim.make_dataset(str(d), platforms=platforms, **sim_kwargs)
    bam_paths = [ds.bams[p] for p in platforms]
    stop = sim_kwargs.get("ref_length", 8000)
    staged = _staged_sites(bam_paths, ds.fasta, ds.chromosome, 0, stop,
                           options, monkeypatch)
    fast = _native_sites(bam_paths, ds.fasta, ds.chromosome, 0, stop, options)
    assert len(staged) > 0, "test dataset produced no sites"
    _assert_site_work_equal(fast, staged)


def test_chunk_parity_illumina(tmp_path, monkeypatch):
    _run_case(tmp_path, monkeypatch, ("illumina",), {"seed": 13},
              ref_length=30_000, num_variants=60, coverage=35, seed=5)


def test_chunk_parity_pacbio(tmp_path, monkeypatch):
    _run_case(tmp_path, monkeypatch, ("pacbio",),
              {"seed": 13, "pacbio": True},
              ref_length=30_000, num_variants=50, coverage=25, seed=7)


def test_chunk_parity_hybrid(tmp_path, monkeypatch):
    _run_case(tmp_path, monkeypatch, ("illumina", "pacbio"),
              {"seed": 13, "hybrid_hotspot": True},
              ref_length=24_000, num_variants=40, coverage=30, seed=11)


def test_chunk_parity_hybrid_hp(tmp_path, monkeypatch):
    _run_case(tmp_path, monkeypatch, ("illumina", "pacbio"),
              {"seed": 13, "include_hp": True},
              ref_length=20_000, num_variants=35, coverage=30, seed=3,
              hp_tags=True)


@pytest.mark.parametrize("fuzz_seed", range(4))
def test_chunk_parity_fuzz(tmp_path, monkeypatch, fuzz_seed):
    """Randomised datasets and option mixes, exact equality each time."""
    rng = random.Random(1000 + fuzz_seed)
    platforms = rng.choice([("illumina",), ("pacbio",),
                            ("illumina", "pacbio")])
    options = {"seed": rng.randrange(1 << 16)}
    if platforms == ("pacbio",):
        options["pacbio"] = True
    if len(platforms) > 1 and rng.random() < 0.5:
        options["hybrid_hotspot"] = True
    if rng.random() < 0.3:
        options["include_hp"] = True
    _run_case(tmp_path, monkeypatch, platforms, options,
              ref_length=rng.choice([12_000, 20_000]),
              num_variants=rng.randrange(20, 50),
              coverage=rng.choice([20, 35, 50]),
              seed=rng.randrange(1 << 16),
              hp_tags=options.get("include_hp", False))


def test_chunk_empty_region(tmp_path, monkeypatch):
    """A chunk with no hotspots returns an empty site list on both paths."""
    d = tmp_path / "data"
    ds = sim.make_dataset(str(d), ref_length=8000, num_variants=0,
                          coverage=20, seed=2)
    bam_paths = [ds.bams["illumina"]]
    staged = _staged_sites(bam_paths, ds.fasta, ds.chromosome, 0, 8000,
                           {"seed": 13}, monkeypatch)
    fast = _native_sites(bam_paths, ds.fasta, ds.chromosome, 0, 8000,
                         {"seed": 13})
    assert staged == [] and fast == []
