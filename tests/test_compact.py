"""Compact device-transfer format: byte-exact reconstruction.

The compact wire format (pipeline/compact.py) ships only the varying feature
channels of real read rows; everything else (reference colors, per-read
constants, the in-region marker, padding) is rebuilt on device.  These tests
run REAL featurizer output (simulated BAMs through the production host path)
through compact -> expand and require byte equality with the dense tensors,
then identical Scorer logits.
"""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.pipeline.batching import pack_sites
from hello_tpu.pipeline.compact import compact_batch, expand_compact
from hello_tpu.pipeline.parallel_call import host_sites_for_chunk


def _sites(tmp_path, platforms=("illumina",), hp_tags=False, **opts):
    ds = sim.make_dataset(str(tmp_path), ref_length=30_000, num_variants=60,
                          coverage=30, read_length=120, seed=7,
                          platforms=platforms, hp_tags=hp_tags)
    bams = [ds.bams[p] for p in platforms]
    options = dict(opts)
    if platforms == ("pacbio",):
        options["pacbio"] = True
    sites = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000,
                                 options)
    assert len(sites) >= 40
    return sites


def _expand_np(batch):
    """Run the jax-side expansion eagerly and pull back to numpy."""
    d = compact_batch(batch)
    out = expand_compact({k: np.asarray(v) for k, v in d.items()})
    return {k: np.asarray(v) for k, v in out.items()}


def _assert_exact(batch):
    out = _expand_np(batch)
    np.testing.assert_array_equal(out["reads0"], batch.reads0)
    if batch.reads1 is not None:
        np.testing.assert_array_equal(out["reads1"], batch.reads1)
    np.testing.assert_array_equal(out["read_mask0"], batch.read_mask0)


def test_compact_roundtrip_illumina(tmp_path):
    sites = _sites(tmp_path / "ill")
    batch = pack_sites(sites, hybrid=False)
    assert batch.read_mask0.sum() > 0
    _assert_exact(batch)


def test_compact_roundtrip_hybrid(tmp_path):
    sites = _sites(tmp_path / "hyb", platforms=("illumina", "pacbio"))
    batch = pack_sites(sites, hybrid=True)
    _assert_exact(batch)


def test_compact_roundtrip_hp_channel(tmp_path):
    sites = _sites(tmp_path / "hp", platforms=("pacbio",), hp_tags=True,
                   include_hp=True)
    batch = pack_sites(sites, hybrid=False, channels0=7)
    assert batch.reads0.shape[-1] == 7
    # the dataset must actually exercise nonzero haplotags
    assert batch.reads0[..., 6].max() > 0
    _assert_exact(batch)


def test_padded_ref_segment_at_chromosome_edge():
    """A feature window clamped at position 0 must still produce an [L, 5]
    segment (zero rows for the out-of-range positions) — the reference drops
    such chunks outright; this framework clamps windows instead, so the
    segment path has to cope."""
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.pipeline.batching import padded_ref_segment

    bases = "ACGTACGTAC"  # pretend fetch(-140, 10) returned 10 bases
    seg = padded_ref_segment(bases, -140, 150)
    assert seg.shape == (150, 5)
    assert seg[:140].sum() == 0          # clipped positions are all-zero
    assert seg[140:].sum() == 10         # the real bases are one-hot
    # right-edge clamp: fetch(n-10, n+140) returned 10 bases
    seg = padded_ref_segment(bases, 0, 150)
    assert seg.shape == (150, 5)
    assert seg[:10].sum() == 10 and seg[10:].sum() == 0


def test_native_compact_matches_numpy(tmp_path, monkeypatch):
    from hello_tpu import native
    from hello_tpu.pipeline import compact as C

    sites = _sites(tmp_path / "nc", platforms=("illumina", "pacbio"))
    batch = pack_sites(sites, hybrid=True)
    assert native.available()
    fast = C.compact_batch(batch)
    # real featurizer output always packs into the 1-byte coded layout
    assert "codes0" in fast and "codes1" in fast
    monkeypatch.setattr(native, "compact_rows_coded", lambda *a: False)
    slow = C.compact_batch(batch)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)


def test_legacy_3byte_matches_native(tmp_path, monkeypatch):
    """The legacy 3-byte layout (palette-fallback path) still round-trips and
    its native/numpy packers agree."""
    from hello_tpu import native
    from hello_tpu.pipeline import compact as C

    sites = _sites(tmp_path / "leg")
    batch = pack_sites(sites, hybrid=False)
    monkeypatch.setattr(native, "compact_rows_coded", lambda *a: None)
    fast = C.compact_batch(batch)
    assert "packed0" in fast and "codes0" not in fast
    out = expand_compact({k: np.asarray(v) for k, v in fast.items()})
    np.testing.assert_array_equal(np.asarray(out["reads0"]), batch.reads0)
    monkeypatch.setattr(native, "compact_rows", lambda *a: False)
    slow = C.compact_batch(batch)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)


def test_out_of_palette_color_falls_back(tmp_path):
    """A tensor holding a color outside the base/quality palettes cannot be
    coded; the packer must detect it and ship the legacy layout, still
    byte-exactly."""
    from hello_tpu.pipeline import compact as C

    sites = _sites(tmp_path / "oop")
    batch = pack_sites(sites, hybrid=False)
    rows = np.argwhere(batch.read_mask0 > 0)
    a, r = rows[0]
    cell = batch.reads0[a, r, :, 4].argmax()      # a present cell
    batch.reads0[a, r, cell, 0] = 17              # not a base color
    d = C.compact_batch(batch)
    assert "packed0" in d and "codes0" not in d
    out = expand_compact({k: np.asarray(v) for k, v in d.items()})
    np.testing.assert_array_equal(np.asarray(out["reads0"]), batch.reads0)


def test_nonzero_color_at_absent_cell_falls_back(tmp_path):
    """Absent cells (strand channel 0) decode as all-zero under the coded
    layout; a tensor carrying a color at an absent cell must fall back to the
    legacy layout, which preserves it byte-exactly."""
    from hello_tpu.pipeline import compact as C

    sites = _sites(tmp_path / "abz")
    batch = pack_sites(sites, hybrid=False)
    rows = np.argwhere(batch.read_mask0 > 0)
    a, r = rows[0]
    cell = batch.reads0[a, r, :, 4].argmin()      # an absent cell
    assert batch.reads0[a, r, cell, 4] == 0
    batch.reads0[a, r, cell, 2] = 30              # junk quality color
    d = C.compact_batch(batch)
    assert "packed0" in d and "codes0" not in d
    out = expand_compact({k: np.asarray(v) for k, v in d.items()})
    np.testing.assert_array_equal(np.asarray(out["reads0"]), batch.reads0)


def test_absent_cell_mapq_scalar_parity(tmp_path, monkeypatch):
    """A nonzero mapq/hp channel at an ABSENT cell (ch0/ch2 zero, so the
    tensor is still codable) must not leak into the per-row scalars: all
    packers take scalars from present cells only, since reconstruction paints
    scalars * presence-mask.  Native and numpy coded packers must agree
    byte-for-byte on such tensors (regression: the native packer masked,
    the numpy packer didn't)."""
    from hello_tpu import native
    from hello_tpu.pipeline import compact as C

    sites = _sites(tmp_path / "ams")
    batch = pack_sites(sites, hybrid=False)
    rows = np.argwhere(batch.read_mask0 > 0)
    a, r = rows[0]
    cell = batch.reads0[a, r, :, 4].argmin()      # an absent cell
    assert batch.reads0[a, r, cell, 4] == 0
    batch.reads0[a, r, cell, 3] = 255             # junk mapq at absent cell
    assert native.available()
    fast = C.compact_batch(batch)
    assert "codes0" in fast                        # still codable
    monkeypatch.setattr(native, "compact_rows_coded", lambda *a: False)
    slow = C.compact_batch(batch)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)
    # the junk value is unrepresentable on the wire; everything else must
    # round-trip exactly
    expect = batch.reads0.copy()
    expect[a, r, cell, 3] = 0
    out = expand_compact({k: np.asarray(v) for k, v in fast.items()})
    np.testing.assert_array_equal(np.asarray(out["reads0"]), expect)


def test_scorer_logits_match_dense(tmp_path):
    from hello_tpu.pipeline.call import load_scorer

    sites = _sites(tmp_path / "sc")
    batch = pack_sites(sites, hybrid=False)
    dense = load_scorer("illumina", compact=False)
    compact = load_scorer("illumina", compact=True)
    # same weights: both initialise from the same fixed seed
    e_dense, _ = dense(batch)
    e_compact, _ = compact(batch)
    np.testing.assert_array_equal(e_compact, e_dense)


def test_multi_device_round_robin_scoring(tmp_path):
    """One process, N local devices: batches round-robin across every device
    (weights replicated on first use) and the call set is identical to the
    single-device run."""
    import jax

    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.pipeline.call import call_region, load_scorer

    devices = jax.devices()
    assert len(devices) >= 8   # virtual CPU mesh from conftest

    ds = sim.make_dataset(str(tmp_path / "md"), ref_length=30_000,
                          num_variants=60, coverage=30, read_length=120,
                          seed=13)
    ref = FastaFile(ds.fasta)

    single = load_scorer("illumina")
    assert len(single.devices) == 1      # CPU default: one device
    recs_single = call_region([ds.bams["illumina"]], ref, ds.chromosome,
                              0, 30_000, single,
                              max_alleles_per_batch=8)    # force many batches

    multi = load_scorer("illumina")
    multi.devices = list(devices)
    recs_multi = call_region([ds.bams["illumina"]], ref, ds.chromosome,
                             0, 30_000, multi, max_alleles_per_batch=8)

    assert len(multi._per_device) == len(devices), \
        "round robin did not reach every device"
    assert [str(r) for r in recs_multi] == [str(r) for r in recs_single]


def test_call_region_compact_vcf_identical(tmp_path):
    """Whole caller (BAM -> ... -> VCF records) with the compact wire format
    produces exactly the dense path's records."""
    from hello_tpu.io.fasta import FastaFile
    from hello_tpu.pipeline.call import call_region, load_scorer

    ds = sim.make_dataset(str(tmp_path / "cr"), ref_length=30_000,
                          num_variants=60, coverage=30, read_length=120,
                          seed=11)
    ref = FastaFile(ds.fasta)
    recs = {}
    for mode in (False, True):
        scorer = load_scorer("illumina", compact=mode)
        recs[mode] = call_region([ds.bams["illumina"]], ref, ds.chromosome,
                                 0, 30_000, scorer)
    assert [str(r) for r in recs[True]] == [str(r) for r in recs[False]]
    assert len(recs[True]) >= 40


def test_row_bucket_policy_bounded_shapes():
    """The default packed-row bucket must come from {cap/4, cap/2, cap}:
    every distinct row count is a fresh XLA compile of the whole forward
    (minutes through remote-TPU tunnels), so the row axis may add at most
    two shapes per (A, R) bucket pair."""
    from hello_tpu.pipeline.compact import _bucket

    for cap in (64, 2048, 32768, 65536):
        seen = {_bucket(n, cap) for n in range(1, cap + 1)}
        assert seen <= {cap // 4, cap // 2, cap}, (cap, seen)
        # never truncates
        for n in (1, cap // 4, cap // 4 + 1, cap // 2 + 1, cap):
            assert _bucket(n, cap) >= n
    # explicit ladders (training fixed_shape etc.) still honoured
    assert _bucket(5, 100, ladder=(0,)) == 100     # pin-at-cap sentinel
    assert _bucket(5, 100, ladder=(8, 16)) == 8
