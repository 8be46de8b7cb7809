"""End-to-end coded wire path (CodedSiteWork -> pack_sites_wire).

Workers re-encode featurizer output into 1-byte coded rows before IPC; the
main process packs wire dicts with no dense intermediate.  These tests pin
the invariant that the on-device expansion of a wire-packed batch is
byte-identical to the dense PaddedBatch the classic path would have built —
so Scorer logits and VCF output cannot differ between the two paths.
"""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.pipeline.batching import CodedSiteWork, pack_sites
from hello_tpu.pipeline.compact import (encode_chunk_sites, expand_compact,
                                        pack_sites_wire)
from hello_tpu.pipeline.parallel_call import host_sites_for_chunk


def _sites(tmp_path, platforms=("illumina",), hp_tags=False, **opts):
    ds = sim.make_dataset(str(tmp_path), ref_length=30_000, num_variants=60,
                          coverage=30, read_length=120, seed=9,
                          platforms=platforms, hp_tags=hp_tags)
    bams = [ds.bams[p] for p in platforms]
    options = dict(opts)
    if platforms == ("pacbio",):
        options["pacbio"] = True
    sites = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000,
                                 options)
    assert len(sites) >= 40
    return ds, sites


def _expand_np(wire):
    out = expand_compact({k: np.asarray(v) for k, v in wire.items()})
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("platforms,hp", [
    (("illumina",), False),
    (("illumina", "pacbio"), False),
    (("pacbio",), True),
])
def test_wire_pack_expands_byte_exact(tmp_path, platforms, hp):
    """expand(pack_sites_wire(encode(sites))) == the dense PaddedBatch."""
    _, sites = _sites(tmp_path / "w", platforms=platforms, hp_tags=hp,
                      include_hp=hp)
    hybrid = len(platforms) > 1
    dense = pack_sites(sites, hybrid=hybrid,
                       channels0=7 if hp else 6, channels1=7 if hp else 6)
    coded = encode_chunk_sites(sites)
    assert coded is not None and all(isinstance(c, CodedSiteWork)
                                     for c in coded)
    wb = pack_sites_wire(coded, hybrid=hybrid)
    assert wb.allele_site_index == dense.allele_site_index
    out = _expand_np(wb.wire)
    np.testing.assert_array_equal(out["reads0"], dense.reads0)
    np.testing.assert_array_equal(out["read_mask0"], dense.read_mask0)
    np.testing.assert_array_equal(out["ref_segments"], dense.ref_segments)
    np.testing.assert_array_equal(np.asarray(wb.wire["site_ids"]),
                                  dense.site_ids)
    np.testing.assert_array_equal(np.asarray(wb.wire["allele_mask"]),
                                  dense.allele_mask)
    if hybrid:
        np.testing.assert_array_equal(out["reads1"], dense.reads1)
        np.testing.assert_array_equal(out["read_mask1"], dense.read_mask1)


@pytest.mark.parametrize("platforms,hp", [
    (("illumina",), False),
    (("illumina", "pacbio"), False),
    (("pacbio",), True),
])
def test_native_coded_chunk_matches_encoded_dense(tmp_path, platforms, hp):
    """The native orchestrator's code-on-copy emission (htpu_chunk_sites_coded
    -> CodedSiteWork, no dense tensors ever materialised) must be
    byte-identical to encoding the dense native output after the fact."""
    from hello_tpu import native

    assert native.available()
    ds, dense = _sites(tmp_path / "nc", platforms=platforms, hp_tags=hp,
                       include_hp=hp)
    bams = [ds.bams[p] for p in platforms]
    opts = {"wire": "coded", "include_hp": hp}
    if platforms == ("pacbio",):
        opts["pacbio"] = True
    direct = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000,
                                  opts)
    assert all(isinstance(s, CodedSiteWork) for s in direct)
    ref = encode_chunk_sites(dense)
    assert len(direct) == len(ref)
    for a, b in zip(direct, ref):
        assert (a.chromosome, a.start, a.stop, a.alleles, a.labels,
                a.site_label) == \
               (b.chromosome, b.start, b.stop, b.alleles, b.labels,
                b.site_label)
        np.testing.assert_array_equal(a.ref_codes, b.ref_codes)
        for ca, cb in zip(a.codes0, b.codes0):
            np.testing.assert_array_equal(ca, cb)
        for sa, sb in zip(a.scal0, b.scal0):
            np.testing.assert_array_equal(sa, sb)
        if a.codes1 is not None:
            for ca, cb in zip(a.codes1, b.codes1):
                np.testing.assert_array_equal(ca, cb)
            for sa, sb in zip(a.scal1, b.scal1):
                np.testing.assert_array_equal(sa, sb)


def test_chunk_block_expands_to_identical_sites(tmp_path):
    """The consolidated IPC payload (CodedChunkBlock, what workers actually
    ship) must expand to exactly the CodedSiteWork list the per-site path
    produces."""
    from hello_tpu import native
    from hello_tpu.pipeline.candidates import CodedChunkBlock

    assert native.available()
    ds, _ = _sites(tmp_path / "blk", platforms=("illumina", "pacbio"))
    bams = [ds.bams[p] for p in ("illumina", "pacbio")]
    block = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000,
                                 {"wire": "coded", "chunk_block": True})
    assert isinstance(block, CodedChunkBlock)
    persite = host_sites_for_chunk(bams, ds.fasta, ds.chromosome, 0, 30_000,
                                   {"wire": "coded"})
    expanded = block.to_sites()
    assert len(block) == len(expanded) == len(persite) >= 40
    for a, b in zip(expanded, persite):
        assert (a.chromosome, a.start, a.stop, a.alleles, a.labels,
                a.site_label) == \
               (b.chromosome, b.start, b.stop, b.alleles, b.labels,
                b.site_label)
        np.testing.assert_array_equal(a.ref_codes, b.ref_codes)
        for ca, cb in zip(a.codes0, b.codes0):
            np.testing.assert_array_equal(ca, cb)
        for sa, sb in zip(a.scal0, b.scal0):
            np.testing.assert_array_equal(sa, sb)
        for ca, cb in zip(a.codes1, b.codes1):
            np.testing.assert_array_equal(ca, cb)
        for sa, sb in zip(a.scal1, b.scal1):
            np.testing.assert_array_equal(sa, sb)
    # the block must survive IPC (pickle) as a handful of buffers
    import pickle
    back = pickle.loads(pickle.dumps(block, pickle.HIGHEST_PROTOCOL))
    got = back.to_sites()
    assert len(got) == len(persite)
    np.testing.assert_array_equal(got[0].codes0[0], persite[0].codes0[0])


def test_wire_scorer_logits_identical(tmp_path):
    """A Scorer fed the WireBatch must produce bit-identical logits to the
    dense PaddedBatch."""
    from hello_tpu.pipeline.call import load_scorer

    _, sites = _sites(tmp_path / "sc")
    dense = pack_sites(sites, hybrid=False)
    wb = pack_sites_wire(encode_chunk_sites(sites), hybrid=False)
    scorer = load_scorer("illumina", compact=False)
    e_dense, _ = scorer(dense)
    e_wire, _ = scorer(wb)
    np.testing.assert_array_equal(np.asarray(e_wire), np.asarray(e_dense))


def test_call_parallel_coded_matches_dense(tmp_path):
    """call_parallel with the coded wire (production default) must write the
    same records as a dense-forced run."""
    from hello_tpu.pipeline.call import load_scorer
    from hello_tpu.pipeline.parallel_call import call_parallel
    from hello_tpu.io.vcf import read_vcf

    ds = sim.make_dataset(str(tmp_path), ref_length=60_000, num_variants=120,
                          coverage=30, read_length=120, seed=21)
    scorer = load_scorer("illumina")
    out_c = str(tmp_path / "coded.vcf")
    out_d = str(tmp_path / "dense.vcf")
    call_parallel([ds.bams["illumina"]], ds.fasta, scorer, out_c,
                  num_workers=2, chunk_size=20_000)
    call_parallel([ds.bams["illumina"]], ds.fasta, scorer, out_d,
                  num_workers=2, chunk_size=20_000, wire="dense")
    rc, rd = read_vcf(out_c), read_vcf(out_d)
    assert len(rc) == len(rd) > 50
    for a, b in zip(rc, rd):
        assert (a.chromosome, a.position, a.ref, a.alt, a.gt) == \
               (b.chromosome, b.position, b.ref, b.alt, b.gt)
        np.testing.assert_allclose(a.qual, b.qual, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("platforms,hp,model_name", [
    (("illumina",), False, "illumina"),
    (("illumina", "pacbio"), False, "hybrid"),
    (("pacbio",), True, "pacbio_hp"),
])
def test_packed_rows_decode_matches_dense_rows(tmp_path, platforms, hp,
                                               model_name):
    """expand_compact_packed decodes each shipped row to exactly the bytes
    the dense expansion scatters into the corresponding (allele, read) slot
    — the packed-conv path consumes the identical row set."""
    from hello_tpu.pipeline.compact import expand_compact_packed

    _, sites = _sites(tmp_path / "p", platforms=platforms, hp_tags=hp,
                      include_hp=hp)
    hybrid = len(platforms) > 1
    dense = pack_sites(sites, hybrid=hybrid,
                       channels0=7 if hp else 6, channels1=7 if hp else 6)
    wb = pack_sites_wire(encode_chunk_sites(sites), hybrid=hybrid)
    packed = {k: np.asarray(v)
              for k, v in expand_compact_packed(
                  {k: np.asarray(v) for k, v in wb.wire.items()}).items()}

    for k, reads, mask in (("0", dense.reads0, dense.read_mask0),
                           ("1", dense.reads1, dense.read_mask1)):
        if reads is None:
            continue
        A, R, L, C = reads.shape
        slots = np.asarray(wb.wire[f"row_slots{k}"])
        rows = packed[f"rows{k}"]
        valid = packed[f"row_valid{k}"] > 0
        allele = packed[f"row_allele{k}"]
        n = int(valid.sum())
        assert n == int(mask.sum())
        flat = reads.reshape(A * R, L, C)
        np.testing.assert_array_equal(rows[:n].astype(np.uint8),
                                      flat[slots[:n]])
        np.testing.assert_array_equal(allele[:n], slots[:n] // R)
        # padding rows decode to all-zero and map to the dummy segment
        assert (allele[n:] == A).all()
        assert not rows[n:].any()


@pytest.mark.parametrize("platforms,hp,model_name", [
    (("illumina",), False, "illumina"),
    (("illumina", "pacbio"), False, "hybrid"),
    (("pacbio",), True, "pacbio_hp"),
])
def test_packed_conv_scorer_matches_dense(tmp_path, platforms, hp, model_name,
                                          monkeypatch):
    """A Scorer with packed-row convolution forced on must reproduce the
    dense path's logits (same row set, same math; only the f32 reduction
    order differs — segment-sum vs masked einsum)."""
    from hello_tpu.pipeline.call import load_scorer

    monkeypatch.setenv("HELLO_TPU_PACKED_CONV", "0")
    _, sites = _sites(tmp_path / "pc", platforms=platforms, hp_tags=hp,
                      include_hp=hp)
    hybrid = len(platforms) > 1
    dense = pack_sites(sites, hybrid=hybrid,
                       channels0=7 if hp else 6, channels1=7 if hp else 6)
    wb = pack_sites_wire(encode_chunk_sites(sites), hybrid=hybrid)
    ref_scorer = load_scorer(model_name, compact=False)
    e_dense, m_dense = ref_scorer(dense)

    monkeypatch.setenv("HELLO_TPU_PACKED_CONV", "1")
    packed_scorer = load_scorer(model_name, compact=False)
    packed_scorer.params = ref_scorer.params
    packed_scorer.state = ref_scorer.state
    assert packed_scorer.packed_conv
    e_packed, m_packed = packed_scorer(wb)
    np.testing.assert_allclose(np.asarray(e_packed), np.asarray(e_dense),
                               rtol=2e-5, atol=2e-5)
    if m_dense is not None:
        np.testing.assert_allclose(np.asarray(m_packed), np.asarray(m_dense),
                                   rtol=2e-5, atol=2e-5)
