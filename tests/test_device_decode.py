"""On-device genotype decode (nn/genotype.decode_pairs_device).

The jit-side decode must reproduce the host decode's winner pair and
probability (reference semantics: caller_calling.py:612-654,
MixtureOfExpertsAdvanced.py:520-589) so the calling hot loop can fetch
13 bytes/site instead of the full logit tensors.  Known, documented
deviation: EXACT float ties break by slot order on device vs allele-string
order on host — asserted here to only ever pick an equally-maximal pair.
"""

import numpy as np
import pytest

from hello_tpu import sim
from hello_tpu.io.fasta import FastaFile
from hello_tpu.pipeline.batching import SiteWork, pack_sites


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def _layout(rng, allele_counts, A_pad=None, S_pad=None, e_dim=3):
    """Build a pack_sites-shaped layout: contiguous real slots, padding slots
    pointing at the last site (as pack_sites does)."""
    sites, index = [], []
    for si, n in enumerate(allele_counts):
        alleles = [f"chr1_{si}_{chr(ord('A') + i)}" for i in range(n)]
        sites.append(SiteWork("chr1", 100 + 10 * si, 101 + 10 * si, alleles,
                              [np.zeros((1, 150, 6), np.uint8)] * n))
        for ai in range(n):
            index.append((si, ai))
    n_real = len(index)
    S = S_pad or len(sites)
    A = A_pad or n_real
    site_ids = np.full(A, S - 1, np.int32)
    allele_mask = np.zeros(A, np.float32)
    for slot, (si, ai) in enumerate(index):
        site_ids[slot] = si
        allele_mask[slot] = 1.0
    experts = (rng.randn(A, e_dim) * 3).astype(np.float32)
    meta = None
    if e_dim != 1:
        meta = rng.rand(S, 3).astype(np.float32)
        meta /= meta.sum(axis=1, keepdims=True)
    return sites, index, site_ids, allele_mask, experts, meta, S


def _run_device(experts, meta, site_ids, allele_mask, S):
    import jax

    from hello_tpu.nn.genotype import decode_pairs_device

    fn = jax.jit(decode_pairs_device, static_argnums=(4,))
    out = fn(experts, meta, site_ids, allele_mask, S)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("e_dim", [1, 3])
def test_device_decode_matches_host(rng, e_dim):
    from hello_tpu.nn.genotype import calls_from_device_decode, decode_batch

    counts = (1, 2, 3, 5, 8, 2, 2, 1)
    sites, index, site_ids, allele_mask, experts, meta, S = _layout(
        rng, counts, A_pad=32, S_pad=16, e_dim=e_dim)
    dec = _run_device(experts, meta, site_ids, allele_mask, S)
    calls = calls_from_device_decode(dec, index, sites)
    host = decode_batch(experts[: len(index)], meta, index, sites, full=False)
    assert len(calls) == len(host) == len(sites)
    for c, h in zip(calls, host):
        assert c is not None and h is not None
        assert c["best_pair"] == h["best_pair"]
        np.testing.assert_allclose(c["probability"], h["probability"],
                                   rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(c["quality"], h["quality"],
                                   rtol=1e-4, atol=1e-4)


def test_device_decode_empty_padded_sites(rng):
    """Padded site slots (no real alleles) must come back invalid, and
    calls_from_device_decode must skip them as None."""
    from hello_tpu.nn.genotype import calls_from_device_decode

    sites, index, site_ids, allele_mask, experts, meta, S = _layout(
        rng, (2, 3), A_pad=16, S_pad=8, e_dim=3)
    dec = _run_device(experts, meta, site_ids, allele_mask, S)
    assert list(dec["valid"][:2]) == [True, True]
    assert not dec["valid"][2:].any()
    calls = calls_from_device_decode(dec, index, sites + [None] * 6)
    assert calls[0] is not None and calls[1] is not None
    assert all(c is None for c in calls[2:])


def test_device_decode_tie_picks_a_maximal_pair(rng):
    """Saturated logits produce exact probability ties; the device tie-break
    (smallest slot pair) may differ from the host one (allele-string order),
    but the picked pair must still attain the maximal probability."""
    from hello_tpu.nn.genotype import calls_from_device_decode, decode_site

    sites, index, site_ids, allele_mask, experts, meta, S = _layout(
        rng, (4, 3), A_pad=8, S_pad=4, e_dim=3)
    experts[:] = 40.0          # sigmoid == 1.0 exactly in f32
    dec = _run_device(experts, meta, site_ids, allele_mask, S)
    calls = calls_from_device_decode(dec, index, sites)
    for si, call in enumerate(calls):
        rows = [slot for slot, (s, _) in enumerate(index) if s == si]
        pair_probs, _, _ = decode_site(experts[rows], meta[si],
                                       sites[si].alleles)
        best_p = max(pair_probs.values())
        assert call["best_pair"] in pair_probs
        np.testing.assert_allclose(pair_probs[call["best_pair"]], best_p,
                                   rtol=1e-6)


def test_call_region_device_decode_vcf_identical(tmp_path):
    """End-to-end: calling with on-device decode must produce the same sites,
    alleles and genotypes as host decode, with qualities within float noise
    (XLA vs numpy transcendentals)."""
    from hello_tpu.pipeline.call import Scorer, call_region, load_scorer

    ds = sim.make_dataset(str(tmp_path), ref_length=60_000, num_variants=120,
                          coverage=30, read_length=120, seed=3)
    ref = FastaFile(ds.fasta)
    base = load_scorer("illumina")
    on = Scorer(base.model, base.params, base.state, device_decode=True)
    off = Scorer(base.model, base.params, base.state, device_decode=False)
    assert on.device_decode and not off.device_decode
    rec_on = call_region([ds.bams["illumina"]], ref, ds.chromosome, 0,
                         60_000, on)
    rec_off = call_region([ds.bams["illumina"]], ref, ds.chromosome, 0,
                          60_000, off)
    assert len(rec_on) == len(rec_off) > 50
    for a, b in zip(rec_on, rec_off):
        assert (a.chromosome, a.position, a.ref, a.alt, a.gt) == \
               (b.chromosome, b.position, b.ref, b.alt, b.gt)
        np.testing.assert_allclose(a.qual, b.qual, rtol=1e-3, atol=1e-3)
