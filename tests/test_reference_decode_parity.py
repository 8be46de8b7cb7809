"""Decode-chain VCF parity against the REFERENCE'S OWN code.

Expert-logit parity (test_export/test_moe_parity) left one link untested: the
genotype-decode + record-assembly chain — pair probabilities
(reference python/MixtureOfExpertsAdvanced.py:520-589), likelihood-dict ->
genotype call (prepareVcf.callAlleles:36-105) and normalised record creation
(vcfFromContigs.createVcfRecord:162-227) — was re-implemented here
(nn/genotype.py, pipeline/call.py, io/vcf.py) and only tested against itself.
These tests drive the reference's own functions (imported with stubbed
pysam/Bio, as test_strict_clip does) next to ours:

  * from IDENTICAL likelihood dictionaries, reference callAlleles and our
    record_from_pair_probs must emit BYTE-IDENTICAL VCF lines (modulo the
    reference's process-hash-dependent multi-ALT set order, canonicalised
    before comparison and additionally byte-compared when the orders agree);
  * from IDENTICAL converted weights and IDENTICAL sites, the reference
    MoEMergedWrapperAdvanced.forward chain and our scorer+decode chain must
    agree on every pair probability, the called genotype, and the record
    fields, with qualities within float-parity noise.
"""

import math
import sys
import types

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

import jax

from hello_tpu.io.vcf import format_record
from hello_tpu.nn import archs
from hello_tpu.nn.convert import convert_state_dict
from hello_tpu.nn.genotype import decode_batch, decode_site
from hello_tpu.nn.moe import MoEAttention
from hello_tpu.pipeline.batching import SiteWork, pack_sites
from hello_tpu.pipeline.call import record_from_pair_probs


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load_reference_decode():
    """Import prepareVcf + the MoE wrapper with pysam/Bio stubbed out."""
    _stub("pysam")
    bio = _stub("Bio")
    pw = _stub("Bio.pairwise2", align=None)
    seqio = _stub("Bio.SeqIO")
    bio.pairwise2, bio.SeqIO = pw, seqio
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import MixtureOfExpertsAdvanced as MoERef
        import prepareVcf
        return prepareVcf, MoERef
    finally:
        sys.path.pop(0)


class _RefAdapter:
    """The ReferenceCache surface callAlleles/createVcfRecord touch:
    ``ref[i]`` -> base, ``ref[a:b]`` -> bases, settable ``.chrom``."""

    def __init__(self, seq, chrom):
        self.seq = seq
        self.chrom = chrom

    def __getitem__(self, key):
        if isinstance(key, slice):
            return list(self.seq[key])
        return self.seq[key]


def _canon(line):
    """Parse a VCF line into order-canonical fields: ALTs sorted, GT indices
    remapped accordingly (the reference's ALT order comes from python set
    iteration, which is hash-seed dependent)."""
    if line is None:
        return None
    f = line.split("\t")
    chrom, pos, _id, ref, alt, qual, filt, info, _fmt, gt = f
    alts = alt.split(",")
    order = sorted(range(len(alts)), key=lambda i: alts[i])
    remap = {old + 1: new + 1 for new, old in enumerate(order)}
    gts = tuple(remap.get(int(g), 0) for g in gt.split("/"))
    return (chrom, int(pos), ref, tuple(sorted(alts)), gts, qual, filt, info)


def _random_pair_dict(rng, alleles):
    """A likelihood dict over unordered allele pairs via our decode_site
    (the values themselves are arbitrary floats for test A)."""
    logits = (rng.randn(len(alleles), 3) * 4).astype(np.float32)
    meta = rng.rand(3).astype(np.float32)
    meta /= meta.sum()
    combined, _per_expert, _ = decode_site(logits, meta, alleles)
    return combined


@requires_reference
def test_call_alleles_byte_parity(rng):
    """Identical likelihood dicts -> byte-identical records through the
    reference's callAlleles/createVcfRecord and our
    record_from_pair_probs/make_record/format_record."""
    prepareVcf, _ = _load_reference_decode()

    seq = "".join(rng.choice(list("ACGT")) for _ in range(400))
    chrom = "chrP"
    ref_lookup = lambda c, p: seq[p] if 0 <= p < len(seq) else ""
    adapter = _RefAdapter(seq, chrom)

    n_sites = 0
    byte_equal = 0
    for trial in range(60):
        start = int(rng.randint(10, 380))
        length = int(rng.randint(1, 4))
        ref_allele = seq[start:start + length]
        # allele set: ref itself (sometimes), SNV-like, insertion, deletion
        pool = [ref_allele,
                ref_allele[:-1] + "TG"[trial % 2],
                ref_allele + "A",
                ref_allele[:-1],
                "C" + ref_allele[1:]]
        k = int(rng.randint(2, 5))
        alleles = []
        for a in pool[:k]:
            if a and a not in alleles:
                alleles.append(a)
        if len(alleles) < 2:
            continue
        pair_probs = _random_pair_dict(rng, alleles)

        ref_line = prepareVcf.callAlleles(dict(pair_probs), chrom, start,
                                          length, adapter)

        site = SiteWork(chrom, start, start + length, alleles, [])
        rec = record_from_pair_probs(site, pair_probs, ref_lookup,
                                     info="HELLO")
        our_line = None if rec is None else format_record(rec)

        assert (ref_line is None) == (our_line is None), \
            f"emission mismatch at trial {trial}: {ref_line} vs {our_line}"
        if ref_line is None:
            continue
        n_sites += 1
        assert _canon(ref_line) == _canon(our_line), \
            f"trial {trial}: {ref_line!r} vs {our_line!r}"
        if ref_line == our_line:
            byte_equal += 1
        else:
            # only the multi-ALT set order may differ
            assert len(ref_line.split("\t")[4].split(",")) > 1, \
                f"single-ALT lines must be byte-identical: " \
                f"{ref_line!r} vs {our_line!r}"
    assert n_sites >= 40
    # most records are single-ALT and must match byte-for-byte
    assert byte_equal >= n_sites * 0.5


def _reference_model(config_name):
    sys.path.insert(0, REFERENCE_DIR + "/python")
    try:
        import importlib
        for mod in list(sys.modules):
            if mod == config_name or mod.split(".")[0] == "architectures":
                del sys.modules[mod]
        import MixtureOfExpertsAdvanced as MoERef
        cfg = importlib.import_module(config_name)
        model = MoERef.create_moe_attention_model(cfg.configDict)
        model.eval()
        return model, MoERef
    finally:
        sys.path.pop(0)


@requires_reference
@pytest.mark.parametrize("config_name,ours,hybrid", [
    ("moe_attention_config_single_tech_old_equivalent_weight_norm",
     "single", False),
    ("moe_attention_config_full_hybrid_old_equivalent_weight_norm",
     "hybrid", True),
])
def test_wrapper_chain_parity(rng, config_name, ours, hybrid):
    """Same converted weights + same sites: the reference wrapper-forward ->
    callAlleles chain and our scorer -> decode -> record chain must agree on
    every pair probability, the genotype, and the record fields."""
    import torch

    prepareVcf, MoERef = _load_reference_decode()
    tmodel, MoERef = _reference_model(config_name)
    wrapper = MoERef.MoEMergedWrapperAdvanced(tmodel, providePredictions=True)
    wrapper.eval()

    config = (archs.config_single_tech() if ours == "single"
              else archs.config_hybrid_full())
    model = MoEAttention(config)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, state = convert_state_dict(sd, model)

    from hello_tpu.nn import layers
    layers.set_precision("highest")
    try:
        seq = "".join(rng.choice(list("ACGT")) for _ in range(400))
        chrom = "chrW"
        ref_lookup = lambda c, p: seq[p] if 0 <= p < len(seq) else ""
        adapter = _RefAdapter(seq, chrom)

        for trial in range(6):
            start = int(rng.randint(50, 300))
            length = int(rng.randint(1, 3))
            ref_allele = seq[start:start + length]
            alleles = [ref_allele, ref_allele[:-1] + "T", ref_allele + "AC"]
            alleles = list(dict.fromkeys(a for a in alleles if a))
            t0 = [rng.randint(0, 255, size=(rng.randint(2, 6), 150, 6))
                  .astype(np.uint8) for _ in alleles]
            t1 = [rng.randint(0, 255, size=(rng.randint(2, 5), 150, 6))
                  .astype(np.uint8) for _ in alleles] if hybrid else None
            seg = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=150)]

            # reference chain
            feature_dict = {}
            for i, a in enumerate(alleles):
                v0 = torch.from_numpy(t0[i].astype(np.float32))
                v1 = (torch.from_numpy(t1[i].astype(np.float32))
                      if hybrid else None)
                feature_dict[a] = (v0, v1)
            with torch.no_grad():
                combined_ref, e0, e1, e2, meta_ref = wrapper(
                    feature_dict, torch.from_numpy(seg[None]))
            ref_line = prepareVcf.callAlleles(
                {k: float(v) for k, v in combined_ref.items()},
                chrom, start, length, adapter)

            # our chain
            site = SiteWork(chrom, start, start + length, alleles, t0,
                            t1, seg)
            batch = pack_sites([site], hybrid=hybrid)
            out, _ = model.apply(params, state, dict(batch.device_dict()))
            calls = decode_batch(np.asarray(out["experts"]),
                                 None if out["meta"] is None
                                 else np.asarray(out["meta"]),
                                 batch.allele_site_index, [site], full=True)
            call = calls[0]
            rec = record_from_pair_probs(site, call["pair_probs"], ref_lookup,
                                         info="HELLO")
            our_line = None if rec is None else format_record(rec)

            # pair probabilities agree pairwise
            assert set(combined_ref) == set(call["pair_probs"])
            for pair, v in combined_ref.items():
                np.testing.assert_allclose(
                    float(call["pair_probs"][pair]), float(v),
                    rtol=5e-3, atol=1e-6, err_msg=f"pair {pair}")
            if hybrid:
                np.testing.assert_allclose(np.asarray(call["meta"]),
                                           meta_ref.numpy(), rtol=1e-4,
                                           atol=1e-6)

            assert (ref_line is None) == (our_line is None)
            if ref_line is None:
                continue
            a, b = _canon(ref_line), _canon(our_line)
            # same site, same alleles, same genotype; quality within float
            # parity noise of the two frameworks' conv stacks
            assert a[:5] == b[:5], f"{ref_line!r} vs {our_line!r}"
            assert abs(float(a[5]) - float(b[5])) < 0.05
            assert a[6:] == b[6:]
    finally:
        layers.set_precision("default")
