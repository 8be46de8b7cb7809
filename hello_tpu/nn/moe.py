"""Mixture-of-Experts variant-scoring model, TPU-first formulation.

The reference model (reference python/MixtureOfExpertsAdvanced.py:71-252,
``MoEAttention``) consumes *ragged* batches: a flat stack of read tensors with
Python lists ``numReadsPerAllele`` / ``numAllelesPerSite`` driving
cumsum-gather segment sums (``reduceSlots``) and ``repeat_interleave``
expansion.  Ragged shapes defeat XLA, so here the same computation is
re-expressed over **fixed-shape padded batches**:

  * ``reads``:    ``[A, R, L, C]`` float — A padded allele slots, R padded reads
                  per allele, L=150 positions, C=6/7 channels.
  * ``read_mask``: ``[A, R]`` — 1.0 for real reads.
  * ``site_ids``: ``[A]`` int32 — the site each allele slot belongs to.
  * ``allele_mask``: ``[A]`` — 1.0 for real allele slots.
  * ``ref_segments``: ``[S, L, 5]`` one-hot reference windows per site.

Segment sums over reads/alleles become masked one-hot matmuls, which map onto
the MXU; every shape is static so the whole forward compiles once per bucket.
In exact arithmetic the padded forward equals the reference ragged forward for
the shipping (weight-normalised, batch-norm-free) architectures, in both train
and eval modes — padded rows are excluded by the masks before every reduction.

Model variants (selected by which networks are present in the config dict,
mirroring create_moe_attention_model reference:657-703):

  * single-tech:        read_conv0 + compressor0 + xattn0 → 1 logit/allele
  * hybrid no-ensemble: both platforms + combiners + xattn2 → 1 logit/allele
  * hybrid full:        3 experts + meta-expert softmax over experts
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import archs
from .layers import build_network

# read buckets must be a multiple of this for the fused Pallas read-convolver
# (the full Mosaic lane width; patched smaller only by interpret-mode tests)
PALLAS_LANE_MULTIPLE = 128


def packed_read_reduce(frames, row_allele, row_valid, num_alleles):
    """Per-allele sum of PACKED read-row frames (the packed-row twin of
    :func:`masked_read_sum`).

    frames: [nb, L, C] conv output per shipped row; row_allele: [nb] allele
    slot per row (``num_alleles`` = dummy for padding rows); row_valid: [nb].
    Returns [A, L, C] float32.

    Padding rows' conv outputs are nonzero (biases propagate through the
    stack), so they are zeroed via ``row_valid`` before the segment sum —
    the exact set of rows the dense path's read_mask admits."""
    frames = frames.astype(jnp.float32) * row_valid[:, None, None]
    reduced = jax.ops.segment_sum(frames, row_allele,
                                  num_segments=num_alleles + 1)
    return reduced[:num_alleles]


def masked_read_sum(read_frames, read_mask):
    """Sum read-level frames per allele slot with masking.

    read_frames: [A, R, L, C]; read_mask: [A, R] -> [A, L, C]

    Equivalent to the reference's reduceSlots over reads
    (MixtureOfExpertsAdvanced.py:23-34) with direct (non-cumsum) summation.
    The mask is cast to the frames' dtype so bf16-activation mode contracts
    bf16 x bf16 (f32 accumulation) instead of promoting the whole frame
    tensor back to f32 in HBM.
    """
    return jnp.einsum("ar,arlc->alc", read_mask.astype(read_frames.dtype),
                      read_frames, preferred_element_type=jnp.float32)


def site_segment_sum(allele_feats, site_onehot):
    """Sum allele-level features per site: [A, L, C] x [A, S] -> [S, L, C]."""
    return jnp.einsum("as,alc->slc", site_onehot, allele_feats,
                      preferred_element_type=jnp.float32)


def make_site_onehot(site_ids, allele_mask, num_sites):
    """[A] int32, [A] float -> [A, S] float one-hot with padded slots zeroed."""
    onehot = (site_ids[:, None] == jnp.arange(num_sites)[None, :]).astype(jnp.float32)
    return onehot * allele_mask[:, None]


class MoEAttention:
    """Functional MoE model over padded batches."""

    NETWORK_NAMES = (
        "read_conv0", "read_conv1",
        "compressor0", "compressor1", "compressor2",
        "xattn0", "xattn1", "xattn2",
        "combiner0", "combiner1", "meta",
    )

    def __init__(self, config: Dict[str, list]):
        self.config = config
        self.nets = {}
        for name in self.NETWORK_NAMES:
            cfg = config.get(name)
            self.nets[name] = build_network(cfg) if cfg is not None else None
        assert self.nets["read_conv0"] is not None, "read_conv0 is required"
        self.hybrid = self.nets["read_conv1"] is not None
        self.in_channels0 = self._first_conv_channels("read_conv0")
        self.in_channels1 = self._first_conv_channels("read_conv1") if self.hybrid else None
        # which experts produce predictions
        self.has_xattn0 = self.nets["xattn0"] is not None
        self.has_xattn1 = self.nets["xattn1"] is not None
        self.has_xattn2 = self.nets["xattn2"] is not None
        self.has_meta = self.nets["meta"] is not None
        self.has_compressor2 = self.nets["compressor2"] is not None

    def _first_conv_channels(self, name):
        for spec in self.config[name]:
            if spec["type"] in ("Conv1d", "WeightNormedConv1d"):
                return spec["kwargs"]["in_channels"]
        raise ValueError(f"no conv layer in {name}")

    def _last_conv_channels(self, name):
        def walk(specs):
            out = None
            for spec in specs:
                t = spec["type"]
                if t in ("Conv1d", "WeightNormedConv1d"):
                    out = spec["kwargs"]["out_channels"]
                elif t == "ResidualBlock":
                    got = walk(spec["kwargs"]["feedforward"])
                    if got is not None:
                        out = got
            return out

        out = walk(self.config[name])
        if out is None:
            raise ValueError(f"no conv layer in {name}")
        return out

    # -- init ---------------------------------------------------------------

    def init(self, key, feature_length=150):
        params, state = {}, {}
        keys = jax.random.split(key, len(self.NETWORK_NAMES))
        shapes = self._network_in_shapes(feature_length)
        for k, name in zip(keys, self.NETWORK_NAMES):
            net = self.nets[name]
            if net is None:
                continue
            p, s, _ = net.init(k, shapes[name])
            params[name] = p
            if s:
                state[name] = s
        return params, state

    def _network_in_shapes(self, L):
        """Abstract input shapes used for parameter initialisation (channel
        widths derived from the config so wide variants initialise correctly)."""
        conv_l = 36  # read convolver output length for L=150
        comp_l = 18
        rc_out = self._last_conv_channels("read_conv0")      # 64 * width
        comp_out = self.config.get("compressor0") is not None and \
            self._last_conv_channels("compressor0") or 2 * rc_out  # 128 * width
        shapes = {
            "read_conv0": (L, self.in_channels0),
            "read_conv1": (L, self.in_channels1) if self.hybrid else None,
            "compressor0": (conv_l, rc_out),
            "compressor1": (conv_l, rc_out),
            "compressor2": (conv_l, rc_out),
            "xattn0": ((comp_l, comp_out), ((comp_l, comp_out), (comp_l, comp_out))),
            "xattn1": ((comp_l, comp_out), ((comp_l, comp_out), (comp_l, comp_out))),
            "xattn2": ((comp_l, comp_out), ((comp_l, comp_out), (comp_l, comp_out))),
            "combiner0": ((comp_l, comp_out), (comp_l, comp_out)),
            "combiner1": ((comp_l, comp_out), (comp_l, comp_out)),
            "meta": ((comp_l, comp_out), (L, 5)),
        }
        return shapes

    # -- forward ------------------------------------------------------------

    def _apply_net(self, name, params, state, x, train, rng, bn_mask=None):
        net = self.nets[name]
        p = params.get(name, {})
        s = state.get(name, {})
        lrng = None
        if rng is not None:
            # stable per-network fold (hash() is randomised per process via
            # PYTHONHASHSEED, which would make dropout streams irreproducible)
            lrng = jax.random.fold_in(rng, self.NETWORK_NAMES.index(name))
        from . import layers as L
        # padded rows must not contaminate train-mode batch-norm statistics:
        # each call site passes the mask for ITS row axis (reads, alleles, or
        # sites); trace-time global, reset afterwards
        L.set_bn_batch_mask(bn_mask if train else None)
        try:
            y, ns = net.apply(p, s, x, train=train, rng=lrng)
        finally:
            L.set_bn_batch_mask(None)
        return y, ns

    def _compress_and_predict(self, idx, reduced_allele, site_onehot, site_ids,
                              params, state, new_state, train, rng,
                              allele_mask=None, site_mask=None):
        """Mirror of MoEAttention.compress_and_predict (reference :117-159).

        reduced_allele: [A, 36, 64] summed read frames per allele.
        Returns (expert_logits [A,1] or None, (site0 [S,18,128], site1 [S,18,128]),
        compressed_allele [A,18,128]).
        """
        cname = f"compressor{idx}"
        ca, ns = self._apply_net(cname, params, state, reduced_allele, train,
                                 rng, bn_mask=allele_mask)
        state_after = state
        if ns:
            # thread the allele pass's batch-norm update into the site pass so
            # running stats update sequentially, as the reference's in-place
            # torch BN does (MixtureOfExpertsAdvanced.py:117-147)
            state_after = dict(state)
            state_after[cname] = ns
            new_state[cname] = ns

        # site features route 1: compress the per-site sum of read frames
        site_frames = site_segment_sum(reduced_allele, site_onehot)
        cs0, ns = self._apply_net(cname, params, state_after, site_frames,
                                  train, rng, bn_mask=site_mask)
        if ns:
            new_state[cname] = ns
        expand0 = cs0[site_ids]

        # site features route 2: per-site sum of compressed allele features
        cs1 = site_segment_sum(ca, site_onehot)
        expand1 = cs1[site_ids]

        xname = f"xattn{idx}"
        logits = None
        if self.nets.get(xname) is not None:
            logits, ns = self._apply_net(
                xname, params, state, (ca, (expand0, expand1)), train, rng,
                bn_mask=allele_mask)
            if ns:
                new_state[xname] = ns
        return logits, (cs0, cs1), ca

    def apply(self, params, state, batch, train=False, rng=None):
        """Run the forward pass.

        batch keys: reads0 [A,R0,L,C0], read_mask0 [A,R0], site_ids [A],
        allele_mask [A], ref_segments [S,L,5] (S defines the number of padded
        sites); plus reads1/read_mask1 for hybrid models.

        Returns (out, new_state) where out = {
            "experts": [A, E] raw logits per allele per expert,
            "meta": [S, 3] softmax meta-expert weights or None,
        }
        """
        new_state = dict(state)
        packed = "rows0" in batch            # packed-row wire expansion
        A = batch["read_mask0"].shape[0] if packed else batch["reads0"].shape[0]
        S = batch["ref_segments"].shape[0]   # static under jit
        site_ids = batch["site_ids"]
        allele_mask = batch["allele_mask"].astype(jnp.float32)
        site_onehot = make_site_onehot(site_ids, allele_mask, S)

        def read_reduce_packed(name, rows, row_allele, row_valid):
            """Conv over the PACKED row axis (only shipped rows) + per-allele
            segment sum — skips the conv FLOPs and HBM of the dense grid's
            padding rows (see compact.expand_compact_packed)."""
            from .layers import ACT_DTYPE
            flat = rows.astype(ACT_DTYPE or jnp.float32)
            frames, ns = self._apply_net(name, params, state, flat, train,
                                         rng, bn_mask=row_valid)
            if ns:
                new_state[name] = ns
            return packed_read_reduce(frames, row_allele, row_valid, A)

        def read_reduce(name, reads, mask):
            if (not train
                    and name in getattr(self, "pallas_read_convs", ())
                    and reads.shape[1] % PALLAS_LANE_MULTIPLE == 0):
                # Fused Pallas kernel: conv stack + masked reduction without
                # materialising per-read feature maps in HBM.  Engaged only
                # for full-128-lane read buckets (static shape at trace
                # time) in f32-activation modes, where it measured 1.40x
                # over the XLA path on a v5e; under bf16 activations XLA
                # wins and enable_pallas_read_convs leaves the kernel off
                # (measured roofline: ops/read_conv.py STATUS).
                from ..ops.read_conv import reduced_read_frames_pallas
                return reduced_read_frames_pallas(
                    self, params, name, reads, mask.astype(jnp.float32))
            Ax, R, L, C = reads.shape
            from .layers import ACT_DTYPE
            flat = reads.reshape(Ax * R, L, C).astype(ACT_DTYPE or jnp.float32)
            frames, ns = self._apply_net(name, params, state, flat, train,
                                         rng, bn_mask=mask.reshape(-1))
            if ns:
                new_state[name] = ns
            frames = frames.reshape(Ax, R, frames.shape[1], frames.shape[2])
            return masked_read_sum(frames, mask.astype(jnp.float32))

        # per-row masks for train-mode batch-norm statistics
        site_mask = (jnp.sum(site_onehot, axis=0) > 0).astype(jnp.float32)
        masks = dict(allele_mask=allele_mask, site_mask=site_mask)

        if packed:
            reduced0 = read_reduce_packed("read_conv0", batch["rows0"],
                                          batch["row_allele0"],
                                          batch["row_valid0"])
        else:
            reduced0 = read_reduce("read_conv0", batch["reads0"],
                                   batch["read_mask0"])
        e0, f0, ca0 = self._compress_and_predict(
            0, reduced0, site_onehot, site_ids, params, state, new_state,
            train, rng, **masks)

        if not self.hybrid:
            out = {"experts": e0, "meta": None}
            return out, new_state

        if packed:
            reduced1 = read_reduce_packed("read_conv1", batch["rows1"],
                                          batch["row_allele1"],
                                          batch["row_valid1"])
        else:
            reduced1 = read_reduce("read_conv1", batch["reads1"],
                                   batch["read_mask1"])
        e1, f1, ca1 = self._compress_and_predict(
            1, reduced1, site_onehot, site_ids, params, state, new_state,
            train, rng, **masks)

        meta_site_frames = None
        if self.has_compressor2:
            # hybrid features straight from summed read frames (reference :181-192)
            reduced2 = reduced0 + reduced1
            e2, f2, _ = self._compress_and_predict(
                2, reduced2, site_onehot, site_ids, params, state, new_state,
                train, rng, **masks)
            meta_site_frames = f2[0]
        elif self.has_xattn2:
            # combiner path (reference :193-219)
            ca2, ns = self._apply_net("combiner0", params, state, (ca0, ca1),
                                      train, rng, bn_mask=allele_mask)
            if ns:
                new_state["combiner0"] = ns
            cs2, ns = self._apply_net("combiner1", params, state,
                                      (f0[1], f1[1]), train, rng,
                                      bn_mask=site_mask)
            if ns:
                new_state["combiner1"] = ns
            e2, ns = self._apply_net(
                "xattn2", params, state, (ca2, (None, cs2[site_ids])), train,
                rng, bn_mask=allele_mask)
            if ns:
                new_state["xattn2"] = ns
            meta_site_frames = cs2
        else:
            e2 = None
            meta_site_frames = site_segment_sum(reduced0 + reduced1, site_onehot)

        meta = None
        if self.has_meta:
            meta_logits, ns = self._apply_net(
                "meta", params, state, (meta_site_frames, batch["ref_segments"].astype(jnp.float32)),
                train, rng, bn_mask=site_mask)
            if ns:
                new_state["meta"] = ns
            meta = jax.nn.softmax(meta_logits, axis=-1)

        if e0 is None and e1 is None:
            # hybrid no-ensemble: expert2 binary classifier only (case 1, reference :237-240)
            assert e2 is not None
            out = {"experts": e2, "meta": None}
        elif e2 is None:
            # case 2: experts 0/1 + meta; expert2 substituted with zeros (reference :241-245)
            experts = jnp.concatenate([e0, e1, jnp.zeros_like(e0)], axis=-1)
            out = {"experts": experts, "meta": meta}
        else:
            # case 3: all three experts + meta (reference :246-248)
            experts = jnp.concatenate([e0, e1, e2], axis=-1)
            out = {"experts": experts, "meta": meta}
        return out, new_state


def create_model(name_or_config) -> MoEAttention:
    """Create a model from a named config ("illumina", "pacbio", "pacbio_hp",
    "hybrid", "hybrid_no_ensemble") or an explicit config dict."""
    if isinstance(name_or_config, str):
        config = archs.NAMED_CONFIGS[name_or_config]()
    else:
        config = name_or_config
    return MoEAttention(config)
