"""Compact device transfer for padded pileup batches.

Through a remote-TPU tunnel (and, milder, over PCIe) the end-to-end caller is
transfer-bound: a 512-allele batch of dense uint8 features is ~30 MB and the
tunnel moves ~60 MB/s while the forward itself takes ~30 ms.  But most of the
dense tensor is reconstructable:

  * only ch0 (read base color) and ch2 (base quality color) vary per cell;
  * ch1 (reference base color) is a palette projection of the site's one-hot
    reference segment, which is already on device and covers the exact same
    mid-centred window (candidates.py _site_tensors / featurize.py
    render_read_row both use ``mid = (start+stop)//2; left = mid - L//2``);
  * ch3 (mapq), ch4 (strand) and ch6 (haplotag) are per-read constants;
  * ch5 (in-allele-region marker) depends only on the site's region bounds;
  * padded read rows (the read-bucket tail) carry no information at all.

So the wire format is: per real read row, ``[L]`` uint8 *codes* — ch0 takes
only the 5 base-palette colors {0, 30, 100, 180, 250} and ch2 only the 41
quality-ladder colors ``int(254*q/40)``, so a present cell packs exactly into
``base_idx * 41 + qual_idx`` (0..204) with 255 marking an absent cell (a cell
is present iff ch4 != 0, since strand color is 70 or 240 on every written
cell) — plus per-row scalars, a row -> (allele, read) slot index, and
per-site region bounds.  A legacy 3-byte-per-cell layout (ch0, ch2, mask) is
kept as a fallback for tensors whose colors fall outside the palettes (never
produced by the featurizer; defensive only).  ``expand_compact`` rebuilds the
full ``[A, R, L, C]`` uint8 tensor inside the jitted forward with one scatter,
two palette gathers and a few masked broadcasts, which XLA fuses into the
model's input conversion.  Reconstruction is byte-exact
(tests/test_compact.py); at typical ~60% read bucket occupancy the coded
format shrinks the transfer ~9x vs dense (~3x over the 3-byte layout).

Rows whose read_mask is 0 are not shipped: the model multiplies their frames
by 0 (masked_read_sum / the Pallas mask matrix), and the dense packer zero
fills them, so reconstructing them as zeros is exact.

The on-device expansion is free: an A/B of the jitted forward at the
production batch shape (1024 sites x 2 alleles, 50+30 reads, bf16, v5e)
measured the wire path at 117 ms/batch vs 124 ms for dense input — the
scatter+gathers fuse into the model's input conversion and the coded input
reads ~4x less HBM than the dense uint8 tensor.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .batching import (DEFAULT_ALLELE_BUCKETS, DEFAULT_READ_BUCKETS,
                       DEFAULT_SITE_BUCKETS, CodedSiteWork, PaddedBatch,
                       _bucket as _batch_bucket)

# Legacy geometric ladder for the packed-row count (kept for explicit
# callers/tests).  The DEFAULT policy (ladder=None) quantises the row axis
# to {cap/4, cap/2, cap} instead: every distinct row count is a fresh XLA
# compile of the whole forward — minutes through remote-TPU tunnels — so the
# row axis must add at most two shapes per (A, R) bucket pair (a 100 Mb
# soak's live compile set dominated its wall clock under the deep ladder);
# the transfer inflation vs the deep ladder is <2x and only for
# below-quarter-occupancy batches.
ROW_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
               65536, 131072, 262144)

# base_color palette in one-hot order A, C, G, T, other
# (featurize.base_color / engine.cpp base_color)
REF_COLOR_PALETTE = (250.0, 30.0, 180.0, 100.0, 0.0)

# reference-window base-code expansion tables (code 5 = off-chromosome
# padding: all-zero one-hot row — see batching.ref_segment_codes)
REF_ONEHOT6 = np.concatenate([np.eye(5, dtype=np.float32),
                              np.zeros((1, 5), np.float32)])
REF_COLOR6 = np.array(list(REF_COLOR_PALETTE) + [0.0],
                      np.float32).astype(np.uint8)

# cell-code palettes (constants.base_color / base_quality_color value sets);
# must match engine.cpp htpu_compact_rows_coded
BASE_PALETTE = np.array([0, 30, 100, 180, 250], np.uint8)
QUAL_PALETTE = np.array([int(254 * q / 40) for q in range(41)], np.uint8)
_BASE_LUT = np.full(256, 255, np.uint8)
_BASE_LUT[BASE_PALETTE] = np.arange(len(BASE_PALETTE), dtype=np.uint8)
_QUAL_LUT = np.full(256, 255, np.uint8)
_QUAL_LUT[QUAL_PALETTE] = np.arange(len(QUAL_PALETTE), dtype=np.uint8)
ABSENT_CODE = 255  # also > any valid code = 4 * 41 + 40 = 204


def _bucket(n: int, cap: int, ladder: Optional[Sequence[int]] = None) -> int:
    # like batching._bucket, but clamped to cap (= A*R) AND never smaller
    # than n: packed rows must not be truncated past the ladder's top.
    # Default (ladder=None): the {cap/4, cap/2, cap} compile-shape policy
    # (see ROW_BUCKETS note).
    if ladder is None:
        for b in (cap // 4, cap // 2):
            if b >= n and b >= 1:
                return b
        return cap
    for b in ladder:
        if n <= b:
            return min(b, cap)
    return cap


def _pack_platform(reads: np.ndarray, mask: np.ndarray) -> Dict[str, np.ndarray]:
    """Pack one platform's real rows: [A,R,L,C] + [A,R] -> wire arrays.

    Prefers the 1-byte-per-cell coded layout (key ``codes``); falls back to
    the legacy 3-byte layout (key ``packed``) when a present cell's color is
    outside the palettes (not produced by the featurizer; defensive only)."""
    A, R, L, C = reads.shape
    rows = np.flatnonzero(mask.reshape(-1) > 0).astype(np.int32)
    n = len(rows)
    nb = _bucket(max(n, 1), A * R)
    nscal = 3 if C == 7 else 2
    slots = np.full(nb, A * R, np.int32)   # padding scatters to the dummy row
    slots[:n] = rows
    scalars = np.zeros((nb, nscal), np.uint8)
    flat_in = np.ascontiguousarray(reads).reshape(A * R, L, C)
    from .. import native

    codes = np.full((nb, L), ABSENT_CODE, np.uint8)
    got = native.compact_rows_coded(flat_in, rows, codes, scalars)
    if got is True:
        return {"codes": codes, "scalars": scalars, "slots": slots}
    if got is False:
        # numpy coding (byte-strided channel split; ~10x the native cost)
        flat = flat_in[rows]
        present = flat[..., 4] > 0
        b = _BASE_LUT[flat[..., 0]]
        q = _QUAL_LUT[flat[..., 2]]
        # absent cells decode as all-zero, so a nonzero color there (never
        # produced by the featurizer) must also take the fallback
        codable = (not ((b == 255) | (q == 255))[present].any()
                   and not (flat[..., 0] | flat[..., 2])[~present].any())
        if codable:
            codes[:n] = np.where(present, b * 41 + q, ABSENT_CODE)
            # per-row scalars from PRESENT cells only, matching the native
            # packers: reconstruction paints scalars * presence-mask, so an
            # absent cell's channel value is unrepresentable on the wire
            scalars[:n, 0] = np.where(present, flat[..., 3], 0).max(axis=1)
            scalars[:n, 1] = flat[..., 4].max(axis=1)   # ch4==0 defines absent
            if C == 7:
                scalars[:n, 2] = np.where(present, flat[..., 6], 0).max(axis=1)
            return {"codes": codes, "scalars": scalars, "slots": slots}

    # legacy 3-byte layout (native coder returned None, or numpy found an
    # out-of-palette color)
    scalars[:] = 0
    packed = np.zeros((nb, L, 3), np.uint8)
    if not native.compact_rows(flat_in, rows, packed, scalars):
        flat = flat_in[rows]
        packed[:n, :, 0] = flat[..., 0]
        packed[:n, :, 1] = flat[..., 2]
        packed[:n, :, 2] = flat[..., 4] > 0
        # per-row constants from present cells only (see coded path above)
        present = flat[..., 4] > 0
        scalars[:n, 0] = np.where(present, flat[..., 3], 0).max(axis=1)
        scalars[:n, 1] = flat[..., 4].max(axis=1)   # ch4==0 defines absent
        if C == 7:
            scalars[:n, 2] = np.where(present, flat[..., 6], 0).max(axis=1)
    return {"packed": packed, "scalars": scalars, "slots": slots}


def _encode_rows(flat: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Code every row of a dense [N, L, C] block: (codes [N, L],
    scalars [N, nscal]) or None when a color falls outside the palettes."""
    N, L, C = flat.shape
    nscal = 3 if C == 7 else 2
    codes = np.empty((N, L), np.uint8)
    scalars = np.zeros((N, nscal), np.uint8)
    if N == 0:
        return codes, scalars
    from .. import native
    flat = np.ascontiguousarray(flat)
    rows = np.arange(N, dtype=np.int32)
    got = native.compact_rows_coded(flat, rows, codes, scalars)
    if got is True:
        return codes, scalars
    if got is None:                       # out-of-palette color
        return None
    present = flat[..., 4] > 0
    b = _BASE_LUT[flat[..., 0]]
    q = _QUAL_LUT[flat[..., 2]]
    codable = (not ((b == 255) | (q == 255))[present].any()
               and not (flat[..., 0] | flat[..., 2])[~present].any())
    if not codable:
        return None
    codes[:] = np.where(present, b * 41 + q, ABSENT_CODE)
    scalars[:, 0] = np.where(present, flat[..., 3], 0).max(axis=1)
    scalars[:, 1] = flat[..., 4].max(axis=1)
    if C == 7:
        scalars[:, 2] = np.where(present, flat[..., 6], 0).max(axis=1)
    return codes, scalars


def encode_site_work(site) -> Optional[CodedSiteWork]:
    """SiteWork -> CodedSiteWork (1-byte coded rows), or None when any cell
    color falls outside the palettes (never true of featurizer output)."""
    from .batching import ref_segment_codes

    def _platform(tensors):
        if not tensors:
            return [], []
        flat = np.concatenate([np.ascontiguousarray(t) for t in tensors])
        enc = _encode_rows(flat)
        if enc is None:
            return None
        codes, scalars = enc
        out_c, out_s, off = [], [], 0
        for t in tensors:
            r = t.shape[0]
            out_c.append(codes[off:off + r])
            out_s.append(scalars[off:off + r])
            off += r
        return out_c, out_s

    p0 = _platform(site.tensors0)
    if p0 is None:
        return None
    codes1 = scal1 = None
    if site.tensors1 is not None:
        p1 = _platform(site.tensors1)
        if p1 is None:
            return None
        codes1, scal1 = p1
    # recover the [L] base codes from the one-hot segment (row 5 = the
    # all-zero off-chromosome padding rows of padded_ref_segment)
    seg = site.ref_segment
    ref_codes = None
    if seg is not None:
        ref_codes = np.where(seg.sum(axis=1) > 0,
                             seg.argmax(axis=1), 5).astype(np.uint8)
    return CodedSiteWork(
        chromosome=site.chromosome, start=site.start, stop=site.stop,
        alleles=list(site.alleles), codes0=p0[0], scal0=p0[1],
        codes1=codes1, scal1=scal1, ref_codes=ref_codes,
        labels=site.labels, site_label=site.site_label)


def encode_chunk_sites(sites) -> Optional[List[CodedSiteWork]]:
    """Encode a chunk's SiteWork list for the wire; None if ANY site cannot
    be coded (the caller ships the dense list instead — mixing formats in
    one stream is not worth the packer complexity)."""
    out = []
    for s in sites:
        c = encode_site_work(s)
        if c is None:
            return None
        out.append(c)
    return out


@dataclasses.dataclass
class WireBatch:
    """A packed coded-wire batch: ``wire`` is the device dict (what
    ``expand_compact`` consumes inside jit); the remaining fields mirror
    PaddedBatch's host-side bookkeeping for decode/record assembly."""
    wire: Dict[str, np.ndarray]
    num_sites: int
    sites: List[CodedSiteWork]
    allele_site_index: List[tuple]
    labels: Optional[np.ndarray] = None      # [A] float32 (allele labels)


def pack_sites_wire(
    sites: Sequence[CodedSiteWork],
    hybrid: bool,
    feature_length: int = 150,
    read_buckets: Sequence[int] = DEFAULT_READ_BUCKETS,
    allele_buckets: Sequence[int] = DEFAULT_ALLELE_BUCKETS,
    site_buckets: Sequence[int] = DEFAULT_SITE_BUCKETS,
    row_buckets: Optional[Sequence[int]] = None,
) -> WireBatch:
    """Pack CodedSiteWork straight into a device wire dict — the coded-path
    twin of ``pack_sites`` + ``compact_batch`` with no dense intermediate
    (byte-equivalent on-device expansion asserted in tests/test_coded_wire).

    ``row_buckets``: ladder for the packed-row axis; pass ``(0,)`` to pin the
    row axis at its cap ``A*R`` (a fixed shape regardless of occupancy — the
    training loader uses this under ``fixed_shape`` so every step compiles
    once).
    """
    num_alleles = sum(len(s.alleles) for s in sites)
    A = _batch_bucket(max(num_alleles, 1), allele_buckets)
    S = _batch_bucket(max(len(sites), 1), site_buckets)
    if len(sites) > S or num_alleles > A:
        raise ValueError(
            f"group of {len(sites)} sites / {num_alleles} alleles exceeds "
            f"buckets (S={S}, A={A}); lower the grouping budgets")
    L = feature_length

    def _platform(get_codes, get_scal):
        # vectorised packing: this runs in the device-owning main process on
        # the calling hot path (~40 us/site in the loop form it replaces)
        row_codes: List[np.ndarray] = []
        row_scals: List[np.ndarray] = []
        for s in sites:
            row_codes.extend(get_codes(s))
            row_scals.extend(get_scal(s))
        counts = np.fromiter((c.shape[0] for c in row_codes), np.int64,
                             len(row_codes))
        max_r = int(counts.max()) if counts.size else 1
        R = _batch_bucket(max(max_r, 1), read_buckets)
        if max_r > R:     # reads beyond the ladder top: truncate (backstop)
            row_codes = [c[:R] for c in row_codes]
            row_scals = [sc[:R] for sc in row_scals]
            counts = np.minimum(counts, R)
        n = int(counts.sum())
        nb = _bucket(max(n, 1), A * R, row_buckets)
        codes = np.full((nb, L), ABSENT_CODE, np.uint8)
        nscal = row_scals[0].shape[1] if row_scals else 2
        scalars = np.zeros((nb, nscal), np.uint8)
        slots = np.full(nb, A * R, np.int32)
        # wire masks ship as uint8 (cast on device): 4x fewer bytes than
        # float32 over the [A, R] grid, and every in-jit consumer either
        # reads only the shape or casts before arithmetic
        mask = np.zeros((A, R), np.uint8)
        if n:
            np.concatenate(row_codes, out=codes[:n])
            np.concatenate(row_scals, out=scalars[:n])
            # flat slot index per real row: slot*R + intra-slot row number
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            intra = np.arange(n, dtype=np.int64) - starts
            flat = np.repeat(np.arange(len(counts), dtype=np.int64) * R,
                             counts) + intra
            slots[:n] = flat
            mask.reshape(-1)[flat] = 1
        return codes, scalars, slots, mask

    site_ids = np.full((A,), S - 1, np.int32)
    allele_mask = np.zeros((A,), np.float32)
    ref_codes = np.full((S, L), 5, np.uint8)
    rel = np.zeros((S, 2), np.int32)
    labels = np.zeros((A,), np.float32)
    has_labels = all(s.labels is not None for s in sites) and sites
    index = []
    slot = 0
    for si, site in enumerate(sites):
        if site.ref_codes is not None:
            ref_codes[si] = site.ref_codes
        mid = (site.start + site.stop) // 2
        fstart = mid - L // 2
        rel[si, 0] = site.start - fstart
        rel[si, 1] = site.stop - fstart
        for ai in range(len(site.alleles)):
            site_ids[slot] = si
            allele_mask[slot] = 1.0
            if has_labels:
                labels[slot] = site.labels[ai]
            index.append((si, ai))
            slot += 1

    codes0, scal0, slots0, mask0 = _platform(lambda s: s.codes0,
                                             lambda s: s.scal0)
    wire = {
        "site_ids": site_ids,
        "allele_mask": allele_mask,
        "ref_codes": ref_codes,
        "relbounds": rel,
        "read_mask0": mask0,
        "codes0": codes0,
        "row_scalars0": scal0,
        "row_slots0": slots0,
    }
    if hybrid:
        codes1, scal1, slots1, mask1 = _platform(lambda s: s.codes1,
                                                 lambda s: s.scal1)
        wire.update(read_mask1=mask1, codes1=codes1, row_scalars1=scal1,
                    row_slots1=slots1)
    return WireBatch(wire=wire, num_sites=S, sites=list(sites),
                     allele_site_index=index,
                     labels=labels if has_labels else None)


def training_wire_dict(wb: WireBatch) -> Dict[str, np.ndarray]:
    """Coded-wire device dict + labels for training (the wire twin of
    batching.training_dict); the trainer expands it inside the jitted step."""
    assert wb.labels is not None, "training batches need labels"
    d = dict(wb.wire)
    d["labels"] = wb.labels
    return d


def stack_wire_batches(dicts: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-device wire dicts along a new leading device axis.

    Unlike dense batches, wire dicts packed to the same allele/read/site
    buckets can still differ on the packed-row axis (occupancy-dependent row
    bucket); rows are padded up to the group maximum first.  Padding rows are
    inert by construction: codes = ABSENT, scalars = 0, and slots point at
    the dummy scatter row ``A*R``."""
    keys = dicts[0].keys()
    row_keys = [k for k in keys if k.startswith(("codes", "row_scalars",
                                                 "row_slots"))]
    nb = {}
    for k in row_keys:
        nb[k] = max(d[k].shape[0] for d in dicts)

    def _pad(k, arr):
        want = nb.get(k)
        if want is None or arr.shape[0] == want:
            return arr
        pad = want - arr.shape[0]
        if k.startswith("codes"):
            fill = np.full((pad,) + arr.shape[1:], ABSENT_CODE, arr.dtype)
        elif k.startswith("row_slots"):
            # the dummy row index is A*R of the matching platform's mask
            platform = k[-1]
            mask = dicts[0][f"read_mask{platform}"]
            fill = np.full((pad,), mask.shape[0] * mask.shape[1], arr.dtype)
        else:
            fill = np.zeros((pad,) + arr.shape[1:], arr.dtype)
        return np.concatenate([arr, fill])

    return {k: np.stack([_pad(k, d[k]) for d in dicts], axis=0) for k in keys}


def compact_batch(batch: PaddedBatch) -> Dict[str, np.ndarray]:
    """Compact wire dict for a padded batch (replaces ``device_dict()``)."""
    d = {
        "site_ids": batch.site_ids,
        "allele_mask": batch.allele_mask,
        "ref_segments": batch.ref_segments,
        # uint8 wire mask: 4x fewer bytes; in-jit consumers cast
        "read_mask0": batch.read_mask0.astype(np.uint8),
    }
    def _add(k):
        p = _pack_platform(getattr(batch, f"reads{k}"),
                           getattr(batch, f"read_mask{k}"))
        key = "codes" if "codes" in p else "packed"
        d[f"{key}{k}"] = p[key]
        d[f"row_scalars{k}"], d[f"row_slots{k}"] = p["scalars"], p["slots"]

    _add(0)
    if batch.reads1 is not None:
        d["read_mask1"] = batch.read_mask1.astype(np.uint8)
        _add(1)
    # per-site allele-region bounds relative to the feature window
    S = batch.ref_segments.shape[0]
    L = batch.reads0.shape[2]
    rel = np.zeros((S, 2), np.int32)
    for i, site in enumerate(batch.sites):
        mid = (site.start + site.stop) // 2
        fstart = mid - L // 2
        rel[i, 0] = site.start - fstart
        rel[i, 1] = site.stop - fstart
    d["relbounds"] = rel
    return d


def _assemble_channels(ch0, ch2, m, scalars, slots, mask, ref_colors,
                       pos_colors, site_ids):
    """Common channel reassembly from decoded (ch0, ch2, per-cell mask)."""
    import jax.numpy as jnp

    A, R = mask.shape
    scal = jnp.zeros((A * R + 1, scalars.shape[1]), jnp.uint8) \
              .at[slots].set(scalars)[:A * R] \
              .reshape(A, R, scalars.shape[1])
    ch1 = ref_colors[site_ids][:, None, :] * m             # [A,R,L]
    ch3 = scal[..., 0:1] * m
    ch4 = scal[..., 1:2] * m
    ch5 = pos_colors[site_ids][:, None, :] * m
    chans = [ch0, ch1, ch2, ch3, ch4, ch5]
    if scalars.shape[1] == 3:
        chans.append(scal[..., 2:3] * m)
    return jnp.stack(chans, axis=-1)


def _expand_platform(packed, scalars, slots, mask, ref_colors, pos_colors,
                     site_ids):
    """Rebuild [A,R,L,C] uint8 reads from legacy 3-byte wire arrays."""
    import jax.numpy as jnp

    A, R = mask.shape
    L = packed.shape[1]
    buf = jnp.zeros((A * R + 1, L, 3), jnp.uint8).at[slots].set(packed)
    buf = buf[:A * R].reshape(A, R, L, 3)
    return _assemble_channels(buf[..., 0], buf[..., 1], buf[..., 2],
                              scalars, slots, mask, ref_colors, pos_colors,
                              site_ids)


def _expand_platform_coded(codes, scalars, slots, mask, ref_colors,
                           pos_colors, site_ids):
    """Rebuild [A,R,L,C] uint8 reads from 1-byte cell codes."""
    import jax.numpy as jnp

    A, R = mask.shape
    L = codes.shape[1]
    # unscattered rows must decode as absent, so the buffer fills with 255
    buf = jnp.full((A * R + 1, L), ABSENT_CODE, jnp.uint8) \
             .at[slots].set(codes)[:A * R].reshape(A, R, L)
    c = buf.astype(jnp.int32)
    present = c != ABSENT_CODE
    # absent cells map to code 0 = (base palette 0, qual palette 0) = (0, 0),
    # which is already the dense tensor's zero fill — no extra masking needed
    c0 = jnp.where(present, c, 0)
    ch0 = jnp.take(jnp.asarray(BASE_PALETTE), c0 // 41)
    ch2 = jnp.take(jnp.asarray(QUAL_PALETTE), c0 % 41)
    m = present.astype(jnp.uint8)
    return _assemble_channels(ch0, ch2, m, scalars, slots, mask,
                              ref_colors, pos_colors, site_ids)


def expand_compact_packed(batch: Dict) -> Dict:
    """Coded-wire expansion WITHOUT the dense scatter: decode each shipped
    row in place ``[nb, L, C]`` plus its allele-slot id, so the model's
    read convolver runs over the PACKED row axis (only real rows + the
    row-bucket tail) instead of the dense ``A*R`` grid.

    At typical ~60% read-bucket occupancy the dense grid carries ~1.7x the
    rows the wire shipped; the conv stack is the forward's dominant cost,
    so skipping padding rows is a direct device-rate lever (and the dense
    ``[A, R, L, C]`` uint8 intermediate never materialises in HBM at all).
    The per-allele reduction becomes a segment-sum over ``row_allele``
    (moe.packed_read_reduce); padding rows carry ``row_allele == A`` and
    fold into a dropped dummy segment.  Only valid for batches where every
    platform ships 1-byte codes (the production wire path)."""
    import jax.numpy as jnp

    if "codes0" not in batch:
        raise ValueError("packed expansion needs coded-wire batches")

    if "ref_codes" in batch:
        rc = batch["ref_codes"].astype(jnp.int32)
        ref_segments = jnp.asarray(REF_ONEHOT6)[rc]        # [S, L, 5]
        ref_colors = jnp.asarray(REF_COLOR6)[rc]           # [S, L] uint8
        L = rc.shape[1]
    else:
        ref_segments = batch["ref_segments"]
        L = ref_segments.shape[1]
        palette = jnp.asarray(REF_COLOR_PALETTE, jnp.float32)
        ref_colors = jnp.dot(ref_segments.astype(jnp.float32),
                             palette).astype(jnp.uint8)
    rel = batch["relbounds"]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos_colors = jnp.where((idx >= rel[:, 0:1]) & (idx < rel[:, 1:2]),
                           np.uint8(240), np.uint8(70)).astype(jnp.uint8)
    site_ids = batch["site_ids"]

    def _rows(k):
        codes = batch[f"codes{k}"]                 # [nb, L]
        scalars = batch[f"row_scalars{k}"]         # [nb, nscal]
        slots = batch[f"row_slots{k}"]             # [nb] flat A*R index
        mask = batch[f"read_mask{k}"]              # [A, R]
        A, R = mask.shape
        valid = (slots < A * R)
        row_allele = jnp.where(valid, slots // R, A).astype(jnp.int32)
        # padding rows must index a real site row for the gathers; their
        # frames are zeroed by `valid` before the reduction anyway
        row_site = site_ids[jnp.minimum(row_allele, A - 1)]
        c = codes.astype(jnp.int32)
        present = c != ABSENT_CODE
        c0 = jnp.where(present, c, 0)
        ch0 = jnp.take(jnp.asarray(BASE_PALETTE), c0 // 41)
        ch2 = jnp.take(jnp.asarray(QUAL_PALETTE), c0 % 41)
        m = present.astype(jnp.uint8)
        ch1 = ref_colors[row_site] * m                      # [nb, L]
        ch3 = scalars[:, 0:1] * m
        ch4 = scalars[:, 1:2] * m
        ch5 = pos_colors[row_site] * m
        chans = [ch0, ch1, ch2, ch3, ch4, ch5]
        if scalars.shape[1] == 3:
            chans.append(scalars[:, 2:3] * m)
        rows = jnp.stack(chans, axis=-1)                    # [nb, L, C]
        return rows, row_allele, valid.astype(jnp.float32), A

    rows0, row_allele0, row_valid0, A0 = _rows(0)
    out = {
        "site_ids": site_ids,
        "allele_mask": batch["allele_mask"],
        "ref_segments": ref_segments,
        "read_mask0": batch["read_mask0"],
        "rows0": rows0,
        "row_allele0": row_allele0,
        "row_valid0": row_valid0,
    }
    if "codes1" in batch:
        rows1, row_allele1, row_valid1, _ = _rows(1)
        out.update(read_mask1=batch["read_mask1"], rows1=rows1,
                   row_allele1=row_allele1, row_valid1=row_valid1)
    elif "packed1" in batch:
        raise ValueError("packed expansion needs coded-wire batches")
    return out


def expand_compact(batch: Dict) -> Dict:
    """Device-side inverse of ``compact_batch`` / ``pack_sites_wire`` (inside
    jit): returns a batch dict with dense ``reads0``/``reads1`` and float
    ``ref_segments``.  No-op for dense batches."""
    if "packed0" not in batch and "codes0" not in batch:
        return batch
    import jax.numpy as jnp

    if "ref_codes" in batch:
        # [S, L] uint8 base codes -> one-hot segments + reference colors
        # (code 5 = off-chromosome padding: zero row / color 0)
        rc = batch["ref_codes"].astype(jnp.int32)
        ref_segments = jnp.asarray(REF_ONEHOT6)[rc]        # [S, L, 5]
        ref_colors = jnp.asarray(REF_COLOR6)[rc]           # [S, L] uint8
        L = rc.shape[1]
    else:
        ref_segments = batch["ref_segments"]
        L = ref_segments.shape[1]
        palette = jnp.asarray(REF_COLOR_PALETTE, jnp.float32)
        ref_colors = jnp.dot(ref_segments.astype(jnp.float32),
                             palette).astype(jnp.uint8)    # [S, L]
    rel = batch["relbounds"]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos_colors = jnp.where((idx >= rel[:, 0:1]) & (idx < rel[:, 1:2]),
                           np.uint8(240), np.uint8(70)).astype(jnp.uint8)

    def _reads(k):
        args = (batch[f"row_scalars{k}"], batch[f"row_slots{k}"],
                batch[f"read_mask{k}"], ref_colors, pos_colors,
                batch["site_ids"])
        if f"codes{k}" in batch:
            return _expand_platform_coded(batch[f"codes{k}"], *args)
        return _expand_platform(batch[f"packed{k}"], *args)

    out = {
        "site_ids": batch["site_ids"],
        "allele_mask": batch["allele_mask"],
        "ref_segments": ref_segments,
        "read_mask0": batch["read_mask0"],
        "reads0": _reads(0),
    }
    if "packed1" in batch or "codes1" in batch:
        out["read_mask1"] = batch["read_mask1"]
        out["reads1"] = _reads(1)
    return out
