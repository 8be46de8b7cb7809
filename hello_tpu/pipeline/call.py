"""End-to-end variant calling driver.

Equivalent of the reference user entry point (reference python/call.py +
caller_calling.py): hotspot detection -> active regions -> candidate intervals
-> site tensor generation -> batched TPU scoring -> genotype decode -> sorted
VCF.  Designed host-side as a library; the CLI wraps `call_region` /
`call_genome`.  Multi-host scale-out shards regions deterministically by
process index (see hello_tpu.parallel).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import telemetry
from ..constants import FEATURE_LENGTH
from ..io.fasta import FastaFile
from ..io.vcf import VcfRecord, make_record, write_vcf
from ..nn.genotype import decode_batch
from ..nn.moe import MoEAttention, create_model
from .batching import PaddedBatch, SiteWork, group_sites_for_batching, pack_sites
from .candidates import generate_sites
from .hotspots import (candidate_intervals, cluster_hotspots, detect_hotspots,
                       make_read_sources)

logger = logging.getLogger(__name__)


class Scorer:
    """Jitted batched model forward with shape-bucketed compilation caching.

    ``use_pallas=None`` (auto) enables the fused Pallas read-convolver kernel
    on non-CPU backends for standard read-convolver topologies in
    f32-activation modes, where it measured 1.4x over the XLA path on a v5e;
    under the bf16 default XLA wins and the kernel stays off (roofline in
    ops/read_conv.py).  HELLO_TPU_PALLAS=0/1 forces it off/on.
    """

    # this scorer can consume pre-coded WireBatch inputs (pack_sites_wire);
    # the jitted forward expands them on device regardless of ``compact``
    accepts_wire = True

    def __init__(self, model: MoEAttention, params, state, donate: bool = False,
                 use_pallas: Optional[bool] = None,
                 compact: Optional[bool] = None,
                 devices: Optional[Sequence] = None,
                 device_decode: Optional[bool] = None):
        import jax

        self.model = model
        self.params = params
        self.state = state

        # Multi-chip hosts: batches round-robin across all local devices of
        # the default backend in one process (weights replicated per device
        # on first use).  The pipelined caller keeps several batches in
        # flight, so N local chips execute N batches concurrently.
        # ``devices=[...]`` pins explicitly; default = every local
        # accelerator (on the CPU backend, just device 0 — "multiple CPU
        # devices" are a virtual test construct, not parallel hardware).
        if devices is not None:
            self.devices = list(devices)
        elif jax.local_devices()[0].platform == "cpu":
            self.devices = [jax.local_devices()[0]]
        else:
            self.devices = list(jax.local_devices())
        self._per_device = {}     # device -> (params, state) resident copies
        self._next_device = 0
        # round-robin busy-ness accounting (multi-chip scaling evidence):
        # dispatches per device, outstanding (dispatched, not yet finalized)
        # per device, and the peak number of devices holding work at once
        self.dispatch_counts: Dict[str, int] = {}
        self._outstanding: Dict = {}
        self._out_device: Dict[int, object] = {}
        self.peak_concurrent_devices = 0
        # dispatch (caller thread) and finalize (a drainer thread,
        # parallel_call._AsyncDrainer) mutate the accounting concurrently
        import threading
        self._account_lock = threading.Lock()

        from ..ops.read_conv import enable_pallas_read_convs
        enabled = enable_pallas_read_convs(model, params, use_pallas)
        if enabled:
            logger.info("pallas read-convolver enabled for %s", enabled)

        # Compact wire format (pipeline/compact.py): ship only the varying
        # feature channels of real read rows and rebuild the dense tensor on
        # device.  ~3x fewer host->device bytes — decisive through remote-TPU
        # tunnels where the caller is transfer-bound, mildly useful over
        # PCIe, pure overhead on the CPU backend (transfer is free there).
        # explicit caller intent wins; the env var only steers the default
        if compact is None:
            env = os.environ.get("HELLO_TPU_COMPACT", "")
            if env in ("0", "1"):
                compact = env == "1"
            else:
                compact = jax.devices()[0].platform not in ("cpu",)
        self.compact = compact

        # On-device genotype decode (nn/genotype.decode_pairs_device): the
        # plain calling paths fetch 13 bytes/site instead of the [A,E]+[S,3]
        # logit tensors and skip the host numpy decode entirely.  Callers
        # that need the full tensors (provide_features, parity tests) request
        # them per dispatch; HELLO_TPU_DEVICE_DECODE=0 forces the host path.
        if device_decode is None:
            device_decode = os.environ.get(
                "HELLO_TPU_DEVICE_DECODE", "1") == "1"
        self.device_decode = device_decode

        # Packed-row read convolution (compact.expand_compact_packed +
        # moe.packed_read_reduce): for coded-wire batches the conv stack runs
        # over only the shipped rows instead of the dense A*R grid — at
        # typical ~60% bucket occupancy that skips ~40% of the forward's
        # dominant FLOPs and never materialises the dense uint8 tensor in
        # HBM.  Auto: on for accelerators (wire is the default there), off
        # on CPU (wire itself is off); HELLO_TPU_PACKED_CONV=0/1 forces.
        env = os.environ.get("HELLO_TPU_PACKED_CONV", "")
        if env in ("0", "1"):
            self.packed_conv = env == "1"
        else:
            self.packed_conv = jax.devices()[0].platform not in ("cpu",)

        # the number of padded sites is carried by ref_segments' static shape;
        # bucketed batch shapes keep recompiles rare
        self._jax = jax
        self._jitted = self._make_jitted()
        self._jitted_decode = self._make_jitted(decode=True)

    @property
    def max_in_flight(self) -> int:
        """Pipelining depth for the async scoring loops: deep enough that
        every local chip holds work AND that readback latency (large through
        remote-TPU tunnels) hides behind several executing batches.  The
        window holds batch inputs alive in HBM — with the compact wire format
        a batch is a few MB, so a deep window is cheap, and remote tunnels
        intermittently stall readbacks for ~0.1-1 s (measured), which a
        shallow window would turn into dispatch gaps."""
        return max(12, 2 * len(self.devices) + 2)

    def _make_jitted(self, decode: bool = False):
        model = self.model
        from .compact import expand_compact, expand_compact_packed
        use_packed = self.packed_conv

        def forward(params, state, batch):
            if (use_packed and "codes0" in batch
                    and ("codes1" in batch or "read_mask1" not in batch)):
                # packed-row path: conv over shipped rows only
                batch = expand_compact_packed(batch)
            else:
                batch = expand_compact(batch)   # no-op for dense batches
            out, _ = model.apply(params, state, batch, train=False)
            if decode:
                from ..nn.genotype import decode_pairs_device
                return decode_pairs_device(
                    out["experts"], out["meta"], batch["site_ids"],
                    batch["allele_mask"], batch["ref_segments"].shape[0])
            return out

        # fresh function object => fresh jit trace cache (needed when the
        # pallas fallback re-tags the model)
        return self._jax.jit(forward)

    def score_async(self, batch: PaddedBatch, decode: bool = False):
        """Dispatch the forward and return device arrays without blocking —
        jax's async dispatch lets the host pack/decode other batches while
        the device executes this one (see the pipelined loop in
        ``call_region``).

        ``decode=True`` (honoured only when the scorer's ``device_decode`` is
        on) fuses the genotype decode into the jitted forward and returns the
        per-site winner arrays instead of the logit tensors."""
        decode = decode and self.device_decode
        if hasattr(batch, "wire"):        # WireBatch: pre-coded by the host
            d = batch.wire
        elif self.compact:
            from .compact import compact_batch
            d = compact_batch(batch)
        else:
            d = batch.device_dict()
        dev = self.devices[self._next_device % len(self.devices)]
        self._next_device += 1
        # hot-swapping scorer.params/state (e.g. loading a new checkpoint
        # into an existing Scorer) must invalidate the per-device copies
        src = (id(self.params), id(self.state))
        if getattr(self, "_per_device_src", None) != src:
            self._per_device = {}
            self._per_device_src = src
        if dev not in self._per_device:
            self._per_device[dev] = self._jax.device_put(
                (self.params, self.state), dev)
        params, state = self._per_device[dev]
        d = self._jax.device_put(d, dev)   # jit dispatches on input placement
        fn = self._jitted_decode if decode else self._jitted
        try:
            return self._account_dispatch(
                dev, self._start_readback(fn(params, state, d)))
        except Exception as exc:
            # Mosaic compile failures are shape/backend dependent; never let
            # the fused-kernel fast path take down a calling run.  Only
            # kernel-looking failures trigger the fallback — a transient
            # device/tunnel error must surface as itself, not silently
            # disable the kernel for the rest of the run.
            msg = f"{type(exc).__name__}: {exc}"
            kernel_error = any(k in msg for k in
                               ("Mosaic", "mosaic", "pallas", "Pallas"))
            if not getattr(self.model, "pallas_read_convs", ()) \
                    or not kernel_error:
                raise
            logger.warning("pallas read-convolver failed; falling back to "
                           "the XLA path for this run", exc_info=True)
            self.model.pallas_read_convs = ()
            self._jitted = self._make_jitted()
            self._jitted_decode = self._make_jitted(decode=True)
            fn = self._jitted_decode if decode else self._jitted
            return self._account_dispatch(
                dev, self._start_readback(fn(params, state, d)))

    def _account_dispatch(self, dev, out):
        """Track the round-robin's per-device load and concurrency so the
        multichip dryrun / bench can assert all devices hold work at once
        (scaling-efficiency evidence, not just round-robin equality)."""
        key = str(dev)
        with self._account_lock:
            self.dispatch_counts[key] = self.dispatch_counts.get(key, 0) + 1
            self._outstanding[key] = self._outstanding.get(key, 0) + 1
            self._out_device[id(out)] = key
            busy = sum(1 for v in self._outstanding.values() if v > 0)
            self.peak_concurrent_devices = max(self.peak_concurrent_devices,
                                               busy)
        return out

    def _start_readback(self, out):
        """Kick off the device->host transfer of every output array without
        blocking: the bytes stream back while the device executes later
        batches, so ``finalize`` mostly reads a local copy instead of paying
        the full readback round trip per batch (large through remote-TPU
        tunnels)."""
        for leaf in self._jax.tree_util.tree_leaves(out):
            copy = getattr(leaf, "copy_to_host_async", None)
            if copy is not None:
                copy()
        return out

    def _host_form(self, out):
        if "best_i" in out:                # device-decoded winners
            return {k: np.asarray(out[k])
                    for k in ("best_i", "best_j", "best_p", "valid")}
        if out["meta"] is None:
            return np.asarray(out["experts"]), None
        return np.asarray(out["experts"]), np.asarray(out["meta"])

    def finalize(self, out):
        """Block on a ``score_async`` result and fetch it to the host."""
        return self.finalize_many([out])[0]

    def finalize_many(self, outs):
        """Finalize several ``score_async`` results with ONE bulk device
        fetch: through remote-TPU tunnels every readback pays a full round
        trip (~100 ms measured), so fetching k finished batches together
        pays it once, not k times (the callers drain the finished prefix of
        their in-flight queue in one call)."""
        if not outs:
            return []
        with self._account_lock:
            for out in outs:
                key = self._out_device.pop(id(out), None)
                if key is not None:
                    self._outstanding[key] -= 1
        fetched = self._jax.device_get(list(outs))
        return [self._host_form(out) for out in fetched]

    def __call__(self, batch: PaddedBatch):
        return self.finalize(self.score_async(batch))


def row_budget_frac(scorer) -> Optional[float]:
    """Packed-row batch budget fraction for this scorer, or None.

    Active only when the scorer consumes the coded wire AND runs the
    packed-row convolution (where tightly packed rows are the FLOP win);
    HELLO_TPU_ROW_BUDGET overrides the fraction (0 disables)."""
    if not (getattr(scorer, "packed_conv", False)
            and getattr(scorer, "accepts_wire", False)):
        return None
    env = os.environ.get("HELLO_TPU_ROW_BUDGET", "")
    if env:
        frac = float(env)
        return frac if frac > 0 else None
    return 0.5


def _record_from_genotype(site: "SiteWork", top_alleles, quality, ref_lookup,
                          info) -> Optional[VcfRecord]:
    """Shared alt/genotype assembly for all call streams
    (reference caller_calling.vcfRecords:699-742 / prepareVcf.callAlleles)."""
    ref_allele = "".join(ref_lookup(site.chromosome, p)
                         for p in range(site.start, site.stop))
    # sorted: set iteration order is hash-randomised per process, which
    # would make ALT column order (and GT indices) differ run to run
    alt_alleles = sorted(set(top_alleles).difference({ref_allele}))
    if len(alt_alleles) == 0:
        genotypes = [0, 0]
        alt_alleles = sorted(set(site.alleles).difference({ref_allele}))
        if len(alt_alleles) == 0:
            return None
    else:
        genotypes = [0 if a == ref_allele else alt_alleles.index(a) + 1
                     for a in top_alleles]
    return make_record(site.chromosome, site.start, ref_allele, alt_alleles,
                       genotypes, ref_lookup, qual=quality, info=info)


def record_from_pair_probs(site: "SiteWork", pair_probs, ref_lookup,
                           info="MixtureOfExpertPrediction") -> Optional[VcfRecord]:
    """VCF record from an allele-pair probability table
    (reference caller_calling.vcfRecords:657-754 / prepareVcf.callAlleles)."""
    from ..nn.genotype import best_genotype, phred_quality

    top_alleles, best_p = best_genotype(pair_probs)
    return _record_from_genotype(site, top_alleles, phred_quality(best_p),
                                 ref_lookup, info)


def vcf_record_from_call(call: dict, ref_lookup) -> Optional[VcfRecord]:
    """Build a VCF record from one decoded site call
    (reference caller_calling.vcfRecords:657-754 semantics)."""
    if call is None:
        return None
    return _record_from_genotype(call["site"], call["best_pair"],
                                 call["quality"], ref_lookup,
                                 "MixtureOfExpertPrediction")


def call_region(bam_paths: Sequence[str], ref: FastaFile, chromosome: str,
                start: int, stop: int, scorer: Scorer,
                pacbio: bool = False, include_hp: bool = False,
                hybrid_hotspot: bool = False,
                q_threshold: int = 10, min_mapq: int = 10,
                reassembly_size: int = 10,
                feature_length: int = FEATURE_LENGTH,
                max_alleles_per_batch: int = 2048,
                seed: int = 13,
                provide_experts: bool = False,
                stats: Optional[dict] = None) -> List[VcfRecord]:
    """Call variants in one region; returns normalised VCF records.

    ``stats`` (optional dict) accumulates ``sites``/``records`` counts for
    throughput accounting."""
    hybrid = len(bam_paths) > 1
    rng = random.Random(seed)

    # fast path: the whole host pipeline in one native call per region
    # (identical output to the staged path below; tests/test_native_chunk.py).
    # Real scorers take the coded wire straight from the native featurizer
    # (code-on-copy CodedSiteWork — no dense tensors materialise).
    from .candidates import native_chunk_site_work
    with telemetry.stage("host_sites_native"):
        sites = native_chunk_site_work(
            [str(p) for p in bam_paths], ref, chromosome, start, stop,
            dict(pacbio=pacbio, include_hp=include_hp,
                 hybrid_hotspot=hybrid_hotspot, q_threshold=q_threshold,
                 min_mapq=min_mapq, reassembly_size=reassembly_size,
                 feature_length=feature_length,
                 wire=("coded" if getattr(scorer, "accepts_wire", False)
                       else "dense")), rng)

    if sites is None:
        with telemetry.stage("hotspot_detection"):
            hotspot_sources = make_read_sources(bam_paths, pacbio, for_hotspots=True, rng=rng,
                                                region=(chromosome, start, stop))
            positions = detect_hotspots(
                hotspot_sources, ref, chromosome, start, stop, pacbio=pacbio,
                hybrid_hotspot=hybrid_hotspot, q_threshold=q_threshold, min_mapq=min_mapq)
        logger.info("%s:%d-%d: %d hotspot positions", chromosome, start, stop, len(positions))
        if not positions:
            return ([], []) if provide_experts else []

        with telemetry.stage("candidate_intervals"):
            active = cluster_hotspots(positions)
            sources = make_read_sources(bam_paths, pacbio, rng=rng,
                                        region=(chromosome, start, stop))
            intervals, windows = candidate_intervals(
                sources, ref, chromosome, active, pacbio=pacbio,
                hybrid_hotspot=hybrid_hotspot, q_threshold=q_threshold,
                min_mapq=min_mapq, include_hp=include_hp,
                reassembly_size=reassembly_size, provide_windows=True)
        logger.info("%s: %d candidate intervals", chromosome, len(intervals))

        with telemetry.stage("site_generation"):
            sites = [s for s in generate_sites(
                sources, ref, chromosome, intervals, windows=windows, pacbio=pacbio,
                include_hp=include_hp, hybrid_hotspot=hybrid_hotspot,
                feature_length=feature_length, q_threshold=q_threshold,
                min_mapq=min_mapq, reassembly_size=reassembly_size)
                if s is not None and s.alleles]
    logger.info("%s: %d scorable sites", chromosome, len(sites))
    if stats is not None:
        stats["sites"] = stats.get("sites", 0) + len(sites)

    ref_lookup = lambda chrom, pos: ref.fetch(chrom, pos, pos + 1)
    records: List[VcfRecord] = []
    expert_records = None
    if provide_experts:
        expert_records = {0: [], 1: [], 2: [], "best": [], "mean": [],
                          "choices": [], "features": []}
    hybrid_model = scorer.model.hybrid

    # Pipelined scoring: dispatch up to MAX_IN_FLIGHT batches ahead (jax
    # async dispatch), decode behind — host packing/decoding overlaps device
    # execution.  In-flight inputs stay alive in HBM, so the window is small;
    # Scorer.max_in_flight scales it so every local chip holds work.
    # Plain calling additionally moves fetch + decode onto a background
    # drainer thread (parallel_call._AsyncDrainer) so tunnel readback
    # latency/stalls overlap host work; the provide_experts path keeps the
    # inline drain (its record assembly is heavy and order-coupled enough
    # that the thread buys little).
    MAX_IN_FLIGHT = getattr(scorer, "max_in_flight", 3)
    from collections import deque
    pending: deque = deque()
    # duck-typed scorers (tests, oracles) may only implement __call__;
    # they score synchronously and finalize is the identity
    _score_async = getattr(scorer, "score_async", None)
    # plain calling decodes the genotype on device (winner indices +
    # probability fetched, 13 bytes/site); the provide_features path needs
    # the full logit tensors on host
    if _score_async is None:
        _dispatch = scorer
    elif expert_records is None and getattr(scorer, "device_decode", False):
        _dispatch = lambda b: _score_async(b, decode=True)
    else:
        _dispatch = _score_async
    _finalize = getattr(scorer, "finalize", lambda out: out)

    _finalize_many = getattr(scorer, "finalize_many", None)

    def _consume(drain_all=False):
        """Consume the oldest in-flight batch plus every other FINISHED one
        behind it (device execution is in-order) in one bulk fetch — each
        separate readback costs a full round trip through remote tunnels."""
        from .parallel_call import _out_ready
        take = [pending.popleft()]
        while pending and (drain_all or _out_ready(pending[0][2])):
            take.append(pending.popleft())
        with telemetry.stage("device_wait"):
            if _finalize_many is not None:
                fins = _finalize_many([e[2] for e in take])
            else:
                fins = [_finalize(e[2]) for e in take]
        for (group, batch, _out), fin in zip(take, fins):
            _decode_entry(group, batch, fin)

    def _decode_entry(group, batch, fin):
        with telemetry.stage("genotype_decode"):
            if isinstance(fin, dict) and "best_i" in fin:
                from ..nn.genotype import calls_from_device_decode
                calls = calls_from_device_decode(
                    fin, batch.allele_site_index, group)
            else:
                experts, meta = fin
                calls = decode_batch(experts, meta, batch.allele_site_index,
                                     group, full=expert_records is not None)
            for call in calls:
                rec = vcf_record_from_call(call, ref_lookup)
                if rec is not None:
                    records.append(rec)
                if expert_records is not None and call is not None:
                    # per-expert / best / mean VCF streams + choices + site
                    # feature records (reference prepareVcf.py:112-182 and
                    # caller_calling.py:744-754)
                    site_obj = call["site"]
                    meta_w = np.asarray(call["meta"], dtype=np.float64)
                    per_expert = call["expert_pair_probs"]
                    recs = [record_from_pair_probs(site_obj, pp, ref_lookup,
                                                   info=f"HELLO_expert{k}")
                            for k, pp in enumerate(per_expert)]
                    for k, r in enumerate(recs):
                        if r is not None:
                            expert_records[k].append(r)
                    choice = int(np.argmax(meta_w[:3]))
                    if recs[choice] is not None:
                        expert_records["best"].append(recs[choice])
                    # meta-weighted mean likelihoods (prepareVcf.py:155-168)
                    mean_probs = {
                        pair: float(sum(meta_w[i] * float(per_expert[i][pair])
                                        for i in range(len(per_expert))))
                        for pair in per_expert[0]}
                    mean_rec = record_from_pair_probs(site_obj, mean_probs,
                                                      ref_lookup,
                                                      info="HELLO_mean")
                    if mean_rec is not None:
                        expert_records["mean"].append(mean_rec)
                    expert_records["choices"].append(
                        (site_obj.chromosome, site_obj.start, site_obj.stop,
                         choice))
                    # persisted per-site features for failure analysis
                    # (the reference's .features pickles,
                    # caller_calling.py:744-754)
                    expert_records["features"].append({
                        "chromosome": site_obj.chromosome,
                        "position": site_obj.start,
                        "length": site_obj.stop - site_obj.start,
                        "alleles": list(site_obj.alleles),
                        "meta": np.asarray(call["meta"]),
                        "expertPredictions": tuple(per_expert),
                        "bestPair": call["best_pair"],
                        "quality": call["quality"],
                    })

    # by_read_bucket: batches are classed by read depth so one deep site
    # cannot inflate the padded read axis of every other site's batch;
    # outputs are re-sorted below, so cross-class scoring order is free
    drainer = None
    drainer_acc = {"backpressure_s": 0.0, "drain_s": 0.0,
                   "fetch_s": 0.0, "decode_s": 0.0}
    if expert_records is None:
        from .parallel_call import _AsyncDrainer
        drainer = _AsyncDrainer(scorer, _decode_entry, drainer_acc,
                                MAX_IN_FLIGHT)
    from .batching import CodedSiteWork
    # coded batches heading for the packed-row convolution are additionally
    # budgeted by real read ROWS so they land tightly in the packed-row
    # bucket ladder (batching.row_budgets_for_class rationale)
    row_frac = row_budget_frac(scorer)
    body_ok = False
    try:
        for group in group_sites_for_batching(sites, max_alleles_per_batch,
                                              by_read_bucket=True,
                                              row_budget_frac=row_frac):
            with telemetry.stage("batch_packing"):
                if isinstance(group[0], CodedSiteWork):
                    from .compact import pack_sites_wire
                    batch = pack_sites_wire(group, hybrid=hybrid_model,
                                            feature_length=feature_length)
                else:
                    batch = pack_sites(group, hybrid=hybrid_model,
                                       feature_length=feature_length,
                                       channels0=7 if include_hp else 6,
                                       channels1=7 if include_hp else 6)
            with telemetry.stage("device_scoring"):
                out = _dispatch(batch)
            if drainer is not None:
                drainer.put(group, batch, out)
                continue
            pending.append((group, batch, out))
            if len(pending) >= MAX_IN_FLIGHT:
                _consume()
        while pending:
            _consume(drain_all=True)
        body_ok = True
    finally:
        # join the drainer before reading `records`; a close() failure must
        # not mask an exception already propagating from the loop above
        if drainer is not None and body_ok:
            drainer.close()
        elif drainer is not None:
            try:
                drainer.close()
            except BaseException:
                logger.exception("drainer failed during abort")
        if drainer is not None:
            # fold the drainer thread's timing into the stage telemetry the
            # inline path records directly (decode is already counted by
            # _decode_entry's own stage)
            telemetry.add("device_wait", drainer_acc["fetch_s"])
            telemetry.add("dispatch_backpressure",
                          drainer_acc["backpressure_s"])

    records.sort(key=lambda r: r.key())
    if expert_records is not None:
        for k, lst in expert_records.items():
            if k == "features":
                lst.sort(key=lambda f: (f["chromosome"], f["position"]))
            elif k == "choices":
                lst.sort(key=lambda c: (c[0], c[1]))
            else:
                lst.sort(key=lambda r: r.key())
        return records, expert_records
    return records


def call_genome(bam_paths: Sequence[str], ref_path: str, scorer: Scorer,
                out_vcf: str, regions: Optional[Sequence[Tuple[str, int, int]]] = None,
                provide_experts: bool = False, **kwargs) -> str:
    """Call variants across regions (default: every chromosome) into a VCF.

    With ``provide_experts``, additionally writes per-expert and best-expert
    VCF streams next to ``out_vcf`` (reference prepareVcf.py:112-182)."""
    ref = FastaFile(ref_path)      # also persists the .fai when missing
    if regions is None:
        regions = [(c, 0, ref.length(c)) for c in ref.chromosomes()]
    records: List[VcfRecord] = []
    expert_streams = {0: [], 1: [], 2: [], "best": [], "mean": [],
                      "choices": [], "features": []}
    for chrom, start, stop in regions:
        result = call_region(bam_paths, ref, chrom, start, stop, scorer,
                             provide_experts=provide_experts, **kwargs)
        if provide_experts:
            recs, experts = result
            records.extend(recs)
            for k in expert_streams:
                expert_streams[k].extend(experts[k])
        else:
            records.extend(result)
    contigs = {c: ref.length(c) for c in ref.chromosomes()}
    write_vcf(out_vcf, records, contigs=contigs, sort=True)
    if provide_experts:
        base = out_vcf[:-4] if out_vcf.endswith(".vcf") else out_vcf
        for k in (0, 1, 2):
            write_vcf(f"{base}.expert{k}.vcf", expert_streams[k],
                      contigs=contigs, sort=True)
        for name in ("best", "mean"):
            write_vcf(f"{base}.{name}.vcf", expert_streams[name],
                      contigs=contigs, sort=True)
        # which expert the meta-softmax picked per site
        # (reference prepareVcf.py:170-176 choices.bed)
        with open(f"{base}.choices.bed", "w") as fh:
            for chrom, start, stop, choice in sorted(expert_streams["choices"]):
                fh.write(f"{chrom}\t{start}\t{stop}\t{choice}\n")
        # per-site feature records for failure analysis
        # (reference caller_calling.py:744-754 .features pickles)
        import pickle
        with open(f"{base}.features.pkl", "wb") as fh:
            pickle.dump(expert_streams["features"], fh)
    return out_vcf


def load_scorer(model_name: str, checkpoint: Optional[str] = None,
                seed: int = 0, compact: Optional[bool] = None) -> Scorer:
    """Build a Scorer from a named config, optionally loading a converted
    reference checkpoint (.wrapper.dnn) or a saved pytree checkpoint."""
    import jax

    model = create_model(model_name)
    if checkpoint is None:
        params, state = model.init(jax.random.PRNGKey(seed))
    elif checkpoint.endswith((".dnn", ".pt", ".pth")):
        from ..nn.convert import load_torch_checkpoint
        params, state = load_torch_checkpoint(checkpoint, model)
    else:
        from ..train.checkpoint import load_checkpoint
        params, state = load_checkpoint(checkpoint)
    return Scorer(model, params, state, compact=compact)


def main(argv=None):
    parser = argparse.ArgumentParser(description="hello_tpu variant caller")
    parser.add_argument("--bam", required=True,
                        help="comma-separated BAMs (illumina[,pacbio])")
    parser.add_argument("--ref", required=True, help="reference FASTA")
    parser.add_argument("--out", required=True, help="output VCF path")
    parser.add_argument("--model", default="illumina",
                        help="model config: illumina|pacbio|pacbio_hp|hybrid|hybrid_no_ensemble")
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint path (.dnn torch pickle or pytree dir)")
    parser.add_argument("--region", default=None,
                        help="chrom[,start,stop]; default: whole genome")
    parser.add_argument("--pacbio", action="store_true")
    parser.add_argument("--include_hp", action="store_true")
    parser.add_argument("--hybrid_hotspot", action="store_true")
    parser.add_argument("--q_threshold", type=int, default=10)
    parser.add_argument("--mapq_threshold", type=int, default=10)
    parser.add_argument("--reconcilement_size", type=int, default=10)
    parser.add_argument("--provide_features", action="store_true",
                        help="also write per-expert and best-expert VCFs")
    # "bf16" (bf16 MXU matmuls AND bf16 conv activations, ~1.3x over f32
    # activations) is the inference default.  Evidence (PRECISION_SWEEP.md,
    # 5200 variants x 4 platform configs on a v5e): zero site flips; ~0.1%
    # of genotypes flip at near-tie sites (every quality delta < 0.05 Q,
    # i.e. the competing genotypes are within ~1% probability even in
    # fp32).  "default" (bf16 matmuls, f32 activations) flips the same
    # class of sites — the flips originate in the bf16 matmuls it shares —
    # so it buys no flip-freedom; "highest" is full fp32 parity for
    # exact-match comparisons.
    parser.add_argument("--precision", default=os.environ.get(
        "HELLO_TPU_PRECISION", "bf16"),
                        help="matmul precision: bf16 (fastest; bf16 conv "
                             "activations) | default (bf16 matmuls, f32 "
                             "activations) | highest (fp32 parity)")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="host-side worker processes (0 = in-process)")
    parser.add_argument("--chunk_size", type=int, default=200_000)
    parser.add_argument("--spill_records", type=int, default=400_000,
                        help="worker-pool caller: spill sorted record runs "
                        "to disk beyond this many in-memory records and "
                        "stream-merge at the end (bounds RSS on "
                        "whole-genome runs)")
    parser.add_argument("--process_index", type=int, default=0,
                        help="this host's index for multi-host region sharding")
    parser.add_argument("--process_count", type=int, default=1,
                        help="total hosts sharing the work")
    parser.add_argument("--log", default=None)
    # device+host trace capture (the reference's kernprof/line_profiler hooks,
    # HotspotDetectorDVFiltered.py:24-28 etc.); open with TensorBoard/XProf
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of the run here")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, filename=args.log,
                        format="%(asctime)s %(levelname)s %(message)s")

    for bam in args.bam.split(","):
        if not os.path.exists(bam):
            parser.error(f"BAM not found: {bam}")
    if not os.path.exists(args.ref):
        parser.error(f"reference FASTA not found: {args.ref}")

    regions = None
    if args.region:
        parts = args.region.split(",")
        ref = FastaFile(args.ref)
        if parts[0] not in ref.index:
            parser.error(
                f"chromosome {parts[0]!r} not in reference "
                f"(available: {', '.join(ref.chromosomes()[:8])})")
        if len(parts) == 1:
            regions = [(parts[0], 0, ref.length(parts[0]))]
        else:
            regions = [(parts[0], int(parts[1]), int(parts[2]))]

    from ..nn import layers as nn_layers
    nn_layers.set_precision(args.precision)
    from ..parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)
    scorer = load_scorer(args.model, args.checkpoint)

    if args.process_count > 1:
        from ..parallel.mesh import shard_regions
        ref = FastaFile(args.ref)
        if regions is None:
            regions = [(c, 0, ref.length(c)) for c in ref.chromosomes()]
        # 4 Mb granules: hosts get near-equal base counts regardless of
        # chromosome size skew (see shard_regions)
        regions = shard_regions(regions, args.process_index,
                                args.process_count, granularity=4_000_000)
        logger.info("host %d/%d handles %d region pieces", args.process_index,
                    args.process_count, len(regions))

    if args.num_workers > 0:
        from .parallel_call import call_parallel
        call_parallel(
            args.bam.split(","), args.ref, scorer, args.out, regions=regions,
            num_workers=args.num_workers, chunk_size=args.chunk_size,
            pacbio=args.pacbio, include_hp=args.include_hp,
            hybrid_hotspot=args.hybrid_hotspot, q_threshold=args.q_threshold,
            min_mapq=args.mapq_threshold,
            reassembly_size=args.reconcilement_size,
            spill_records=args.spill_records)
    else:
        call_genome(
            args.bam.split(","), args.ref, scorer, args.out, regions=regions,
            pacbio=args.pacbio, include_hp=args.include_hp,
            hybrid_hotspot=args.hybrid_hotspot, q_threshold=args.q_threshold,
            min_mapq=args.mapq_threshold, reassembly_size=args.reconcilement_size,
            provide_experts=args.provide_features)
    telemetry.log_report()
    if args.profile_dir:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.profile_dir)
    logger.info("Completed running the script")


if __name__ == "__main__":
    main()
