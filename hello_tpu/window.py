"""Window engine: per-active-region candidate search over a batch of reads.

The host-side equivalent of the reference's AlleleSearcherLite (python wrapper
reference python/AlleleSearcherLite.py:27-338 + the C++ engine behind it):
counting, hotspot detection, assembly, support queries, and feature tensors
for one genomic window.  Prefers the C++ native engine when built; this module
is also the pure-Python semantic reference for it.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .assembly import AssemblyEngine
from .constants import FEATURE_LENGTH, MIN_MAPQ, Q_THRESHOLD
from .counts import CountsEngine
from .featurize import compute_features
from .reads import AlignedRead


class LocationOutOfBounds(Exception):
    pass


class Window:
    """Candidate-variant engine over one window of reads.

    reads: all reads of the window (hybrid mode: Illumina first, then PacBio,
    with their ``pacbio`` flags set). ``start``/``stop`` bound the region of
    interest; the internal window extends +/-10bp beyond the reads
    (reference AlleleSearcherLite.py:135-152).
    """

    def __init__(self, reads: Sequence[AlignedRead], start: int, stop: int,
                 ref_view, chromosome: str,
                 hybrid: bool = False,
                 pacbio: bool = False,
                 feature_length: int = FEATURE_LENGTH,
                 min_mapq: int = MIN_MAPQ, q_threshold: int = Q_THRESHOLD,
                 hybrid_hotspot: bool = False,
                 reassembly_size: int = 10,
                 include_hp: bool = False,
                 snv_threshold: float = None,
                 indel_threshold: float = None,
                 min_count: int = None):
        self.reads = list(reads)
        self.start = start
        self.stop = stop
        self.chromosome = chromosome
        self.hybrid = hybrid
        self.pacbio = pacbio and not hybrid
        self.feature_length = feature_length
        self.min_mapq = min_mapq
        self.q_threshold = q_threshold
        self.hybrid_hotspot = hybrid_hotspot
        self.reassembly_size = reassembly_size
        self.include_hp = include_hp
        self.assembly_start: Optional[int] = None
        self.assembly_stop: Optional[int] = None
        self._regions: Optional[List[Tuple[int, int]]] = None
        self._assembled = False

        ref_starts = [r.reference_start for r in self.reads]
        window_start = min(ref_starts + [start]) - 10
        if window_start < 0:
            raise LocationOutOfBounds(f"window start {window_start} < 0")
        if self.reads:
            window_end = max(r.reference_end for r in self.reads)
        else:
            window_end = stop
        chrom_len = len(ref_view)
        if window_end > chrom_len or window_end < 0:
            raise LocationOutOfBounds(f"window end {window_end} out of range")
        window_end += 10
        self.window_start = window_start
        self.reference = ref_view[window_start:window_end]

        extra = {}
        if snv_threshold is not None:
            extra["snv_threshold"] = snv_threshold
        if indel_threshold is not None:
            extra["indel_threshold"] = indel_threshold
        if min_count is not None:
            extra["min_count"] = min_count
        self.counts = CountsEngine(self.reference, window_start,
                                   min_mapq=min_mapq, q_threshold=q_threshold,
                                   **extra)
        self.counts.add_reads(self.reads)
        self._assembler = AssemblyEngine(
            self.reads, self.reference, window_start,
            min_mapq=min_mapq, q_threshold=q_threshold,
            max_reassembly_region_size=reassembly_size)

    # -- hotspot detection --------------------------------------------------

    def differing_regions(self, strict: bool = True) -> List[Tuple[int, int]]:
        """Candidate regions clipped to [start, stop]
        (reference AlleleSearcherLite.py:191-206)."""
        if self._regions is None:
            raw = self.counts.differing_regions(
                self.start, self.stop, strict=strict,
                hybrid_hotspot=self.hybrid_hotspot)
            self._regions = [
                (max(self.start, a), min(self.stop, b)) for a, b in raw]
        return self._regions

    @property
    def cluster(self):
        return self.differing_regions()

    # -- assembly -----------------------------------------------------------

    def assemble_region(self, reassemble: Optional[bool] = None):
        """Assemble alleles from reads across all differing regions.

        ``reassemble`` defaults to the reference policy: hybrid mode with
        average Illumina coverage > 14 (reference AlleleSearcherLite.py:258-268).
        """
        if reassemble is None:
            reassemble = self.hybrid and self._illumina_coverage() > 14
        self._assembler.assemble_alleles_from_reads(
            self.differing_regions(), reassemble)
        self._assembled = True

    def _illumina_coverage(self) -> float:
        if self.stop <= self.start:
            return 0.0
        span = self.stop - self.start
        covered = 0
        for r in self.reads:
            if r.pacbio or r.mapq < 10:
                continue
            covered += max(0, min(r.reference_end, self.stop) - max(r.reference_start, self.start))
        return covered / span

    def assemble(self, start: Optional[int] = None, stop: Optional[int] = None):
        """Select the assembly site for subsequent support/feature queries."""
        self.assembly_start = self.start if start is None else start
        self.assembly_stop = self.stop if stop is None else stop
        self._supports = self._assembler.supports_at(self.assembly_start, self.assembly_stop)

    @property
    def alleles_at_site(self) -> List[str]:
        return list(self._supports.keys())

    def determine_alleles_in_region(self, start: int, stop: int) -> List[str]:
        return self._assembler.alleles_at(start, stop)

    def num_reads_supporting_allele(self, allele: str, pacbio: bool) -> int:
        ids = self._supports.get(allele, [])
        return sum(1 for rid in ids if self.reads[rid].pacbio == pacbio)

    # -- featurization ------------------------------------------------------

    def compute_features(self, allele: str, index: int = 0) -> np.ndarray:
        """Feature tensor for one allele: index 0 = Illumina (or the single
        platform), 1 = PacBio in hybrid mode."""
        pacbio = (index == 1) if self.hybrid else self.pacbio
        ids = self._supports.get(allele, [])
        return compute_features(
            self.reads, ids, self.reference, self.window_start,
            self.assembly_start, self.assembly_stop, pacbio,
            self.feature_length, self.include_hp)
