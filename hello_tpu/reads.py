"""Read model and read-level filters.

``AlignedRead`` is the framework's in-memory representation of one aligned
read — the host-side analogue of a pysam AlignedSegment restricted to the
fields the pipeline uses.  ``is_usable_read`` reproduces the DeepVariant-style
filter of the reference (reference python/PileupContainer.py:19-51).
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence, Tuple

from .constants import (BAM_CDEL, BAM_CDIFF, BAM_CEQUAL, BAM_CMATCH,
                        BAM_CREF_SKIP)

# SAM flag bits
FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800


@dataclasses.dataclass
class AlignedRead:
    name: str
    flag: int
    chromosome: str
    reference_start: int                 # 0-based
    mapq: int
    cigartuples: List[Tuple[int, int]]   # [(op, length)]
    sequence: str
    qualities: List[int]
    hp: int = 0                          # haplotag (HP aux tag; 0 = untagged)
    pacbio: bool = False

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FLAG_REVERSE)

    @property
    def orientation(self) -> int:
        return -1 if self.is_reverse else 1

    @property
    def reference_end(self) -> int:
        """End of the alignment on the reference (0-based, exclusive)."""
        span = 0
        for op, length in self.cigartuples:
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF, BAM_CDEL, BAM_CREF_SKIP):
                span += length
        return self.reference_start + span

    @property
    def query_length(self) -> int:
        return len(self.sequence)


def is_usable_read(read: AlignedRead) -> bool:
    """DeepVariant-style usability filter (reference PileupContainer.py:19-51):
    drop unmapped / secondary / supplementary / duplicate reads, improperly
    paired reads, and zero mapping quality."""
    f = read.flag
    if f & FLAG_UNMAPPED:
        return False
    if f & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
        return False
    if f & FLAG_DUP:
        return False
    if (f & FLAG_PAIRED) and not (f & FLAG_PROPER_PAIR):
        return False
    if read.mapq <= 0:
        return False
    return True


class ReadWindow:
    """Reads overlapping one genomic window, deduplicated and subsampled.

    Mirrors PileupContainerLite (reference python/PileupContainerLite.py:471-581):
    fetch, usability filter, (name, strand) dedup, reservoir sampling to
    ``max_reads``.  The PacBio strict-clipping path of the reference trims long
    reads to +/- flank around the window purely as a host-memory optimisation;
    here reads are kept whole (window extraction happens at featurization).
    """

    def __init__(self, reads: Sequence[AlignedRead], chromosome: str,
                 start: int, span: int, max_reads: int = 10000,
                 rng: Optional[random.Random] = None):
        self.chromosome = chromosome
        self.position = start
        self.span = span
        rng = rng or random
        seen = set()
        kept: List[AlignedRead] = []
        encountered = 0
        for read in reads:
            if read.name is None:
                raise ValueError("read without a name — incompatible input")
            if not is_usable_read(read):
                continue
            key = (read.name, read.is_reverse)
            if key in seen:
                continue
            seen.add(key)
            p_keep = max_reads / (encountered + 1)
            if rng.uniform(0, 1) < p_keep:
                if len(kept) < max_reads:
                    kept.append(read)
                else:
                    kept[rng.sample(range(len(kept)), 1)[0]] = read
            encountered += 1
        self.reads = kept

    @property
    def reference_end(self) -> int:
        return max(r.reference_end for r in self.reads)

    @property
    def reference_start(self) -> int:
        return min(r.reference_start for r in self.reads)

    def __len__(self):
        return len(self.reads)
