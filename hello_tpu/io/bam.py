"""BAM reading and writing (self-contained BGZF + BAM record codec).

The reference pipeline reads alignments through pysam/htslib.  This framework
ships its own codec so the host layer has no external dependency; the C++
native engine mirrors it for production throughput.  Supports:

  * BGZF block (de)compression with the standard EOF marker;
  * BAM header and alignment record parsing (sequence, qualities, cigar,
    flags, mapq, aux tags — HP haplotag extracted);
  * linear-scan region fetch (sequential decode, filter by overlap) and
    whole-file iteration;
  * BAM writing for simulators and tests.

Coordinates are 0-based half-open throughout.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from ..reads import AlignedRead

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

_CIGAR_OPS = "MIDNSHP=X"
_SEQ_CODES = "=ACMGRSVTWYHKDBN"


# ---------------------------------------------------------------------------
# BGZF layer
# ---------------------------------------------------------------------------

def _bgzf_compress_block(data: bytes) -> bytes:
    compressor = zlib.compressobj(6, zlib.DEFLATED, -15)
    compressed = compressor.compress(data) + compressor.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF
    bsize = len(compressed) + 25 + 1  # header(18) + footer(8) minus 1 stored
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 0x08, 0x04,  # gzip magic, deflate, FEXTRA
        0, 0, 0xFF,              # mtime, xfl, os
        6,                       # xlen
        0x42, 0x43, 2,           # BC subfield
        bsize - 1 + 0,           # BSIZE - 1
    )
    footer = struct.pack("<II", crc, len(data))
    return header + compressed + footer


def bgzf_write(path: str, payload: bytes, block_size: int = 60000):
    with open(path, "wb") as fh:
        for i in range(0, len(payload), block_size):
            fh.write(_bgzf_compress_block(payload[i:i + block_size]))
        fh.write(BGZF_EOF)


def bgzf_read(path: str) -> bytes:
    """Decompress a whole BGZF file into one payload buffer."""
    out = []
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 18:
            break
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        # find BC subfield for BSIZE
        extra = data[pos + 12: pos + 12 + xlen]
        bsize = None
        off = 0
        while off + 4 <= len(extra):
            si1, si2, slen = extra[off], extra[off + 1], struct.unpack_from("<H", extra, off + 2)[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack_from("<H", extra, off + 4)[0] + 1
                break
            off += 4 + slen
        if bsize is None:
            raise ValueError("not a BGZF file (no BC subfield)")
        cdata = data[pos + 12 + xlen: pos + bsize - 8]
        isize = struct.unpack_from("<I", data, pos + bsize - 4)[0]
        if isize:
            out.append(zlib.decompress(cdata, -15))
        pos += bsize
    return b"".join(out)


# ---------------------------------------------------------------------------
# BAM records
# ---------------------------------------------------------------------------

def _encode_seq(seq: str) -> bytes:
    codes = {c: i for i, c in enumerate(_SEQ_CODES)}
    out = bytearray((len(seq) + 1) // 2)
    for i, base in enumerate(seq):
        code = codes.get(base.upper(), 15)
        if i % 2 == 0:
            out[i // 2] = code << 4
        else:
            out[i // 2] |= code
    return bytes(out)


def _decode_seq(data: bytes, length: int) -> str:
    out = []
    for i in range(length):
        byte = data[i // 2]
        code = (byte >> 4) if i % 2 == 0 else (byte & 0xF)
        out.append(_SEQ_CODES[code])
    return "".join(out)


def _parse_aux_hp(aux: bytes) -> int:
    """Extract the HP:i tag from an aux blob; 0 when absent."""
    pos = 0
    n = len(aux)
    sizes = {b"c": 1, b"C": 1, b"s": 2, b"S": 2, b"i": 4, b"I": 4, b"f": 4, b"A": 1}
    fmt = {b"c": "<b", b"C": "<B", b"s": "<h", b"S": "<H", b"i": "<i", b"I": "<I"}
    while pos + 3 <= n:
        tag = aux[pos:pos + 2]
        typ = aux[pos + 2:pos + 3]
        pos += 3
        if typ in sizes:
            if tag == b"HP" and typ in fmt:
                return struct.unpack_from(fmt[typ], aux, pos)[0]
            pos += sizes[typ]
        elif typ in (b"Z", b"H"):
            end = aux.index(b"\x00", pos)
            pos = end + 1
        elif typ == b"B":
            sub = aux[pos:pos + 1]
            count = struct.unpack_from("<I", aux, pos + 1)[0]
            pos += 5 + sizes[sub] * count
        else:
            break
    return 0


class BamReader:
    """Whole-file BAM decode with linear-region fetch."""

    def __init__(self, path: str, pacbio: bool = False):
        self.path = path
        self.pacbio = pacbio
        payload = bgzf_read(path)
        if payload[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack_from("<i", payload, 4)[0]
        pos = 8 + l_text
        n_ref = struct.unpack_from("<i", payload, pos)[0]
        pos += 4
        self.references: List[Tuple[str, int]] = []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", payload, pos)[0]
            name = payload[pos + 4: pos + 4 + l_name - 1].decode()
            l_ref = struct.unpack_from("<i", payload, pos + 4 + l_name)[0]
            self.references.append((name, l_ref))
            pos += 8 + l_name
        self._payload = payload
        self._records_start = pos

    def __iter__(self) -> Iterator[AlignedRead]:
        return self._iter_records()

    def _iter_records(self, ref_id: Optional[int] = None,
                      start: Optional[int] = None,
                      stop: Optional[int] = None) -> Iterator[AlignedRead]:
        payload = self._payload
        pos = self._records_start
        n = len(payload)
        while pos + 4 <= n:
            block_size = struct.unpack_from("<i", payload, pos)[0]
            rec = payload[pos + 4: pos + 4 + block_size]
            pos += 4 + block_size
            (r_id, p, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
             _next_rid, _next_pos, _tlen) = struct.unpack_from("<iiBBHHHiiii", rec, 0)
            if ref_id is not None and r_id != ref_id:
                continue
            off = 32
            name = rec[off:off + l_read_name - 1].decode()
            off += l_read_name
            cigars = []
            ref_span = 0
            for i in range(n_cigar):
                v = struct.unpack_from("<I", rec, off + 4 * i)[0]
                op, length = v & 0xF, v >> 4
                cigars.append((op, length))
                if op in (0, 2, 3, 7, 8):
                    ref_span += length
            off += 4 * n_cigar
            if start is not None and not (p < stop and start < p + ref_span):
                continue
            seq = _decode_seq(rec[off:off + (l_seq + 1) // 2], l_seq)
            off += (l_seq + 1) // 2
            quals = list(rec[off:off + l_seq])
            if quals and quals[0] == 0xFF:
                quals = [30] * l_seq
            off += l_seq
            hp = _parse_aux_hp(rec[off:])
            chrom = self.references[r_id][0] if 0 <= r_id < len(self.references) else "*"
            yield AlignedRead(
                name=name, flag=flag, chromosome=chrom, reference_start=p,
                mapq=mapq, cigartuples=cigars, sequence=seq, qualities=quals,
                hp=hp, pacbio=self.pacbio)

    def fetch(self, chromosome: str, start: int, stop: int) -> Iterator[AlignedRead]:
        ref_id = None
        for i, (name, _len) in enumerate(self.references):
            if name == chromosome:
                ref_id = i
                break
        if ref_id is None:
            return iter(())
        return self._iter_records(ref_id, start, stop)


def detect_chr_prefix(bam_references, fasta_chromosomes) -> str:
    """Detect the chromosome-name prefix difference between a BAM and a FASTA
    (e.g. BAM "chr20" vs FASTA "20") — reference python/find_chr_prefixes.py.

    Returns the prefix to prepend to FASTA names to obtain BAM names
    ("" when they already match); raises when no consistent prefix exists."""
    bam_names = {name for name, _l in bam_references}
    fasta_names = list(fasta_chromosomes)
    for prefix in ("", "chr", "Chr", "CHR"):
        if all((prefix + c) in bam_names for c in fasta_names):
            return prefix
    # try stripping instead: BAM "20" vs FASTA "chr20"
    stripped = {c[3:] if c.lower().startswith("chr") else c for c in fasta_names}
    if all(c in bam_names for c in stripped):
        return ""
    raise ValueError(
        f"no consistent chromosome prefix: bam={sorted(bam_names)[:5]} "
        f"fasta={fasta_names[:5]}")


def _reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def write_bam(path: str, references: Sequence[Tuple[str, int]],
              reads: Sequence[AlignedRead]):
    """Write reads (assumed coordinate-sorted by caller) to a BAM file."""
    ref_index = {name: i for i, (name, _l) in enumerate(references)}
    header_text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in references)
    out = bytearray()
    out += b"BAM\x01"
    out += struct.pack("<i", len(header_text))
    out += header_text.encode()
    out += struct.pack("<i", len(references))
    for name, length in references:
        out += struct.pack("<i", len(name) + 1)
        out += name.encode() + b"\x00"
        out += struct.pack("<i", length)
    op_index = {op: i for i, op in enumerate(_CIGAR_OPS)}
    for read in reads:
        rid = ref_index[read.chromosome]
        name_b = read.name.encode() + b"\x00"
        cigar_b = b"".join(
            struct.pack("<I", (length << 4) | op) for op, length in read.cigartuples)
        seq_b = _encode_seq(read.sequence)
        qual_b = bytes(min(q, 93) for q in read.qualities)
        aux_b = b""
        if read.hp:
            aux_b = b"HP" + b"i" + struct.pack("<i", read.hp)
        bin_ = _reg2bin(read.reference_start, read.reference_end)
        rec = struct.pack(
            "<iiBBHHHiiii", rid, read.reference_start, len(name_b), read.mapq,
            bin_, len(read.cigartuples), read.flag, len(read.sequence),
            -1, -1, 0)
        rec += name_b + cigar_b + seq_b + qual_b + aux_b
        out += struct.pack("<i", len(rec)) + rec
    bgzf_write(path, bytes(out))
