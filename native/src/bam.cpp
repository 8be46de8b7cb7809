// BGZF/BAM loader: whole-file decode into flat arrays for zero-copy transfer
// to Python (numpy via ctypes) and direct consumption by the window engine.
//
// Native mirror of hello_tpu/io/bam.py (same record semantics; the reference
// pipeline used pysam/htslib for this role).

#include "hello_native.h"

#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

static const char SEQ_CODES[] = "=ACMGRSVTWYHKDBN";

struct BamData {
    std::vector<std::string> ref_names;
    std::vector<int64_t> ref_lens;

    std::string seqs;
    std::vector<int64_t> seq_offsets{0};
    std::vector<uint8_t> quals;
    std::vector<uint32_t> cigars;
    std::vector<int64_t> cigar_offsets{0};
    std::vector<int64_t> ref_starts;
    std::vector<int64_t> ref_ends;
    std::vector<int32_t> ref_ids;
    std::vector<int32_t> mapqs;
    std::vector<uint16_t> flags;
    std::vector<int8_t> hps;
    std::string names;
    std::vector<int64_t> name_offsets{0};
};

bool bgzf_decompress(const char* path, std::vector<uint8_t>& out) {
    FILE* fh = std::fopen(path, "rb");
    if (!fh) return false;
    std::fseek(fh, 0, SEEK_END);
    long fsize = std::ftell(fh);
    std::fseek(fh, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)fsize);
    if (std::fread(data.data(), 1, (size_t)fsize, fh) != (size_t)fsize) {
        std::fclose(fh);
        return false;
    }
    std::fclose(fh);

    size_t pos = 0;
    while (pos + 18 <= data.size()) {
        uint16_t xlen;
        std::memcpy(&xlen, data.data() + pos + 10, 2);
        size_t extra = pos + 12;
        size_t bsize = 0;
        size_t off = 0;
        while (off + 4 <= xlen) {
            uint8_t si1 = data[extra + off], si2 = data[extra + off + 1];
            uint16_t slen;
            std::memcpy(&slen, data.data() + extra + off + 2, 2);
            if (si1 == 0x42 && si2 == 0x43 && slen == 2) {
                uint16_t bs;
                std::memcpy(&bs, data.data() + extra + off + 4, 2);
                bsize = (size_t)bs + 1;
                break;
            }
            off += 4 + slen;
        }
        if (bsize == 0) return false;
        const uint8_t* cdata = data.data() + pos + 12 + xlen;
        size_t clen = bsize - 12 - xlen - 8;
        uint32_t isize;
        std::memcpy(&isize, data.data() + pos + bsize - 4, 4);
        if (isize > 0) {
            size_t prev = out.size();
            out.resize(prev + isize);
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            inflateInit2(&zs, -15);
            zs.next_in = const_cast<uint8_t*>(cdata);
            zs.avail_in = (uInt)clen;
            zs.next_out = out.data() + prev;
            zs.avail_out = isize;
            int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) return false;
        }
        pos += bsize;
    }
    return true;
}

int8_t parse_hp(const uint8_t* aux, size_t n) {
    size_t pos = 0;
    while (pos + 3 <= n) {
        char t0 = (char)aux[pos], t1 = (char)aux[pos + 1];
        char typ = (char)aux[pos + 2];
        pos += 3;
        size_t sz = 0;
        switch (typ) {
            case 'c': case 'C': case 'A': sz = 1; break;
            case 's': case 'S': sz = 2; break;
            case 'i': case 'I': case 'f': sz = 4; break;
            case 'Z': case 'H': {
                while (pos < n && aux[pos] != 0) pos++;
                pos++;
                continue;
            }
            case 'B': {
                char sub = (char)aux[pos];
                uint32_t count;
                std::memcpy(&count, aux + pos + 1, 4);
                size_t esz = (sub == 'c' || sub == 'C') ? 1
                             : (sub == 's' || sub == 'S') ? 2 : 4;
                pos += 5 + esz * count;
                continue;
            }
            default:
                return 0;
        }
        if (t0 == 'H' && t1 == 'P') {
            int32_t v = 0;
            switch (typ) {
                case 'c': v = *(const int8_t*)(aux + pos); break;
                case 'C': v = *(const uint8_t*)(aux + pos); break;
                case 's': { int16_t x; std::memcpy(&x, aux + pos, 2); v = x; break; }
                case 'S': { uint16_t x; std::memcpy(&x, aux + pos, 2); v = x; break; }
                case 'i': { int32_t x; std::memcpy(&x, aux + pos, 4); v = x; break; }
                case 'I': { uint32_t x; std::memcpy(&x, aux + pos, 4); v = (int32_t)x; break; }
                default: v = 0;
            }
            return (int8_t)v;
        }
        pos += sz;
    }
    return 0;
}

}  // namespace

struct htpu_bam {
    BamData d;
};

extern "C" {

htpu_bam* htpu_bam_open(const char* path) {
    std::vector<uint8_t> payload;
    if (!bgzf_decompress(path, payload)) return nullptr;
    if (payload.size() < 12 || std::memcmp(payload.data(), "BAM\x01", 4) != 0)
        return nullptr;

    auto* b = new htpu_bam();
    BamData& d = b->d;

    int32_t l_text;
    std::memcpy(&l_text, payload.data() + 4, 4);
    size_t pos = 8 + (size_t)l_text;
    int32_t n_ref;
    std::memcpy(&n_ref, payload.data() + pos, 4);
    pos += 4;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t l_name;
        std::memcpy(&l_name, payload.data() + pos, 4);
        d.ref_names.emplace_back((const char*)payload.data() + pos + 4,
                                 (size_t)l_name - 1);
        int32_t l_ref;
        std::memcpy(&l_ref, payload.data() + pos + 4 + l_name, 4);
        d.ref_lens.push_back(l_ref);
        pos += 8 + (size_t)l_name;
    }

    while (pos + 4 <= payload.size()) {
        int32_t block_size;
        std::memcpy(&block_size, payload.data() + pos, 4);
        const uint8_t* rec = payload.data() + pos + 4;
        pos += 4 + (size_t)block_size;

        int32_t rid, p;
        std::memcpy(&rid, rec, 4);
        std::memcpy(&p, rec + 4, 4);
        uint8_t l_read_name = rec[8];
        uint8_t mapq = rec[9];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, rec + 12, 2);
        std::memcpy(&flag, rec + 14, 2);
        int32_t l_seq;
        std::memcpy(&l_seq, rec + 16, 4);

        size_t off = 32;
        d.names.append((const char*)rec + off, l_read_name - 1);
        d.names.push_back('\0');
        d.name_offsets.push_back((int64_t)d.names.size());
        off += l_read_name;

        int64_t ref_span = 0;
        for (uint16_t i = 0; i < n_cigar; i++) {
            uint32_t v;
            std::memcpy(&v, rec + off + 4 * i, 4);
            d.cigars.push_back(v);
            int op = v & 0xF;
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                ref_span += v >> 4;
        }
        d.cigar_offsets.push_back((int64_t)d.cigars.size());
        off += 4 * (size_t)n_cigar;

        for (int32_t i = 0; i < l_seq; i++) {
            uint8_t byte = rec[off + i / 2];
            int code = (i % 2 == 0) ? (byte >> 4) : (byte & 0xF);
            d.seqs.push_back(SEQ_CODES[code]);
        }
        off += (size_t)(l_seq + 1) / 2;
        for (int32_t i = 0; i < l_seq; i++) {
            uint8_t q = rec[off + i];
            d.quals.push_back(q == 0xFF ? 30 : q);
        }
        off += (size_t)l_seq;
        d.seq_offsets.push_back((int64_t)d.seqs.size());

        d.hps.push_back(parse_hp(rec + off, (size_t)block_size - off));
        d.ref_ids.push_back(rid);
        d.ref_starts.push_back(p);
        d.ref_ends.push_back(p + ref_span);
        d.mapqs.push_back(mapq);
        d.flags.push_back(flag);
    }
    return b;
}

void htpu_bam_close(htpu_bam* b) { delete b; }

int32_t htpu_bam_num_refs(htpu_bam* b) { return (int32_t)b->d.ref_names.size(); }
const char* htpu_bam_ref_name(htpu_bam* b, int32_t i) {
    return b->d.ref_names[i].c_str();
}
int64_t htpu_bam_ref_len(htpu_bam* b, int32_t i) { return b->d.ref_lens[i]; }

int64_t htpu_bam_num_reads(htpu_bam* b) { return (int64_t)b->d.ref_ids.size(); }
const char* htpu_bam_seqs(htpu_bam* b) { return b->d.seqs.data(); }
const int64_t* htpu_bam_seq_offsets(htpu_bam* b) { return b->d.seq_offsets.data(); }
const uint8_t* htpu_bam_quals(htpu_bam* b) { return b->d.quals.data(); }
const uint32_t* htpu_bam_cigars(htpu_bam* b) { return b->d.cigars.data(); }
const int64_t* htpu_bam_cigar_offsets(htpu_bam* b) { return b->d.cigar_offsets.data(); }
const int64_t* htpu_bam_ref_starts(htpu_bam* b) { return b->d.ref_starts.data(); }
const int64_t* htpu_bam_ref_ends(htpu_bam* b) { return b->d.ref_ends.data(); }
const int32_t* htpu_bam_ref_ids(htpu_bam* b) { return b->d.ref_ids.data(); }
const int32_t* htpu_bam_mapqs(htpu_bam* b) { return b->d.mapqs.data(); }
const uint16_t* htpu_bam_flags(htpu_bam* b) { return b->d.flags.data(); }
const int8_t* htpu_bam_hps(htpu_bam* b) { return b->d.hps.data(); }
const char* htpu_bam_names(htpu_bam* b) { return b->d.names.data(); }
const int64_t* htpu_bam_name_offsets(htpu_bam* b) { return b->d.name_offsets.data(); }

}  // extern "C"
