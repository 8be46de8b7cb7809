// BGZF/BAM loader: whole-file decode into flat arrays for zero-copy transfer
// to Python (numpy via ctypes) and direct consumption by the window engine.
//
// Native mirror of hello_tpu/io/bam.py (same record semantics; the reference
// pipeline used pysam/htslib for this role).

#include "hello_native.h"

#include <zlib.h>

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <unordered_set>
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

int32_t htpu_bam_select(htpu_bam* b, int32_t ref_id, int64_t start,
                        int64_t stop, int32_t max_reads, uint64_t seed,
                        int32_t* out_idx, int32_t max_out) {
    const BamData& d = b->d;
    // SAM flag bits (mirror of hello_tpu/reads.py is_usable_read)
    const uint16_t UNMAPPED = 0x4, SECONDARY = 0x100, SUP = 0x800,
                   DUP = 0x400, PAIRED = 0x1, PROPER = 0x2, REVERSE = 0x10;
    std::vector<int32_t> kept;
    std::unordered_set<std::string> seen;
    std::mt19937_64 rng(seed);
    int64_t encountered = 0;
    for (int64_t i = 0; i < (int64_t)d.ref_ids.size(); i++) {
        if (d.ref_ids[i] != ref_id) continue;
        if (!(d.ref_starts[i] < stop && d.ref_ends[i] > start)) continue;
        uint16_t f = d.flags[i];
        if (f & (UNMAPPED | SECONDARY | SUP | DUP)) continue;
        if ((f & PAIRED) && !(f & PROPER)) continue;
        if (d.mapqs[i] <= 0) continue;
        std::string key(d.names.data() + d.name_offsets[i],
                        d.names.data() + d.name_offsets[i + 1] - 1);
        key.push_back((f & REVERSE) ? '-' : '+');
        if (!seen.insert(std::move(key)).second) continue;
        double p_keep = (double)max_reads / (double)(encountered + 1);
        double u = std::uniform_real_distribution<double>(0.0, 1.0)(rng);
        if (u < p_keep) {
            if ((int32_t)kept.size() < max_reads) {
                kept.push_back((int32_t)i);
            } else {
                size_t j = std::uniform_int_distribution<size_t>(
                    0, kept.size() - 1)(rng);
                kept[j] = (int32_t)i;
            }
        }
        encountered++;
    }
    int32_t n = (int32_t)kept.size();
    for (int32_t i = 0; i < n && i < max_out; i++) out_idx[i] = kept[i];
    return n;
}

int32_t htpu_bam_selection_bounds(htpu_bam* b, const int32_t* idx, int32_t n,
                                  int64_t* min_start, int64_t* max_end) {
    if (n <= 0) return 0;
    int64_t mn = b->d.ref_starts[idx[0]];
    int64_t mx = b->d.ref_ends[idx[0]];
    for (int32_t i = 1; i < n; i++) {
        mn = std::min(mn, b->d.ref_starts[idx[i]]);
        mx = std::max(mx, b->d.ref_ends[idx[i]]);
    }
    *min_start = mn;
    *max_end = mx;
    return 1;
}

htpu_window* htpu_window_create_from_bam(
        htpu_bam** bams, const uint8_t* bam_pacbio, int32_t n_bams,
        const int32_t* idx, const int32_t* counts,
        const char* reference, int64_t ref_len, int64_t window_start,
        int64_t region_start, int64_t region_stop,
        const htpu_params* params) {
    // marshal the selection into the flat-buffer constructor entirely in C++
    std::string seqs;
    std::vector<int64_t> seq_offsets{0};
    std::vector<uint8_t> quals;
    std::vector<uint32_t> cigars;
    std::vector<int64_t> cigar_offsets{0};
    std::vector<int64_t> ref_starts;
    std::vector<int32_t> mapqs;
    std::vector<int8_t> orientation;
    std::vector<uint8_t> pacbio;
    std::vector<int8_t> hps;

    int32_t total = 0;
    const int32_t* cursor = idx;
    for (int32_t bi = 0; bi < n_bams; bi++) {
        const BamData& d = bams[bi]->d;
        for (int32_t k = 0; k < counts[bi]; k++) {
            int32_t i = cursor[k];
            int64_t s0 = d.seq_offsets[i], s1 = d.seq_offsets[i + 1];
            seqs.append(d.seqs.data() + s0, (size_t)(s1 - s0));
            quals.insert(quals.end(), d.quals.begin() + s0, d.quals.begin() + s1);
            seq_offsets.push_back((int64_t)seqs.size());
            int64_t c0 = d.cigar_offsets[i], c1 = d.cigar_offsets[i + 1];
            cigars.insert(cigars.end(), d.cigars.begin() + c0, d.cigars.begin() + c1);
            cigar_offsets.push_back((int64_t)cigars.size());
            ref_starts.push_back(d.ref_starts[i]);
            mapqs.push_back(d.mapqs[i]);
            orientation.push_back((d.flags[i] & 0x10) ? -1 : 1);
            pacbio.push_back(bam_pacbio[bi]);
            hps.push_back(d.hps[i]);
            total++;
        }
        cursor += counts[bi];
    }
    return htpu_window_create(
        reference, ref_len, window_start, region_start, region_stop, total,
        seqs.data(), seq_offsets.data(), quals.data(),
        cigars.data(), cigar_offsets.data(), ref_starts.data(), mapqs.data(),
        orientation.data(), pacbio.data(), hps.data(), params);
}

}  // extern "C"
