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
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

static const char SEQ_CODES[] = "=ACMGRSVTWYHKDBN";

// byte -> two decoded bases (high nibble first), for bulk seq decode
struct SeqLut {
    char pair[256][2];
    SeqLut() {
        for (int b = 0; b < 256; b++) {
            pair[b][0] = SEQ_CODES[b >> 4];
            pair[b][1] = SEQ_CODES[b & 0xF];
        }
    }
};
static const SeqLut SEQ_LUT;

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

    // select fast path: with coordinate-sorted records, overlap queries
    // binary-search [start - max_span, stop) instead of scanning every read
    bool pos_sorted = true;
    int64_t max_span = 0;

    // dedup fast path: (read name, strand) equivalence classes are a
    // property of the record set, but select() runs once per WINDOW over
    // every overlapping record — hashing the name bytes there dominated the
    // host profile.  name_ids (built once, lazily, after the pool is
    // stable) turn per-window dedup into an O(1) epoch-stamp check.
    std::vector<int32_t> name_ids;   // per record: id of its name class
    int32_t n_names = 0;
};

// build (read name -> small id) once per opened region; the names pool is
// stable once parsing is done, so ids index it by view without copies
static void ensure_name_ids(BamData& d) {
    if (!d.name_ids.empty() || d.ref_ids.empty()) return;
    size_t n = d.ref_ids.size();
    d.name_ids.resize(n);
    std::unordered_map<std::string_view, int32_t> ids;
    ids.reserve(n);
    for (size_t i = 0; i < n; i++) {
        std::string_view nm(
            d.names.data() + d.name_offsets[i],
            (size_t)(d.name_offsets[i + 1] - d.name_offsets[i]) - 1);
        auto it = ids.emplace(nm, (int32_t)ids.size()).first;
        d.name_ids[i] = it->second;
    }
    d.n_names = (int32_t)ids.size();
}

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

// ---------------------------------------------------------------------------
// BAI index (linear 16 kb windows) + streaming BGZF cursor for O(region)
// region opens (mirror of hello_tpu/io/bam.py BaiIndex/BgzfStream)
// ---------------------------------------------------------------------------

bool load_bai_file(const std::string& path,
                   std::vector<std::vector<uint64_t>>& linear) {
    FILE* fh = std::fopen(path.c_str(), "rb");
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
    if (data.size() < 8 || std::memcmp(data.data(), "BAI\x01", 4) != 0)
        return false;
    int32_t n_ref;
    std::memcpy(&n_ref, data.data() + 4, 4);
    size_t pos = 8;
    linear.assign((size_t)n_ref, {});
    for (int32_t r = 0; r < n_ref; r++) {
        if (pos + 4 > data.size()) return false;
        int32_t n_bin;
        std::memcpy(&n_bin, data.data() + pos, 4);
        pos += 4;
        for (int32_t b = 0; b < n_bin; b++) {
            if (pos + 8 > data.size()) return false;
            int32_t n_chunk;
            std::memcpy(&n_chunk, data.data() + pos + 4, 4);
            pos += 8 + (size_t)n_chunk * 16;
        }
        if (pos + 4 > data.size()) return false;
        int32_t n_intv;
        std::memcpy(&n_intv, data.data() + pos, 4);
        pos += 4;
        if (pos + (size_t)n_intv * 8 > data.size()) return false;
        linear[r].resize((size_t)n_intv);
        std::memcpy(linear[r].data(), data.data() + pos, (size_t)n_intv * 8);
        pos += (size_t)n_intv * 8;
    }
    return true;
}

bool load_bai_linear(const std::string& bam_path,
                     std::vector<std::vector<uint64_t>>& linear) {
    if (load_bai_file(bam_path + ".bai", linear)) return true;
    std::string stem = bam_path;
    size_t dot = stem.rfind('.');
    if (dot != std::string::npos) stem = stem.substr(0, dot);
    return load_bai_file(stem + ".bai", linear);
}

struct BgzfCursor {
    FILE* fh = nullptr;
    uint64_t next_coffset = 0;
    std::vector<uint8_t> block;
    size_t off = 0;
    bool eof = false;

    ~BgzfCursor() { if (fh) std::fclose(fh); }

    bool open(const char* path, uint64_t voffset) {
        fh = std::fopen(path, "rb");
        if (!fh) return false;
        next_coffset = voffset >> 16;
        size_t skip = (size_t)(voffset & 0xFFFF);
        if (!advance()) return true;  // empty file: eof set
        off = std::min(skip, block.size());
        return true;
    }

    bool advance() {
        while (true) {
            uint64_t coffset = next_coffset;
            if (std::fseek(fh, (long)coffset, SEEK_SET) != 0) { eof = true; return false; }
            uint8_t header[18];
            if (std::fread(header, 1, 18, fh) != 18) { eof = true; return false; }
            uint16_t xlen;
            std::memcpy(&xlen, header + 10, 2);
            std::vector<uint8_t> extra(header + 12, header + 18);
            if (xlen > 6) {
                extra.resize(xlen);
                if (std::fread(extra.data() + 6, 1, (size_t)xlen - 6, fh)
                        != (size_t)xlen - 6) { eof = true; return false; }
            }
            size_t bsize = 0, eo = 0;
            while (eo + 4 <= xlen) {
                uint16_t slen;
                std::memcpy(&slen, extra.data() + eo + 2, 2);
                if (extra[eo] == 0x42 && extra[eo + 1] == 0x43 && slen == 2) {
                    uint16_t bs;
                    std::memcpy(&bs, extra.data() + eo + 4, 2);
                    bsize = (size_t)bs + 1;
                    break;
                }
                eo += 4 + slen;
            }
            if (bsize == 0) { eof = true; return false; }
            size_t rest_len = bsize - 12 - xlen;
            std::vector<uint8_t> rest(rest_len);
            if (std::fread(rest.data(), 1, rest_len, fh) != rest_len) {
                eof = true;
                return false;
            }
            uint32_t isize;
            std::memcpy(&isize, rest.data() + rest_len - 4, 4);
            next_coffset = coffset + bsize;
            off = 0;
            if (isize == 0) { block.clear(); continue; }  // EOF marker block
            block.resize(isize);
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            inflateInit2(&zs, -15);
            zs.next_in = rest.data();
            zs.avail_in = (uInt)(rest_len - 8);
            zs.next_out = block.data();
            zs.avail_out = isize;
            int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) { eof = true; return false; }
            return true;
        }
    }

    bool read(uint8_t* dst, size_t n) {
        while (n > 0) {
            if (off >= block.size()) {
                if (!advance()) return false;
            }
            size_t take = std::min(n, block.size() - off);
            std::memcpy(dst, block.data() + off, take);
            dst += take;
            off += take;
            n -= take;
        }
        return true;
    }
};

// real cigar from a CG:B,I aux tag (SAM long-cigar encoding for alignments
// with >65535 ops); returns false when absent
bool parse_cg_cigar(const uint8_t* aux, size_t n, std::vector<uint32_t>& out) {
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
                if (t0 == 'C' && t1 == 'G' && sub == 'I') {
                    out.resize(count);
                    std::memcpy(out.data(), aux + pos + 5, (size_t)count * 4);
                    return true;
                }
                pos += 5 + esz * count;
                continue;
            }
            default:
                return false;
        }
        pos += sz;
    }
    return false;
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

// decode one alignment record blob into the flat arrays; returns ref span
void append_record(BamData& d, const uint8_t* rec, size_t block_size) {
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

    static thread_local std::vector<uint32_t> cigars;  // per-record scratch
    cigars.resize(n_cigar);
    if (n_cigar)
        std::memcpy(cigars.data(), rec + off, (size_t)n_cigar * 4);
    off += 4 * (size_t)n_cigar;

    {   // bulk nibble decode: two bases per input byte via LUT
        size_t base = d.seqs.size();
        d.seqs.resize(base + (size_t)l_seq);
        char* dst = &d.seqs[base];
        int32_t pairs = l_seq / 2;
        for (int32_t i = 0; i < pairs; i++)
            std::memcpy(dst + 2 * i, SEQ_LUT.pair[rec[off + i]], 2);
        if (l_seq & 1)
            dst[l_seq - 1] = SEQ_LUT.pair[rec[off + pairs]][0];
    }
    off += (size_t)(l_seq + 1) / 2;
    {   // bulk qual copy; 0xFF ("missing") -> 30 patched after the copy
        size_t base = d.quals.size();
        d.quals.insert(d.quals.end(), rec + off, rec + off + l_seq);
        uint8_t* q = d.quals.data() + base;
        for (int32_t i = 0; i < l_seq; i++)
            if (q[i] == 0xFF) q[i] = 30;
    }
    off += (size_t)l_seq;
    d.seq_offsets.push_back((int64_t)d.seqs.size());

    // >65535-op alignments: kS/mN placeholder, real cigar in CG:B,I
    if (n_cigar == 2 && (cigars[0] & 0xF) == 4 &&
        (int32_t)(cigars[0] >> 4) == l_seq && (cigars[1] & 0xF) == 3) {
        std::vector<uint32_t> real;
        if (parse_cg_cigar(rec + off, block_size - off, real))
            cigars = std::move(real);
    }
    int64_t ref_span = 0;
    for (uint32_t v : cigars) {
        int op = v & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            ref_span += v >> 4;
        d.cigars.push_back(v);
    }
    d.cigar_offsets.push_back((int64_t)d.cigars.size());

    d.hps.push_back(parse_hp(rec + off, block_size - off));
    if (!d.ref_ids.empty()) {
        int32_t prid = d.ref_ids.back();
        if (rid < prid || (rid == prid && p < d.ref_starts.back()))
            d.pos_sorted = false;
    }
    d.max_span = std::max(d.max_span, ref_span);
    d.ref_ids.push_back(rid);
    d.ref_starts.push_back(p);
    d.ref_ends.push_back(p + ref_span);
    d.mapqs.push_back(mapq);
    d.flags.push_back(flag);
}

// peek (rid, pos, end) without appending
void record_span(const uint8_t* rec, int32_t* rid, int64_t* pos, int64_t* end) {
    int32_t r, p;
    std::memcpy(&r, rec, 4);
    std::memcpy(&p, rec + 4, 4);
    uint8_t l_read_name = rec[8];
    uint16_t n_cigar;
    std::memcpy(&n_cigar, rec + 12, 2);
    size_t off = 32 + (size_t)l_read_name;
    int64_t span = 0;
    for (uint16_t i = 0; i < n_cigar; i++) {
        uint32_t v;
        std::memcpy(&v, rec + off + 4 * i, 4);
        int op = v & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            span += v >> 4;
    }
    *rid = r;
    *pos = p;
    *end = p + span;
}

}  // namespace

struct htpu_bam {
    BamData d;
    // per-window dedup scratch (select() is called from one thread per
    // process): stamp[name_id * 2 + strand] == epoch marks "already seen
    // this window" without clearing between windows
    std::vector<uint32_t> dedup_stamp;
    uint32_t dedup_epoch = 0;
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
        append_record(d, rec, (size_t)block_size);
    }
    return b;
}

static htpu_bam* open_region_impl(const char* path, const char* bai_path,
                                  const char* chromosome,
                                  int64_t start, int64_t stop) {
    // O(region) open: BAI linear-index seek, decode only records overlapping
    // [start, stop) (mirror of hello_tpu/io/bam.py BamReader.fetch; replaces
    // the reference's htslib-backed pysam fetch,
    // PileupContainerLite.py:505-527).  Falls back to whole-file decode when
    // no index exists.  ``bai_path``: explicit index location (e.g. the
    // per-user cache used for BAMs in read-only directories); NULL = the
    // conventional locations next to the BAM.
    std::vector<std::vector<uint64_t>> linear;
    bool have = bai_path ? load_bai_file(bai_path, linear)
                         : load_bai_linear(path, linear);
    if (!have) {
        htpu_bam* whole = htpu_bam_open(path);
        return whole;
    }

    BgzfCursor cur;
    if (!cur.open(path, 0)) return nullptr;

    uint8_t magic[4];
    if (!cur.read(magic, 4) || std::memcmp(magic, "BAM\x01", 4) != 0)
        return nullptr;

    auto* b = new htpu_bam();
    BamData& d = b->d;

    int32_t l_text;
    if (!cur.read((uint8_t*)&l_text, 4)) { delete b; return nullptr; }
    std::vector<uint8_t> text((size_t)l_text);
    if (l_text > 0 && !cur.read(text.data(), (size_t)l_text)) { delete b; return nullptr; }
    int32_t n_ref;
    if (!cur.read((uint8_t*)&n_ref, 4)) { delete b; return nullptr; }
    int32_t target = -1;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t l_name;
        if (!cur.read((uint8_t*)&l_name, 4)) { delete b; return nullptr; }
        std::vector<uint8_t> name((size_t)l_name + 4);
        if (!cur.read(name.data(), (size_t)l_name + 4)) { delete b; return nullptr; }
        d.ref_names.emplace_back((const char*)name.data(), (size_t)l_name - 1);
        int32_t l_ref;
        std::memcpy(&l_ref, name.data() + l_name, 4);
        d.ref_lens.push_back(l_ref);
        if (d.ref_names.back() == chromosome) target = i;
    }
    if (target < 0 || (size_t)target >= linear.size()) return b;  // no reads

    // first non-empty linear-index window at or after start's window
    const std::vector<uint64_t>& lin = linear[(size_t)target];
    uint64_t voffset = 0;
    for (size_t w = (size_t)(start >> 14); w < lin.size(); w++) {
        if (lin[w]) { voffset = lin[w]; break; }
    }
    if (voffset == 0) return b;

    BgzfCursor rcur;
    if (!rcur.open(path, voffset)) return b;
    std::vector<uint8_t> rec;
    while (true) {
        int32_t block_size;
        if (!rcur.read((uint8_t*)&block_size, 4)) break;
        rec.resize((size_t)block_size);
        if (!rcur.read(rec.data(), (size_t)block_size)) break;
        int32_t rid;
        int64_t pos, end;
        record_span(rec.data(), &rid, &pos, &end);
        if (rid != target) {
            if (rid < 0 || rid > target) break;   // sorted: past the chromosome
            continue;
        }
        if (pos >= stop) break;                   // sorted: past the region
        if (end > start)
            append_record(d, rec.data(), (size_t)block_size);
    }
    return b;
}

htpu_bam* htpu_bam_open_region(const char* path, const char* chromosome,
                               int64_t start, int64_t stop) {
    return open_region_impl(path, nullptr, chromosome, start, stop);
}

htpu_bam* htpu_bam_open_region_bai(const char* path, const char* bai_path,
                                   const char* chromosome,
                                   int64_t start, int64_t stop) {
    return open_region_impl(path, bai_path, chromosome, start, stop);
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
    // dedup key = (read name, strand), exactly as hello_tpu/reads.py.
    // Name classes are precomputed once per region (ensure_name_ids); per
    // window, "seen" is one epoch-stamp compare — no hashing in this loop
    // (it runs once per window over every overlapping record and dominated
    // the host profile when it hashed name bytes per candidate).
    ensure_name_ids(b->d);
    if (b->dedup_stamp.size() != (size_t)d.n_names * 2)
        b->dedup_stamp.assign((size_t)d.n_names * 2, 0);
    if (++b->dedup_epoch == 0) {               // uint32 wrap: stale stamps
        std::fill(b->dedup_stamp.begin(), b->dedup_stamp.end(), 0u);
        ++b->dedup_epoch;
    }
    const uint32_t epoch = b->dedup_epoch;
    uint32_t* stamp = b->dedup_stamp.data();
    std::mt19937_64 rng(seed);
    int64_t encountered = 0;
    // coordinate-sorted records: binary-search the candidate index range
    // (ref_id, ref_start) in [(ref_id, start - max_span), (ref_id, stop))
    int64_t lo = 0, hi = (int64_t)d.ref_ids.size();
    if (d.pos_sorted) {
        auto key_less = [&](int64_t i, int32_t rid, int64_t pos) {
            return d.ref_ids[i] != rid ? d.ref_ids[i] < rid
                                       : d.ref_starts[i] < pos;
        };
        int64_t a = 0, b2 = hi;
        while (a < b2) {
            int64_t m = (a + b2) / 2;
            if (key_less(m, ref_id, start - d.max_span)) a = m + 1;
            else b2 = m;
        }
        lo = a;
        b2 = hi;
        while (a < b2) {
            int64_t m = (a + b2) / 2;
            if (key_less(m, ref_id, stop)) a = m + 1;
            else b2 = m;
        }
        hi = a;
    }
    for (int64_t i = lo; i < hi; i++) {
        if (d.ref_ids[i] != ref_id) continue;
        if (!(d.ref_starts[i] < stop && d.ref_ends[i] > start)) continue;
        uint16_t f = d.flags[i];
        if (f & (UNMAPPED | SECONDARY | SUP | DUP)) continue;
        if ((f & PAIRED) && !(f & PROPER)) continue;
        if (d.mapqs[i] <= 0) continue;
        uint32_t key = (uint32_t)d.name_ids[i] * 2 + ((f & REVERSE) ? 1 : 0);
        if (stamp[key] == epoch) continue;
        stamp[key] = epoch;
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
    // describe the selection as per-read views into the BamData pools; the
    // gather constructor copies each read's bytes once (the previous
    // marshal-then-construct path concatenated everything here AND copied
    // again inside the window)
    std::vector<htpu_read_src> srcs;
    const int32_t* cursor = idx;
    for (int32_t bi = 0; bi < n_bams; bi++) {
        const BamData& d = bams[bi]->d;
        for (int32_t k = 0; k < counts[bi]; k++) {
            int32_t i = cursor[k];
            int64_t s0 = d.seq_offsets[i];
            int64_t c0 = d.cigar_offsets[i];
            srcs.push_back(htpu_read_src{
                d.seqs.data() + s0, d.quals.data() + s0,
                d.seq_offsets[i + 1] - s0,
                d.cigars.data() + c0, d.cigar_offsets[i + 1] - c0,
                d.ref_starts[i], d.mapqs[i],
                (int8_t)((d.flags[i] & 0x10) ? -1 : 1),
                bam_pacbio[bi], d.hps[i]});
        }
        cursor += counts[bi];
    }
    return htpu_window_create_gather(
        reference, ref_len, window_start, region_start, region_stop,
        srcs.data(), (int32_t)srcs.size(), params);
}

}  // extern "C"
