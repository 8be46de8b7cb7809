// Window engine: allele counting, hotspot detection, assembly, featurization.
//
// Native mirror of hello_tpu/{counts,assembly,featurize,window}.py (which in
// turn reproduce the semantics of the original HELLO native engine:
// reference c++/src/AlleleSearcherLiteFiltered.cpp, Read.cpp).  Validated
// against the Python engine by fuzz tests (tests/test_native.py).

#include "hello_native.h"

#include <algorithm>
#include <cassert>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// BAM cigar ops
enum { OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4, OP_H = 5, OP_P = 6,
       OP_EQ = 7, OP_X = 8 };

using AlleleKey = std::pair<std::string, std::string>;

// Sparse per-position alt/partial tables: only positions where some read
// disagrees with the reference own one (a few per hundred bases), so the
// dense per-position triple-map layout this replaces paid ~160 bytes of
// construction + destruction per position per platform for nothing.
struct AlleleCounts {
    // flat small-vector tables instead of std::map: a position holds 1-3
    // distinct alleles in practice, the tables' iteration order never
    // escapes (every consumer aggregates into sorted sets or does
    // commutative adds), and per-node heap alloc/free of map entries
    // dominated window construction/destruction in host profiles
    using Table = std::vector<std::pair<AlleleKey, int32_t>>;
    Table alt;
    Table left_partial;
    Table right_partial;

    static int32_t& at(Table& t, const AlleleKey& k) {
        for (auto& e : t)
            if (e.first == k) return e.second;
        t.emplace_back(k, 0);
        return t.back().second;
    }
    static const int32_t* find(const Table& t, const AlleleKey& k) {
        for (auto& e : t)
            if (e.first == k) return &e.second;
        return nullptr;
    }

    void resolve_partials() {
        for (int side = 0; side < 2; side++) {
            bool from_left = (side == 0);
            auto& partials = from_left ? left_partial : right_partial;
            // collect matches first (alt must not change while matching)
            std::vector<std::pair<int32_t, std::vector<AlleleKey>>> matches;
            std::vector<const AlleleKey*> match_keys;
            for (auto& kv : partials) {
                const std::string& alt_allele = kv.first.second;
                std::vector<AlleleKey> matched;
                for (auto& full : alt) {
                    const std::string& full_alt = full.first.second;
                    if (full_alt.size() < alt_allele.size()) continue;
                    std::string piece = from_left
                        ? full_alt.substr(full_alt.size() - alt_allele.size())
                        : full_alt.substr(0, alt_allele.size());
                    if (piece == alt_allele) matched.push_back(full.first);
                }
                matches.emplace_back(kv.second, std::move(matched));
                match_keys.push_back(&kv.first);
            }
            for (size_t mi = 0; mi < matches.size(); mi++) {
                auto& m = matches[mi];
                if (m.second.size() == 1) {
                    at(alt, m.second[0]) += m.first;
                } else if (m.second.empty()) {
                    at(alt, *match_keys[mi]) += m.first;
                }
            }
            partials.clear();
        }
    }
};

struct ReadView {
    const char* seq;
    const uint8_t* qual;
    int64_t seq_len;
    const uint32_t* cigars;
    int64_t n_cigars;
    int64_t ref_start;
    int32_t mapq;
    int8_t orientation;
    bool pacbio;
    int8_t hp;
};

struct AllelicRecord {
    std::string allele;
    int64_t start, stop;
    int32_t min_q;
};

struct SiteRec {
    std::vector<std::string> alleles;
    int64_t start, stop;
};

// Per-read aligned-pairs expansion (mirror of assembly.ReadAlignment).
//
// Aligned pairs live in dense read-relative vectors (index = pos - base_pos)
// instead of per-position hash maps: reference positions covered by a read
// are contiguous except across N skips, and per-node heap allocation/free of
// map entries dominated window construction AND destruction in profiles
// (short strings stay in SSO storage, so the whole structure is 3
// allocations per read).
struct ReadAlignment {
    int32_t read_id;
    const ReadView* rv;
    int64_t base_pos = 0;   // index origin: max(rv->ref_start - 1, clip_lo)
    // dense per-position entries (index = pos - base_pos): bytes live
    // concatenated in `buf`, each position holding (offset, length) into it.
    // One heap buffer per read instead of a std::string per position — the
    // per-position string headers dominated assemble-time profiles.  The
    // int arrays share one uninitialized allocation (present_vec gates every
    // read, so only it needs zero-fill).
    std::string buf;
    std::unique_ptr<int32_t[]> scratch;
    int32_t *ent_off = nullptr, *ent_len = nullptr, *qual_vec = nullptr;
    std::vector<uint8_t> present_vec;
    int64_t last_position = -1;
    bool partial_start = false, partial_stop = false;
    std::vector<AllelicRecord> alleles;
    AllelicRecord left_partial, right_partial;
    bool has_left = false, has_right = false;
    bool extracted = false;

    bool has_pair(int64_t pos) const {
        int64_t i = pos - base_pos;
        return i >= 0 && i < (int64_t)present_vec.size() && present_vec[i];
    }

    // Materialise aligned pairs only for positions in [clip_lo, clip_hi):
    // extraction queries touch a small assembly span, but reads (PacBio
    // especially) cover orders of magnitude more reference — full expansion
    // dominated assembly profiles.  Observable behavior inside the clip is
    // identical to full expansion (assemble_region sizes the clip one
    // position beyond every query it will make); last_position saturates at
    // clip_hi - 1, which preserves every comparison made against positions
    // inside the clip.
    void expand(int64_t clip_lo, int64_t clip_hi) {
        // re-expansion (a later assemble widening the clip) must not carry
        // stale walk state; extraction results (alleles, extracted) are
        // deliberately preserved — the engine's one-shot extraction contract
        // last_position (the read's final aligned M/D position) and the
        // partial_start/partial_stop flags are pure functions of the CIGAR,
        // independent of the clip: they gate extraction reachability and
        // reassembly membership for reads that may lie partly or entirely
        // OUTSIDE the clip (the engine attributes matched-haplotype alleles
        // even to reads covering no differing region, via reference-filled
        // haplotype strings), so they must match full expansion exactly —
        // including insertions after N skips and at read edges.
        last_position = -1;
        partial_start = partial_stop = false;
        {
            int64_t pos = rv->ref_start;
            bool anchor_written = false;   // would full expansion have a pair
                                           // at pos - 1 right now?
            for (int64_t ci = 0; ci < rv->n_cigars; ci++) {
                uint32_t c = rv->cigars[ci];
                int op = c & 0xF;
                int64_t len = c >> 4;
                if (len == 0) continue;    // zero-length ops change nothing
                if (op == OP_M || op == OP_EQ || op == OP_X || op == OP_D) {
                    last_position = pos + len - 1;
                    pos += len;
                    anchor_written = true;
                } else if (op == OP_N) {
                    pos += len;
                    anchor_written = false;
                } else if (op == OP_I) {
                    if (!anchor_written) {
                        partial_start = true;
                        anchor_written = true;   // the insertion set the pair
                    } else if (ci == rv->n_cigars - 1) {
                        partial_stop = true;
                    }
                }
            }
        }
        base_pos = std::max(rv->ref_start - 1, clip_lo);
        // cap the span at the read's own extent: short reads in a wide
        // assembly span must not allocate/zero the full clip width
        int64_t hi = std::min(clip_hi, last_position + 2);
        size_t span = (size_t)std::max<int64_t>(hi - base_pos, 0) + 2;
        buf.clear();
        buf.reserve(std::min<size_t>((size_t)rv->seq_len, span) + 8);
        scratch.reset(new int32_t[3 * span]);
        ent_off = scratch.get();
        ent_len = ent_off + span;
        qual_vec = ent_len + span;
        present_vec.assign(span, 0);

        auto set_pair = [&](int64_t pos, const char* s, size_t len,
                            int32_t q) {
            size_t i = (size_t)(pos - base_pos);
            ent_off[i] = (int32_t)buf.size();
            ent_len[i] = (int32_t)len;
            if (len) buf.append(s, len);
            qual_vec[i] = q;
            present_vec[i] = 1;
        };
        auto in_clip = [&](int64_t pos) {
            return pos >= clip_lo && pos < clip_hi;
        };

        int64_t ref_ptr = rv->ref_start;
        int64_t rd_ptr = 0;
        for (int64_t ci = 0; ci < rv->n_cigars; ci++) {
            if (ref_ptr > clip_hi) break;  // later ops cannot touch the clip
            uint32_t c = rv->cigars[ci];
            int op = c & 0xF;
            int64_t len = c >> 4;
            switch (op) {
                case OP_M: case OP_EQ: case OP_X: {
                    int64_t j0 = std::max<int64_t>(0, clip_lo - ref_ptr);
                    int64_t j1 = std::min<int64_t>(len, clip_hi - ref_ptr);
                    for (int64_t i = j0; i < j1; i++) {
                        set_pair(ref_ptr + i, rv->seq + rd_ptr + i, 1,
                                 rv->qual[rd_ptr + i]);
                    }
                    rd_ptr += len; ref_ptr += len;
                    break;
                }
                case OP_D: {
                    int64_t j0 = std::max<int64_t>(0, clip_lo - ref_ptr);
                    int64_t j1 = std::min<int64_t>(len, clip_hi - ref_ptr);
                    for (int64_t i = j0; i < j1; i++) {
                        set_pair(ref_ptr + i, nullptr, 0, 60);
                    }
                    ref_ptr += len;
                    break;
                }
                case OP_N:
                    ref_ptr += len;
                    break;
                case OP_I: {
                    int64_t anchor = ref_ptr - 1;
                    if (!in_clip(anchor)) {
                        rd_ptr += len;
                        break;
                    }
                    size_t ai = (size_t)(anchor - base_pos);
                    int32_t mq = 255;
                    for (int64_t i = 0; i < len; i++)
                        mq = std::min(mq, (int32_t)rv->qual[rd_ptr + i]);
                    if (!present_vec[ai]) {
                        // partial_start already derived by the CIGAR scan
                        set_pair(anchor, rv->seq + rd_ptr, (size_t)len, mq);
                    } else {
                        // append to the anchor's entry: it is at the buffer
                        // tail in CIGAR order except after an N skip —
                        // relocate to the tail first in that (rare) case
                        if (ent_off[ai] + ent_len[ai] != (int32_t)buf.size()) {
                            std::string tmp = buf.substr(
                                (size_t)ent_off[ai], (size_t)ent_len[ai]);
                            ent_off[ai] = (int32_t)buf.size();
                            buf += tmp;
                        }
                        buf.append(rv->seq + rd_ptr, (size_t)len);
                        ent_len[ai] += (int32_t)len;
                        qual_vec[ai] = std::min(qual_vec[ai], mq);
                        // partial_stop already derived by the CIGAR scan
                    }
                    rd_ptr += len;
                    break;
                }
                case OP_S:
                    rd_ptr += len;
                    break;
                default:
                    break; // H, P: no movement
            }
        }
    }

    // status: 0 success, 1 left partial, 2 right partial, 3 fail
    int get_aligned_bases(int64_t start, int64_t stop, std::string& bases,
                          int32_t& min_q) const {
        min_q = 10000;
        bases.clear();
        if (!(start <= last_position && rv->ref_start < stop) || last_position == -1)
            return 3;
        int status;
        bool has_start = has_pair(start);
        if (!has_start) status = 1;
        else if (!has_pair(start - 1)) status = partial_start ? 1 : 0;
        else if (!has_pair(stop - 1)) status = 2;
        else if (!has_pair(stop)) status = partial_stop ? 2 : 0;
        else status = 0;
        if (has_pair(start) && ent_len[(size_t)(start - base_pos)] == 0)
            status = 3;
        if (has_pair(stop - 1) && ent_len[(size_t)(stop - 1 - base_pos)] == 0)
            status = 3;
        for (int64_t i = start; i < stop; i++) {
            if (has_pair(i)) {
                size_t k = (size_t)(i - base_pos);
                bases.append(buf.data() + ent_off[k], (size_t)ent_len[k]);
                min_q = std::min(min_q, qual_vec[k]);
            }
        }
        return status;
    }

    void extract_alleles(const std::vector<std::pair<int64_t, int64_t>>& locs) {
        if (extracted) return;
        for (auto& loc : locs) {
            std::string bases;
            int32_t min_q;
            int status = get_aligned_bases(loc.first, loc.second, bases, min_q);
            AllelicRecord rec{bases, loc.first, loc.second, min_q};
            if (status == 0) alleles.push_back(std::move(rec));
            else if (status == 1) { left_partial = rec; has_left = true; }
            else if (status == 2) { right_partial = rec; has_right = true; }
        }
        extracted = true;
    }
};

struct Window {
    std::string reference;
    int64_t window_start;
    int64_t region_start, region_stop;
    htpu_params params;

    std::vector<ReadView> reads;
    // owned read payloads, contiguous (ReadViews point into these; filled
    // completely before views are built, so no reallocation invalidates them)
    std::string seqs_buf;
    std::vector<uint8_t> quals_buf;
    std::vector<uint32_t> cigars_buf;

    // per-platform counts: dense ref/total coverage + sparse alt tables
    struct PlatformCounts {
        std::vector<int32_t> total;                     // [ref len + 1]
        std::unordered_map<int64_t, AlleleCounts> sparse;  // window-rel idx
        bool any = false;                                // any read counted
    };
    PlatformCounts counts_i, counts_p;
    std::vector<std::unique_ptr<ReadAlignment>> alignments;
    std::map<std::pair<int64_t, int64_t>, std::set<std::string>> alleles_in_regions;
    std::map<std::pair<int64_t, int64_t>,
             std::map<std::string, std::set<int32_t>>> supports_in_region;

    char ref_at(int64_t pos) const { return reference[pos - window_start]; }
    std::string ref_sub(int64_t start, int64_t stop) const {
        return reference.substr(start - window_start, stop - start);
    }

    // ---- counting (mirror of counts.CountsEngine) ----

    void add_to_count(AlleleCounts& c, const std::string& ref_allele,
                      const std::string& read_allele, const uint8_t* qual,
                      int64_t rdcounter, int64_t rdlength, bool partial,
                      bool left, int inc) {
        if (ref_allele.find('N') != std::string::npos ||
            read_allele.find('N') != std::string::npos) return;
        if (rdcounter >= 0) {
            int32_t mq = 255;
            for (int64_t i = 0; i < rdlength; i++)
                mq = std::min(mq, (int32_t)qual[rdcounter + i]);
            if (mq < params.q_threshold) return;
        }
        auto& table = partial ? (left ? c.left_partial : c.right_partial) : c.alt;
        AlleleCounts::at(table, {ref_allele, read_allele}) += inc;
    }

    void count_reads() {
        // `total` is accumulated as a difference array (one +1/-1 per M run
        // instead of one increment per base) and prefix-summed once at the
        // end; match/mismatch detection compares 8 reference bytes at a time
        // (mismatches are ~1% of bases).
        for (auto& rv : reads) {
            if (rv.mapq < params.min_mapq) continue;
            auto& counts = rv.pacbio ? counts_p : counts_i;
            if (!counts.any) {
                counts.total.assign(reference.size() + 1, 0);
                counts.any = true;
            }
            int inc = rv.pacbio ? 1 : 2;
            int64_t rf = rv.ref_start - window_start;
            int64_t rd = 0;
            if (rf <= 0) continue;  // unanchorable at the window edge
            auto alt_at = [&](int64_t i) -> AlleleCounts& {
                return counts.sparse[i];
            };
            for (int64_t ci = 0; ci < rv.n_cigars; ci++) {
                uint32_t c = rv.cigars[ci];
                int op = c & 0xF;
                int64_t len = c >> 4;
                switch (op) {
                    case OP_M: case OP_EQ: case OP_X: {
                        counts.total[rf]++;
                        counts.total[rf + len]--;
                        const char* s = rv.seq + rd;
                        const char* r = reference.data() + rf;
                        int64_t j = 0;
                        while (j < len) {
                            while (j + 8 <= len) {
                                uint64_t a, b;
                                std::memcpy(&a, s + j, 8);
                                std::memcpy(&b, r + j, 8);
                                if (a != b) break;
                                j += 8;
                            }
                            int64_t lim = std::min(j + 8, len);
                            if (j >= len) break;
                            for (; j < lim; j++) {
                                if (s[j] != r[j])
                                    add_to_count(alt_at(rf + j),
                                                 std::string(1, r[j]),
                                                 std::string(1, s[j]),
                                                 rv.qual, rd + j, 1,
                                                 false, false, 1);
                            }
                        }
                        rd += len; rf += len;
                        break;
                    }
                    case OP_D: {
                        std::string ref_allele = reference.substr(rf - 1, len + 1);
                        std::string read_allele = rd > 0
                            ? std::string(1, rv.seq[rd - 1])
                            : std::string(1, reference[rf - 1]);
                        add_to_count(alt_at(rf - 1), ref_allele, read_allele,
                                     rv.qual, rd - 1, 1, false, false, inc);
                        rf += len;
                        break;
                    }
                    case OP_N:
                        rf += len;
                        break;
                    case OP_I: {
                        std::string ref_allele(1, reference[rf - 1]);
                        if (ci == 0) {
                            add_to_count(alt_at(rf - 1), ref_allele,
                                         std::string(rv.seq + rd, (size_t)len),
                                         rv.qual, rd, len, true, true, inc);
                            counts.total[rf - 1]++;
                            counts.total[rf]--;
                        } else if (ci == rv.n_cigars - 1 && rd > 0) {
                            add_to_count(alt_at(rf - 1), ref_allele,
                                         std::string(rv.seq + rd - 1, (size_t)len + 1),
                                         rv.qual, rd - 1, len + 1, true, false, inc);
                        } else if (rd > 0) {
                            add_to_count(alt_at(rf - 1), ref_allele,
                                         std::string(rv.seq + rd - 1, (size_t)len + 1),
                                         rv.qual, rd - 1, len + 1, false, false, inc);
                        } else {
                            add_to_count(alt_at(rf - 1), ref_allele,
                                         ref_allele + std::string(rv.seq + rd, (size_t)len),
                                         rv.qual, rd, len, false, false, inc);
                        }
                        rd += len;
                        break;
                    }
                    case OP_S:
                        rd += len;
                        break;
                    default:
                        break;
                }
            }
        }
        for (auto* pc : {&counts_i, &counts_p}) {
            if (!pc->any) continue;
            int32_t run = 0;
            for (size_t i = 0; i < pc->total.size(); i++) {
                run += pc->total[i];
                pc->total[i] = run;
            }
            for (auto& kv : pc->sparse) kv.second.resolve_partials();
        }
    }

    // ---- hotspot detection ----

    void differing_locations(const PlatformCounts& counts,
                             int min_snv, int min_indel,
                             std::set<int64_t>& out) const {
        for (auto& entry : counts.sparse) {
            int64_t idx = entry.first;
            int32_t total = counts.total[(size_t)idx];
            if (total == 0) continue;
            int64_t pos = idx + window_start;
            for (auto& kv : entry.second.alt) {
                const std::string& rb = kv.first.first;
                const std::string& ab = kv.first.second;
                double value = kv.second;
                if (rb.size() == 1 && ab.size() == 1) {
                    if (value / total >= params.snv_threshold &&
                        value >= min_snv)
                        out.insert(pos);
                } else {
                    if ((int64_t)std::max(rb.size(), ab.size()) >
                        params.max_allele_size) continue;
                    if (value / total >= params.indel_threshold &&
                        value >= min_indel)
                        for (int64_t i = pos;
                             i < pos + (int64_t)rb.size() + 1; i++)
                            out.insert(i);
                }
            }
        }
    }

    void differing_locations_hybrid(std::set<int64_t>& out) const {
        static const AlleleCounts kEmpty;
        // intentionally only Illumina allele keys (reference quirk)
        for (auto& entry : counts_i.sparse) {
            int64_t idx = entry.first;
            double total = counts_i.total[(size_t)idx] +
                (counts_p.any ? counts_p.total[(size_t)idx] : 0);
            if (total == 0) continue;
            int64_t pos = idx + window_start;
            const AlleleCounts* cp = &kEmpty;
            if (counts_p.any) {
                auto pit = counts_p.sparse.find(idx);
                if (pit != counts_p.sparse.end()) cp = &pit->second;
            }
            for (auto& kv : entry.second.alt) {
                const std::string& rb = kv.first.first;
                const std::string& ab = kv.first.second;
                double vi = kv.second;
                double vp = 0;
                if (const int32_t* pv = AlleleCounts::find(cp->alt, kv.first))
                    vp = *pv;
                if (rb.size() == 1 && ab.size() == 1) {
                    if ((vi + vp) / total >= params.snv_threshold &&
                        (vi + vp) >= params.min_count)
                        out.insert(pos);
                } else {
                    double alt_count = vi / 2 + vp;
                    if ((vi + vp) / total >= params.indel_threshold &&
                        alt_count >= params.min_count)
                        for (int64_t i = pos; i < pos + (int64_t)rb.size(); i++)
                            out.insert(i);
                }
            }
        }
    }

    std::vector<std::pair<int64_t, int64_t>> differing_regions(
            bool strict, bool hybrid_hotspot) const {
        std::set<int64_t> locations;
        if (hybrid_hotspot) {
            differing_locations_hybrid(locations);
        } else {
            differing_locations(counts_i, params.min_count,
                                2 * params.min_count, locations);
            differing_locations(counts_p, params.min_count,
                                params.min_count, locations);
        }
        std::vector<std::pair<int64_t, int64_t>> regions;
        std::vector<int64_t> cluster;
        auto push = [&]() {
            if (cluster.empty()) return;
            std::pair<int64_t, int64_t> region(cluster.front(),
                                               cluster.back() + 1);
            cluster.clear();
            if (strict && (region.first < region_start ||
                           region.second > region_stop)) return;
            regions.push_back(region);
        };
        for (int64_t loc : locations) {
            if (!cluster.empty() && cluster.back() != loc - 1) push();
            cluster.push_back(loc);
        }
        push();
        return regions;
    }

    // ---- assembly (mirror of assembly.AssemblyEngine) ----

    void prep_alignments(int64_t clip_lo, int64_t clip_hi) {
        // One-shot, like extraction: aligned pairs are consumed only by
        // extract_alleles, which runs for every read during the FIRST
        // assemble_region call and short-circuits afterwards (mirroring the
        // Python engine) — so the first call's clip is the only one whose
        // pairs are ever read.  last_position and the partial flags are
        // CIGAR-derived (clip-independent), so later calls see full-read
        // semantics for the gates they do consult.
        if (!alignments.empty()) return;
        for (size_t i = 0; i < reads.size(); i++) {
            auto ra = std::make_unique<ReadAlignment>();
            ra->read_id = (int32_t)i;
            ra->rv = &reads[i];
            ra->expand(clip_lo, clip_hi);
            alignments.push_back(std::move(ra));
        }
    }

    void collect_alleles(bool illumina_only,
                         std::map<std::pair<int64_t, int64_t>,
                                  std::set<std::string>>& out) const {
        for (auto& ra : alignments) {
            if (illumina_only && ra->rv->pacbio) continue;
            for (auto& rec : ra->alleles) {
                if (rec.min_q >= params.q_threshold &&
                    ra->rv->mapq >= params.min_mapq &&
                    rec.allele.find('N') == std::string::npos)
                    out[{rec.start, rec.stop}].insert(rec.allele);
            }
        }
    }

    void enumerate_haplotypes(
            std::vector<SiteRec>& sites, int64_t start, int64_t stop,
            std::unordered_map<std::string, std::vector<AllelicRecord>>& result,
            int level = 0) {
        if (sites.empty()) {
            result[""] = {AllelicRecord{"", -1, start, 60}};
            return;
        }
        SiteRec last = sites.back();
        sites.pop_back();
        enumerate_haplotypes(sites, start, stop, result, level + 1);
        std::unordered_map<std::string, std::vector<AllelicRecord>> partial;
        for (auto& allele : last.alleles) {
            AllelicRecord rec{allele, last.start, last.stop, 60};
            for (auto& kv : result) {
                int64_t previous = kv.second.empty() ? start
                                                     : kv.second.back().stop;
                std::string hap = kv.first + ref_sub(previous, rec.start)
                                  + rec.allele;
                if (level == 0) hap += ref_sub(rec.stop, stop);
                auto records = kv.second;
                records.push_back(rec);
                partial[hap] = std::move(records);
            }
        }
        result = std::move(partial);
    }

    std::string haplotype_string(const ReadAlignment& ra, int64_t start,
                                 int64_t stop) const {
        if (ra.alleles.empty()) return ref_sub(start, stop);
        std::string hap;
        const auto& first = ra.alleles.front();
        if (first.start > start) {
            hap += ref_sub(start, first.start);
            hap += first.allele;
        }
        for (size_t i = 1; i < ra.alleles.size(); i++) {
            hap += ref_sub(ra.alleles[i - 1].stop, ra.alleles[i].start);
            hap += ra.alleles[i].allele;
        }
        if (ra.alleles.back().stop < stop)
            hap += ref_sub(ra.alleles.back().stop, stop);
        return hap;
    }

    void assemble_region(const std::vector<std::pair<int64_t, int64_t>>& regions,
                         bool reassemble) {
        if (regions.empty()) return;
        int64_t start = regions.front().first - params.band_margin;
        int64_t stop = regions.back().second + params.band_margin;
        // every pair query this call makes lies within the regions' extent;
        // the clip keeps one position of slack on each side for the boundary
        // has_pair probes (get_aligned_bases consults qs-1 and qe).  Bounds
        // come from min/max so an unsorted region list cannot produce an
        // inverted clip (front/back still drive the reassembly band, whose
        // sortedness assumption predates the clip).
        int64_t lo = regions.front().first, hi = regions.front().second;
        for (auto& r : regions) {
            lo = std::min(lo, r.first);
            hi = std::max(hi, r.second);
        }
        prep_alignments(lo - params.band_margin - 1,
                        hi + params.band_margin + 1);

        for (auto& ra : alignments) ra->extract_alleles(regions);

        if (reassemble &&
            (int64_t)regions.size() < params.max_reassembly_region_size) {
            std::map<std::pair<int64_t, int64_t>, std::set<std::string>> i_alleles;
            collect_alleles(true, i_alleles);
            std::vector<SiteRec> sites;
            for (auto& kv : i_alleles) {
                SiteRec s;
                s.alleles.assign(kv.second.begin(), kv.second.end());
                s.start = kv.first.first;
                s.stop = kv.first.second;
                sites.push_back(std::move(s));
            }
            std::unordered_map<std::string, std::vector<AllelicRecord>> haps;
            enumerate_haplotypes(sites, start, stop, haps);
            for (auto& ra : alignments) {
                if (!ra->rv->pacbio) continue;
                if (start > ra->rv->ref_start) continue;
                if (ra->last_position < stop) continue;
                std::string hap = haplotype_string(*ra, start, stop);
                auto it = haps.find(hap);
                if (it != haps.end()) {
                    std::vector<AllelicRecord> recs;
                    for (auto& r : it->second)
                        if (r.start != -1) recs.push_back(r);
                    ra->alleles = std::move(recs);
                }
            }
        }

        alleles_in_regions.clear();
        collect_alleles(false, alleles_in_regions);

        supports_in_region.clear();
        for (auto& ra : alignments) {
            for (auto& rec : ra->alleles) {
                if (ra->rv->mapq >= params.min_mapq &&
                    rec.min_q >= params.q_threshold)
                    supports_in_region[{rec.start, rec.stop}][rec.allele]
                        .insert(ra->read_id);
            }
        }

        // partial-support resolution
        for (auto& ra : alignments) {
            const AllelicRecord* rec = nullptr;
            bool from_left = false;
            if (ra->has_left) { rec = &ra->left_partial; from_left = true; }
            else if (ra->has_right) { rec = &ra->right_partial; }
            else continue;
            auto key = std::make_pair(rec->start, rec->stop);
            auto sit = supports_in_region.find(key);
            if (sit == supports_in_region.end()) continue;
            std::vector<const std::string*> matches;
            for (auto& kv : sit->second) {
                const std::string& full = kv.first;
                if (full.size() < rec->allele.size()) continue;
                std::string piece = from_left
                    ? full.substr(full.size() - rec->allele.size())
                    : full.substr(0, rec->allele.size());
                if (piece == rec->allele) matches.push_back(&kv.first);
            }
            if (matches.size() == 1)
                sit->second[*matches[0]].insert(ra->read_id);
        }
    }

    // ---- featurization (mirror of featurize.render_read_row) ----

    static int base_color(char b) {
        switch (b) {
            case 'A': return 250;
            case 'G': return 180;
            case 'T': return 100;
            case 'C': return 30;
            default: return 0;
        }
    }
    static int qual_color(int q, int cap) {
        return (int)(254.0f * (float)std::min(q, cap) / cap);
    }
    // per-byte lookup twins of base_color / qual_color(q, 40): the featurizer
    // inner loop touches every cell of every read row (the hottest native
    // function in the chunk profile) — identical values by construction
    struct ColorLuts {
        uint8_t base[256];
        uint8_t q40[256];
        ColorLuts() {
            for (int i = 0; i < 256; i++) {
                base[i] = (uint8_t)base_color((char)i);
                q40[i] = (uint8_t)qual_color(i, 40);
            }
        }
    };
    static const ColorLuts& luts() {
        static const ColorLuts l;
        return l;
    }

    int32_t features(int64_t a_start, int64_t a_stop, const std::string& allele,
                     int32_t feature_length, bool pacbio, bool include_hp,
                     uint8_t* out, int32_t max_rows) {
        int channels = include_hp ? 7 : 6;
        auto sit = supports_in_region.find({a_start, a_stop});
        std::vector<int32_t> ids;
        if (sit != supports_in_region.end()) {
            auto ait = sit->second.find(allele);
            if (ait != sit->second.end())
                ids.assign(ait->second.begin(), ait->second.end());
        }
        std::sort(ids.begin(), ids.end());
        int64_t mid = (a_start + a_stop) / 2;
        int64_t fstart = mid - feature_length / 2;
        int64_t fend = fstart + feature_length;
        const ColorLuts& lut = luts();
        // precompute the window's reference-color and region-marker rows
        // (identical for every read row and, for the marker, every cell the
        // cigar walk can touch)
        static thread_local std::vector<uint8_t> ref_row, pos_row;
        ref_row.resize((size_t)feature_length);
        pos_row.resize((size_t)feature_length);
        int64_t rlen = (int64_t)reference.size();
        for (int64_t fi = 0; fi < feature_length; fi++) {
            int64_t off = fstart + fi - window_start;
            ref_row[fi] = (off >= 0 && off < rlen) ? lut.base[(uint8_t)reference[(size_t)off]]
                                                   : 0;
            int64_t p = fstart + fi;
            pos_row[fi] = (a_start <= p && p < a_stop) ? 240 : 70;
        }
        int32_t row = 0;
        size_t row_bytes = (size_t)feature_length * channels;
        for (int32_t rid : ids) {
            const ReadView& rv = reads[rid];
            if (rv.pacbio != pacbio) continue;
            if (row >= max_rows) break;
            uint8_t* arr = out + (size_t)row * row_bytes;
            std::memset(arr, 0, row_bytes);
            uint8_t mapq_color = (uint8_t)qual_color(rv.mapq, 60);
            uint8_t strand_color = rv.orientation > 0 ? 70 : 240;
            uint8_t hp_color = rv.hp == 1 ? 120 : (rv.hp == 2 ? 240 : 0);
            int64_t rf = rv.ref_start, rd = 0;
            for (int64_t ci = 0; ci < rv.n_cigars; ci++) {
                // all later ops fall past the window (D/I anchor at rf - 1,
                // so rf == fend can still write the last column)
                if (rf > fend) break;
                uint32_t c = rv.cigars[ci];
                int op = c & 0xF;
                int64_t len = c >> 4;
                switch (op) {
                    case OP_M: case OP_EQ: case OP_X: {
                        // clamp to the feature window (long reads span far
                        // beyond the 150 bp view)
                        int64_t j0 = std::max<int64_t>(0, fstart - rf);
                        int64_t j1 = std::min<int64_t>(len, fend - rf);
                        int64_t fi = rf + j0 - fstart;
                        uint8_t* px = arr + (size_t)fi * channels;
                        const char* sp = rv.seq + rd + j0;
                        const uint8_t* qp = rv.qual + rd + j0;
                        for (int64_t j = j0; j < j1;
                             j++, fi++, px += channels) {
                            px[0] = lut.base[(uint8_t)sp[j - j0]];
                            px[1] = ref_row[fi];
                            px[2] = lut.q40[qp[j - j0]];
                            px[3] = mapq_color;
                            px[4] = strand_color;
                            px[5] = pos_row[fi];
                            if (include_hp) px[6] = hp_color;
                        }
                        rf += len; rd += len;
                        break;
                    }
                    case OP_D:
                        if (fstart <= rf - 1 && rf - 1 < fend &&
                            rf - 1 >= window_start) {
                            for (int64_t p = rf - 1; p < rf + len; p++) {
                                if (!(fstart <= p && p < fend)) continue;
                                int64_t fi = p - fstart;
                                uint8_t* px = arr + (size_t)fi * channels;
                                px[1] = ref_row[fi];
                                px[3] = mapq_color;
                                px[4] = strand_color;
                                px[5] = pos_row[fi];
                                if (include_hp) px[6] = hp_color;
                            }
                            int64_t fi = rf - 1 - fstart;
                            uint8_t* px = arr + (size_t)fi * channels;
                            px[0] = 0;  // gap color
                            px[2] = rd > 0 ? lut.q40[rv.qual[rd - 1]] : 0;
                        }
                        rf += len;
                        break;
                    case OP_N:
                        rf += len;
                        break;
                    case OP_I:
                        if (fstart <= rf - 1 && rf - 1 < fend &&
                            rf - 1 >= window_start) {
                            int64_t lo = rd > 0 ? rd - 1 : rd;
                            int mq = 255;
                            for (int64_t i = lo; i < rd + len; i++)
                                mq = std::min(mq, (int32_t)rv.qual[i]);
                            int64_t fi = rf - 1 - fstart;
                            uint8_t* px = arr + (size_t)fi * channels;
                            px[0] = 0;  // gap color
                            px[1] = ref_row[fi];
                            px[2] = (uint8_t)qual_color(mq, 40);
                            px[3] = mapq_color;
                            px[4] = strand_color;
                            px[5] = pos_row[fi];
                            if (include_hp) px[6] = hp_color;
                        }
                        rd += len;
                        break;
                    case OP_S:
                        rd += len;
                        break;
                    default:
                        break;
                }
            }
            row++;
        }
        if (row == 0 && max_rows >= 1) {
            std::memset(out, 0, row_bytes);
            row = 1;
        }
        return row;
    }
};

}  // namespace

struct htpu_window {
    Window w;
};

extern "C" {

void htpu_default_params(htpu_params* out) {
    out->snv_threshold = 0.12;
    out->indel_threshold = 0.12;
    out->min_count = 2;
    out->min_mapq = 10;
    out->q_threshold = 10;
    out->max_allele_size = 100;
    out->band_margin = 6;
    out->max_reassembly_region_size = 10;
}

// shared core: copy each read's bytes ONCE from wherever they live into the
// window's bulk buffers, then build views + counts
static htpu_window* window_create_impl(
        const char* reference, int64_t ref_len, int64_t window_start,
        int64_t region_start, int64_t region_stop,
        const htpu_read_src* srcs, int32_t num_reads,
        const htpu_params* params) {
    auto* h = new htpu_window();
    Window& w = h->w;
    w.reference.assign(reference, (size_t)ref_len);
    w.window_start = window_start;
    w.region_start = region_start;
    w.region_stop = region_stop;
    if (params) w.params = *params;
    else htpu_default_params(&w.params);

    int64_t seq_total = 0, cig_total = 0;
    for (int32_t i = 0; i < num_reads; i++) {
        seq_total += srcs[i].seq_len;
        cig_total += srcs[i].n_cigars;
    }
    w.seqs_buf.resize((size_t)seq_total);
    w.quals_buf.resize((size_t)seq_total);
    w.cigars_buf.resize((size_t)cig_total);
    w.reads.reserve(num_reads);
    int64_t so = 0, co = 0;
    for (int32_t i = 0; i < num_reads; i++) {
        const htpu_read_src& s = srcs[i];
        // .data() + offset, not &buf[offset]: a trailing zero-length read
        // (l_seq=0 records pass every select filter) makes `so` one past
        // the end, where operator[] is UB
        if (s.seq_len) {
            std::memcpy(w.seqs_buf.data() + so, s.seq, (size_t)s.seq_len);
            std::memcpy(w.quals_buf.data() + so, s.qual, (size_t)s.seq_len);
        }
        if (s.n_cigars)
            std::memcpy(w.cigars_buf.data() + co, s.cigars,
                        (size_t)s.n_cigars * sizeof(uint32_t));
        ReadView rv;
        rv.seq = w.seqs_buf.data() + so;
        rv.qual = w.quals_buf.data() + so;
        rv.seq_len = s.seq_len;
        rv.cigars = w.cigars_buf.data() + co;
        rv.n_cigars = s.n_cigars;
        rv.ref_start = s.ref_start;
        rv.mapq = s.mapq;
        rv.orientation = s.orientation;
        rv.pacbio = s.pacbio != 0;
        rv.hp = s.hp;
        w.reads.push_back(rv);
        so += s.seq_len;
        co += s.n_cigars;
    }
    w.count_reads();
    return h;
}

htpu_window* htpu_window_create_gather(
        const char* reference, int64_t ref_len, int64_t window_start,
        int64_t region_start, int64_t region_stop,
        const htpu_read_src* srcs, int32_t num_reads,
        const htpu_params* params) {
    return window_create_impl(reference, ref_len, window_start,
                              region_start, region_stop, srcs, num_reads,
                              params);
}

htpu_window* htpu_window_create(
        const char* reference, int64_t ref_len, int64_t window_start,
        int64_t region_start, int64_t region_stop,
        int32_t num_reads,
        const char* seqs, const int64_t* seq_offsets,
        const uint8_t* quals,
        const uint32_t* cigars, const int64_t* cigar_offsets,
        const int64_t* ref_starts,
        const int32_t* mapq,
        const int8_t* orientation,
        const uint8_t* pacbio,
        const int8_t* hp,
        const htpu_params* params) {
    // concatenated-buffer form (the ctypes binding's layout): adapt to the
    // gather core with per-read views into the caller's buffers
    std::vector<htpu_read_src> srcs((size_t)num_reads);
    for (int32_t i = 0; i < num_reads; i++) {
        int64_t s0 = seq_offsets[i], s1 = seq_offsets[i + 1];
        int64_t c0 = cigar_offsets[i], c1 = cigar_offsets[i + 1];
        srcs[i] = htpu_read_src{seqs + s0, quals + s0, s1 - s0,
                                cigars + c0, c1 - c0, ref_starts[i],
                                mapq[i], orientation[i], pacbio[i], hp[i]};
    }
    return window_create_impl(reference, ref_len, window_start,
                              region_start, region_stop,
                              srcs.data(), num_reads, params);
}

void htpu_window_destroy(htpu_window* w) { delete w; }

int32_t htpu_differing_regions(htpu_window* h, int strict, int hybrid_hotspot,
                               int64_t* out_pairs, int32_t max_out) {
    auto regions = h->w.differing_regions(strict != 0, hybrid_hotspot != 0);
    int32_t n = (int32_t)regions.size();
    for (int32_t i = 0; i < n && i < max_out; i++) {
        out_pairs[2 * i] = regions[i].first;
        out_pairs[2 * i + 1] = regions[i].second;
    }
    return n;
}

void htpu_assemble_region(htpu_window* h, const int64_t* region_pairs,
                          int32_t num_regions, int reassemble) {
    std::vector<std::pair<int64_t, int64_t>> regions;
    for (int32_t i = 0; i < num_regions; i++)
        regions.emplace_back(region_pairs[2 * i], region_pairs[2 * i + 1]);
    h->w.assemble_region(regions, reassemble != 0);
}

int32_t htpu_alleles_at(htpu_window* h, int64_t start, int64_t stop,
                        char* buf, int64_t buf_len) {
    auto it = h->w.alleles_in_regions.find({start, stop});
    if (it == h->w.alleles_in_regions.end()) return 0;
    int64_t used = 0;
    int32_t n = 0;
    for (auto& a : it->second) {
        if (used + (int64_t)a.size() + 1 > buf_len) return -(int32_t)it->second.size();
        std::memcpy(buf + used, a.c_str(), a.size() + 1);
        used += a.size() + 1;
        n++;
    }
    return n;
}

int32_t htpu_supports_at(htpu_window* h, int64_t start, int64_t stop,
                         char* buf, int64_t buf_len,
                         int32_t* counts, int32_t max_alleles,
                         int32_t* read_ids, int64_t max_ids) {
    auto it = h->w.supports_in_region.find({start, stop});
    if (it == h->w.supports_in_region.end()) return 0;
    int64_t used = 0, id_used = 0;
    int32_t n = 0;
    for (auto& kv : it->second) {
        if (n >= max_alleles) break;
        if (used + (int64_t)kv.first.size() + 1 > buf_len) break;
        if (id_used + (int64_t)kv.second.size() > max_ids) break;
        std::memcpy(buf + used, kv.first.c_str(), kv.first.size() + 1);
        used += kv.first.size() + 1;
        std::vector<int32_t> ids(kv.second.begin(), kv.second.end());
        std::sort(ids.begin(), ids.end());
        for (int32_t id : ids) read_ids[id_used++] = id;
        counts[n] = (int32_t)ids.size();
        n++;
    }
    return n;
}

int32_t htpu_num_supports(htpu_window* h, int64_t start, int64_t stop,
                          const char* allele, int pacbio) {
    auto it = h->w.supports_in_region.find({start, stop});
    if (it == h->w.supports_in_region.end()) return 0;
    auto ait = it->second.find(allele);
    if (ait == it->second.end()) return 0;
    int32_t n = 0;
    for (int32_t id : ait->second)
        if (h->w.reads[id].pacbio == (pacbio != 0)) n++;
    return n;
}

int32_t htpu_features(htpu_window* h, int64_t start, int64_t stop,
                      const char* allele, int32_t feature_length,
                      int pacbio, int include_hp,
                      uint8_t* out, int32_t max_rows) {
    return h->w.features(start, stop, allele, feature_length, pacbio != 0,
                         include_hp != 0, out, max_rows);
}

int32_t htpu_site_query(htpu_window* h, int64_t start, int64_t stop,
                        int32_t feature_length, int include_hp, int hybrid,
                        int primary_pacbio, int32_t max_allele_len,
                        char* alleles_buf, int64_t alleles_buf_len,
                        int32_t* rows0, int32_t* rows1, int32_t max_alleles,
                        uint8_t* feat, int64_t feat_len, int64_t* feat_used) {
    Window& w = h->w;
    int channels = include_hp ? 7 : 6;
    int64_t row_bytes = (int64_t)feature_length * channels;
    bool primary = primary_pacbio != 0;

    auto it = w.supports_in_region.find({start, stop});
    int32_t n = 0;
    int64_t name_used = 0, used = 0;
    if (it != w.supports_in_region.end()) {
        for (auto& kv : it->second) {
            const std::string& allele = kv.first;
            if ((int64_t)allele.size() > max_allele_len) continue;
            int32_t c0 = 0, c1 = 0;
            for (int32_t id : kv.second) {
                if (w.reads[id].pacbio == primary) c0++;
                else if (hybrid && w.reads[id].pacbio) c1++;
            }
            int32_t total = c0 + (hybrid ? c1 : 0);
            if (total == 0) continue;
            if (n >= max_alleles) return -1;
            if (name_used + (int64_t)allele.size() + 1 > alleles_buf_len)
                return -1;
            // worst case rows: supports of each platform, or 1 zero row
            int64_t need = (std::max(c0, 1) + (hybrid ? std::max(c1, 1) : 0))
                           * row_bytes;
            if (used + need > feat_len) return -1;
            std::memcpy(alleles_buf + name_used, allele.c_str(),
                        allele.size() + 1);
            name_used += allele.size() + 1;
            int32_t r0 = w.features(start, stop, allele, feature_length,
                                    primary, include_hp != 0, feat + used,
                                    std::max(c0, 1));
            rows0[n] = r0;
            used += (int64_t)r0 * row_bytes;
            if (hybrid) {
                int32_t r1 = w.features(start, stop, allele, feature_length,
                                        true, include_hp != 0, feat + used,
                                        std::max(c1, 1));
                rows1[n] = r1;
                used += (int64_t)r1 * row_bytes;
            } else {
                rows1[n] = 0;
            }
            n++;
        }
    }
    *feat_used = used;
    return n;
}

void htpu_compact_rows(const uint8_t* reads, const int32_t* rows,
                       int32_t n_rows, int32_t feature_length,
                       int32_t channels, uint8_t* packed, uint8_t* scalars) {
    const int32_t L = feature_length, C = channels;
    const int32_t nscal = (C == 7) ? 3 : 2;
    const size_t row_bytes = (size_t)L * C;
    for (int32_t r = 0; r < n_rows; r++) {
        const uint8_t* src = reads + (size_t)rows[r] * row_bytes;
        uint8_t* dst = packed + (size_t)r * L * 3;
        uint8_t m3 = 0, m4 = 0, m6 = 0;
        for (int32_t i = 0; i < L; i++) {
            const uint8_t* cell = src + (size_t)i * C;
            dst[3 * i] = cell[0];
            dst[3 * i + 1] = cell[2];
            dst[3 * i + 2] = cell[4] != 0;
            // per-row scalars come from PRESENT cells only (all packers agree
            // on this): reconstruction paints scalars * presence-mask, so an
            // absent cell's channel value is unrepresentable on the wire
            if (cell[4] != 0) {
                m3 = std::max(m3, cell[3]);
                m4 = std::max(m4, cell[4]);
                if (C == 7) m6 = std::max(m6, cell[6]);
            }
        }
        uint8_t* sc = scalars + (size_t)r * nscal;
        sc[0] = m3;
        sc[1] = m4;
        if (C == 7) sc[2] = m6;
    }
}

// shared 1-byte cell coder (pipeline/compact.py palettes); returns 0 when a
// present cell's color falls outside the palettes or an absent cell carries
// a color (never true of featurizer output)
static int encode_row_coded(const uint8_t* src, int32_t L, int32_t C,
                            uint8_t* dst, uint8_t* sc) {
    static uint8_t base_lut[256];
    static uint8_t qual_lut[256];
    static bool lut_ready = false;
    if (!lut_ready) {
        for (int i = 0; i < 256; i++) base_lut[i] = qual_lut[i] = 0xFF;
        const int base_pal[5] = {0, 30, 100, 180, 250};
        for (int i = 0; i < 5; i++) base_lut[base_pal[i]] = (uint8_t)i;
        for (int q = 0; q <= 40; q++)
            qual_lut[(int)(254.0f * (float)q / 40.0f)] = (uint8_t)q;
        lut_ready = true;
    }
    uint8_t m3 = 0, m4 = 0, m6 = 0;
    for (int32_t i = 0; i < L; i++) {
        const uint8_t* cell = src + (size_t)i * C;
        if (cell[4] == 0) {
            // absent cells decode as all-zero; a nonzero color here would
            // be lost, so such (non-featurizer) tensors take the fallback
            if (cell[0] | cell[2]) return 0;
            dst[i] = 255;
            continue;
        }
        const uint8_t b = base_lut[cell[0]];
        const uint8_t q = qual_lut[cell[2]];
        if (b == 0xFF || q == 0xFF) return 0;
        dst[i] = (uint8_t)(b * 41 + q);
        m3 = std::max(m3, cell[3]);
        m4 = std::max(m4, cell[4]);
        if (C == 7) m6 = std::max(m6, cell[6]);
    }
    sc[0] = m3;
    sc[1] = m4;
    if (C == 7) sc[2] = m6;
    return 1;
}

int32_t htpu_encode_rows_coded(const uint8_t* rows, int64_t n_rows,
                               int32_t feature_length, int32_t channels,
                               uint8_t* codes, uint8_t* scalars) {
    const int32_t L = feature_length, C = channels;
    const int32_t nscal = (C == 7) ? 3 : 2;
    for (int64_t r = 0; r < n_rows; r++) {
        if (!encode_row_coded(rows + (size_t)r * L * C, L, C,
                              codes + (size_t)r * L,
                              scalars + (size_t)r * nscal))
            return 0;
    }
    return 1;
}

int32_t htpu_compact_rows_coded(const uint8_t* reads, const int32_t* rows,
                                int32_t n_rows, int32_t feature_length,
                                int32_t channels, uint8_t* codes,
                                uint8_t* scalars) {
    const int32_t L = feature_length, C = channels;
    const int32_t nscal = (C == 7) ? 3 : 2;
    const size_t row_bytes = (size_t)L * C;
    for (int32_t r = 0; r < n_rows; r++) {
        if (!encode_row_coded(reads + (size_t)rows[r] * row_bytes, L, C,
                              codes + (size_t)r * L,
                              scalars + (size_t)r * nscal))
            return 0;
    }
    return 1;
}

}  // extern "C"
