// Chunk-level host orchestrator: the entire per-chunk candidate pipeline
// (hotspot subchunks -> active regions -> candidate intervals -> assembly ->
// per-site featurization) in one native call.
//
// This is a C++ mirror of the Python orchestration in
// hello_tpu/pipeline/{hotspots,candidates,parallel_call}.py (which remains
// the semantic reference; tests/test_native_chunk.py asserts exact output
// parity).  It is written entirely against the public C API in
// hello_native.h, so the window-engine semantics stay single-sourced in
// engine.cpp.  Two callbacks keep behavior bit-identical to the Python
// driver:
//   * next_seed() — the caller's RNG draw for every read selection, in the
//     same order the Python driver performs them (reservoir-sampling
//     reproducibility, reference python/call.py:27 seeding discipline);
//   * ref_fetch() — reference-sequence slices with FastaFile.fetch clamping
//     semantics (out-of-range positions clipped).
//
// Why: the Python per-stage loop spends the majority of host-stage time in
// Python glue and ctypes marshaling across thousands of small native calls
// per chunk; one call per chunk removes that entirely (the host stage is the
// end-to-end Amdahl bottleneck, SURVEY.md §7 "Throughput").

#include "hello_native.h"

#include <algorithm>
#include <cstring>
#include <map>
#include <set>
#include <string>
#include <utility>
#include <vector>

namespace {

using Region = std::pair<int64_t, int64_t>;

struct Selection {
    std::vector<int32_t> idx;
};

// One constructed window with the Python Window object's cached state.
struct WinInfo {
    htpu_window* w = nullptr;
    int64_t rstart = 0, rstop = 0;        // Window.start / Window.stop
    std::vector<Region> regions;          // Window._regions (strict, clipped)
    std::vector<Selection> sels;          // per input BAM (may be empty)
    bool assembled = false;
};

struct Ctx {
    htpu_bam** bams;
    const uint8_t* pacbio;
    const int32_t* rids;
    int32_t n_bams;
    const htpu_params* params;
    htpu_seed_fn next_seed;
    htpu_ref_fn ref_fetch;
    int64_t chrom_len;
    int hybrid, hybrid_hotspot;
    // scratch
    std::vector<int32_t> sel_buf;
    std::vector<int64_t> region_buf;
    std::vector<char> ref_buf;
    std::vector<char> name_buf;
};

// ReadSource._max_reads with prorate=True (hotspots.py:38-45)
int32_t prorated(int32_t cap, int32_t per, int64_t span) {
    if (span > per) return (int32_t)((double)cap / (double)per * (double)span);
    return cap;
}

// One select per BAM over [lo, hi); ALWAYS draws the seed (the Python driver
// evaluates rng.randrange before the rid lookup, hotspots.py:51-55).
std::vector<Selection> select_all(Ctx& c, int64_t lo, int64_t hi,
                                  const std::vector<int32_t>& max_reads) {
    std::vector<Selection> out(c.n_bams);
    for (int32_t b = 0; b < c.n_bams; b++) {
        uint64_t seed = c.next_seed();
        if (c.rids[b] < 0) continue;
        int32_t cap = std::max(max_reads[b], 1);
        if ((int64_t)c.sel_buf.size() < cap) c.sel_buf.resize(cap);
        int32_t n = htpu_bam_select(c.bams[b], c.rids[b], lo, hi,
                                    max_reads[b], seed, c.sel_buf.data(),
                                    (int32_t)c.sel_buf.size());
        n = std::min(n, (int32_t)c.sel_buf.size());
        out[b].idx.assign(c.sel_buf.begin(), c.sel_buf.begin() + n);
    }
    return out;
}

int64_t total_selected(const std::vector<Selection>& sels) {
    int64_t t = 0;
    for (auto& s : sels) t += (int64_t)s.idx.size();
    return t;
}

// Window.from_native_selections bounds + creation (window.py:219-272).
// Returns nullptr when the selection is empty or the window is out of bounds
// (LocationOutOfBounds -> caller skips).
htpu_window* make_window(Ctx& c, const std::vector<Selection>& sels,
                         int64_t rstart, int64_t rstop) {
    if (total_selected(sels) == 0) return nullptr;
    int64_t min_start = rstart;
    int64_t max_end = INT64_MIN;
    for (int32_t b = 0; b < c.n_bams; b++) {
        if (sels[b].idx.empty()) continue;
        int64_t mn, mx;
        htpu_bam_selection_bounds(c.bams[b], sels[b].idx.data(),
                                  (int32_t)sels[b].idx.size(), &mn, &mx);
        min_start = std::min(min_start, mn);
        max_end = std::max(max_end, mx);
    }
    int64_t window_start = std::max<int64_t>(0, min_start - 10);
    int64_t window_end = (max_end == INT64_MIN) ? rstop : max_end;
    if (window_end > c.chrom_len || window_end < 0) return nullptr;  // OOB
    window_end += 10;

    int64_t want = std::max<int64_t>(window_end - window_start, 1);
    if ((int64_t)c.ref_buf.size() < want) c.ref_buf.resize(want);
    int64_t got = c.ref_fetch(window_start, window_end, c.ref_buf.data(),
                              (int64_t)c.ref_buf.size());

    std::vector<int32_t> idx;
    std::vector<int32_t> counts(c.n_bams);
    for (int32_t b = 0; b < c.n_bams; b++) {
        idx.insert(idx.end(), sels[b].idx.begin(), sels[b].idx.end());
        counts[b] = (int32_t)sels[b].idx.size();
    }
    return htpu_window_create_from_bam(
        c.bams, c.pacbio, c.n_bams, idx.data(), counts.data(),
        c.ref_buf.data(), got, window_start, 0, 0, c.params);
}

std::vector<Region> differing(Ctx& c, htpu_window* w) {
    if ((int64_t)c.region_buf.size() < 2 * 4096) c.region_buf.resize(2 * 4096);
    int32_t n = htpu_differing_regions(w, 0, c.hybrid_hotspot,
                                       c.region_buf.data(),
                                       (int32_t)(c.region_buf.size() / 2));
    if (n > (int32_t)(c.region_buf.size() / 2)) {
        c.region_buf.resize(2 * (size_t)n);
        n = htpu_differing_regions(w, 0, c.hybrid_hotspot,
                                   c.region_buf.data(), n);
    }
    std::vector<Region> out;
    out.reserve(n);
    for (int32_t i = 0; i < n; i++)
        out.emplace_back(c.region_buf[2 * i], c.region_buf[2 * i + 1]);
    return out;
}

// _NativeBackend.differing_regions(strict=True) + Window clipping
// (window.py:101-109, 276-284)
std::vector<Region> strict_regions(Ctx& c, htpu_window* w, int64_t rstart,
                                   int64_t rstop) {
    std::vector<Region> out;
    for (auto& r : differing(c, w)) {
        if (rstart <= r.first && r.second <= rstop)
            out.emplace_back(std::max(rstart, r.first),
                             std::min(rstop, r.second));
    }
    return out;
}

// Window._illumina_coverage over native selections (window.py:302-315)
double illumina_coverage(Ctx& c, const WinInfo& wi) {
    if (wi.rstop <= wi.rstart) return 0.0;
    int64_t covered = 0;
    for (int32_t b = 0; b < c.n_bams; b++) {
        if (c.pacbio[b]) continue;
        const int64_t* starts = htpu_bam_ref_starts(c.bams[b]);
        const int64_t* ends = htpu_bam_ref_ends(c.bams[b]);
        const int32_t* mapqs = htpu_bam_mapqs(c.bams[b]);
        for (int32_t i : wi.sels[b].idx) {
            if (mapqs[i] < 10) continue;
            int64_t lo = std::max(starts[i], wi.rstart);
            int64_t hi = std::min(ends[i], wi.rstop);
            covered += std::max<int64_t>(hi - lo, 0);
        }
    }
    return (double)covered / (double)(wi.rstop - wi.rstart);
}

// alleles_at with the Python wrapper's fixed 1 MB scratch semantics
// (native.py:459-462: a too-small buffer yields an empty list)
std::set<std::string> alleles_at(Ctx& c, htpu_window* w, int64_t start,
                                 int64_t stop) {
    if (c.name_buf.size() < (1 << 20)) c.name_buf.resize(1 << 20);
    int32_t n = htpu_alleles_at(w, start, stop, c.name_buf.data(),
                                (int64_t)c.name_buf.size());
    std::set<std::string> out;
    int64_t pos = 0;
    for (int32_t i = 0; i < n; i++) {
        std::string a(c.name_buf.data() + pos);
        pos += (int64_t)a.size() + 1;
        out.insert(std::move(a));
    }
    return out;
}

// Python str slicing: clamp, empty when lo >= hi
std::string py_slice(const std::string& s, int64_t lo, int64_t hi) {
    int64_t n = (int64_t)s.size();
    lo = std::max<int64_t>(0, std::min(lo, n));
    hi = std::max<int64_t>(0, std::min(hi, n));
    if (lo >= hi) return std::string();
    return s.substr((size_t)lo, (size_t)(hi - lo));
}

// candidates.cluster_intervals (candidates.py:51-71), quirks preserved:
// an oversized interval flushes a non-empty cluster and is dropped, but
// SEEDS a new cluster when the current cluster is empty.
std::vector<std::vector<Region>> cluster_intervals(
        const std::vector<Region>& intervals, int64_t distance,
        int64_t max_allele_length, int64_t max_items) {
    std::vector<std::vector<Region>> out;
    std::vector<Region> cluster;
    for (auto& loc : intervals) {
        if (loc.second - loc.first > max_allele_length) {
            if (!cluster.empty()) {
                out.push_back(std::move(cluster));
                cluster.clear();
                continue;
            }
        }
        if (cluster.empty()) {
            cluster.push_back(loc);
        } else if (loc.first - cluster.back().second < distance &&
                   (int64_t)cluster.size() < max_items) {
            cluster.push_back(loc);
        } else {
            out.push_back(std::move(cluster));
            cluster.clear();
            cluster.push_back(loc);
        }
    }
    if (!cluster.empty()) out.push_back(std::move(cluster));
    return out;
}

struct SubCluster {
    std::vector<Region> spots;
    int64_t seg_start, seg_stop;
};

// candidates.split_clusters (candidates.py:74-96)
std::vector<SubCluster> split_clusters(const std::vector<Region>& cluster,
                                       int64_t half_distance,
                                       int64_t max_items) {
    std::vector<SubCluster> out;
    if ((int64_t)cluster.size() <= max_items) {
        SubCluster sc;
        sc.spots = cluster;
        // clamped at 0 like the Python driver (candidates.split_clusters):
        // the reference fetch clamps, so a negative start would shift indexing
        sc.seg_start = std::max<int64_t>(0, cluster.front().first - half_distance);
        sc.seg_stop = cluster.back().second + half_distance;
        out.push_back(std::move(sc));
        return out;
    }
    std::vector<size_t> indices;
    for (size_t i = 0; i < cluster.size(); i += (size_t)max_items)
        indices.push_back(i);
    const std::vector<Region>* last_chunk = nullptr;
    std::vector<std::vector<Region>> chunks;
    for (size_t k = 0; k < indices.size(); k++) {
        size_t lo = indices[k];
        size_t hi = std::min(lo + (size_t)max_items, cluster.size());
        chunks.emplace_back(cluster.begin() + lo, cluster.begin() + hi);
    }
    for (size_t k = 0; k < chunks.size(); k++) {
        SubCluster sc;
        sc.spots = chunks[k];
        int64_t start = std::max<int64_t>(
            0, chunks[k].front().first - half_distance);
        if (last_chunk) start = std::max(start, last_chunk->back().second);
        int64_t stop = chunks[k].back().second + half_distance;
        if (k + 1 < chunks.size())
            stop = std::min(stop, chunks[k + 1].front().first);
        sc.seg_start = start;
        sc.seg_stop = stop;
        out.push_back(std::move(sc));
        last_chunk = &chunks[k];
    }
    return out;
}

struct SiteQuery {
    std::vector<std::string> alleles;     // lexicographic (site_query order)
    std::vector<int32_t> rows0, rows1;
    std::vector<int64_t> offsets;         // byte offset of each allele's rows
    std::vector<uint8_t> feat;
};

// htpu_site_query with growing buffers (never truncates; the realistic-size
// behavior is identical to the Python scratch path)
bool run_site_query(Ctx& c, htpu_window* w, int64_t start, int64_t stop,
                    int32_t feature_length, int include_hp, int primary_pb,
                    int32_t max_allele_len, SiteQuery& q) {
    static thread_local std::vector<char> names(1 << 20);
    static thread_local std::vector<int32_t> r0(4096), r1(4096);
    static thread_local std::vector<uint8_t> feat(8 << 20);
    int64_t row_bytes = (int64_t)feature_length * (include_hp ? 7 : 6);
    for (int attempt = 0; attempt < 8; attempt++) {
        int64_t used = 0;
        int32_t n = htpu_site_query(
            w, start, stop, feature_length, include_hp, c.hybrid, primary_pb,
            max_allele_len, names.data(), (int64_t)names.size(),
            r0.data(), r1.data(), (int32_t)r0.size(),
            feat.data(), (int64_t)feat.size(), &used);
        if (n < 0) {
            names.resize(names.size() * 2);
            r0.resize(r0.size() * 2);
            r1.resize(r1.size() * 2);
            feat.resize(feat.size() * 4);
            continue;
        }
        q.alleles.clear();
        q.rows0.assign(r0.begin(), r0.begin() + n);
        q.rows1.assign(r1.begin(), r1.begin() + n);
        q.offsets.clear();
        int64_t pos = 0, off = 0;
        for (int32_t i = 0; i < n; i++) {
            std::string a(names.data() + pos);
            pos += (int64_t)a.size() + 1;
            q.alleles.push_back(std::move(a));
            q.offsets.push_back(off);
            off += ((int64_t)q.rows0[i] + (c.hybrid ? q.rows1[i] : 0))
                   * row_bytes;
        }
        q.feat.assign(feat.begin(), feat.begin() + used);
        return true;
    }
    return false;
}

}  // namespace

struct htpu_chunk {
    std::vector<int64_t> pos, stop;
    std::vector<int32_t> nalleles;
    std::vector<int8_t> site_labels;
    std::string alleles;                  // \0-joined, emission order
    std::vector<int32_t> rows0, rows1;
    std::vector<int8_t> labels;
    std::vector<uint8_t> feat;
    // coded emission (code-on-copy, see htpu_chunk_sites_coded)
    std::vector<uint8_t> codes, scalars;
    int32_t coded = 0;
};

static htpu_chunk* chunk_sites_impl(
        htpu_bam** bams, const uint8_t* bam_pacbio, const int32_t* bam_rids,
        int32_t n_bams,
        int64_t chunk_start, int64_t chunk_stop, int64_t chrom_len,
        int32_t subchunk_size, int32_t min_distance, int32_t flanking,
        int32_t max_items_per_group,
        int hybrid, int pacbio, int hybrid_hotspot, int include_hp,
        int32_t feature_length, int32_t max_allele_len,
        const int32_t* hs_max_reads,
        const int32_t* cand_cap, const int32_t* cand_per,
        const htpu_params* params,
        htpu_seed_fn next_seed, htpu_ref_fn ref_fetch, int coded) {
    Ctx c;
    c.bams = bams;
    c.pacbio = bam_pacbio;
    c.rids = bam_rids;
    c.n_bams = n_bams;
    c.params = params;
    c.next_seed = next_seed;
    c.ref_fetch = ref_fetch;
    c.chrom_len = chrom_len;
    c.hybrid = hybrid;
    c.hybrid_hotspot = hybrid_hotspot;
    int primary_pb = pacbio && !hybrid;
    int64_t half_distance = min_distance / 2;

    std::vector<htpu_window*> owned;
    auto cleanup = [&]() {
        for (auto* w : owned) htpu_window_destroy(w);
    };

    // ---- phase 1: hotspot positions (hotspots.detect_hotspots) ----
    std::vector<int32_t> hs_rates(hs_max_reads, hs_max_reads + n_bams);
    std::set<int64_t> positions;
    for (int64_t pos = chunk_start; pos < chunk_stop;) {
        int64_t end = std::min(pos + (int64_t)subchunk_size, chunk_stop);
        auto sels = select_all(c, pos, end, hs_rates);
        htpu_window* w = make_window(c, sels, pos, end);
        if (w != nullptr) {
            for (auto& r : differing(c, w)) {
                int64_t lo = std::max(pos, r.first);
                int64_t hi = std::min(end, r.second);
                for (int64_t j = lo; j < hi; j++) positions.insert(j);
            }
            htpu_window_destroy(w);
        }
        pos = end;
    }
    auto* out = new htpu_chunk();
    out->coded = coded ? 1 : 0;
    if (positions.empty()) return out;

    // ---- phase 2: active regions (hotspots.cluster_hotspots) ----
    std::vector<Region> actives;
    {
        std::vector<int64_t> cluster;
        for (int64_t p : positions) {
            if (!cluster.empty() && p - cluster.back() > min_distance) {
                actives.emplace_back(cluster.front() - half_distance,
                                     cluster.back() + half_distance);
                cluster.clear();
            }
            cluster.push_back(p);
        }
        if (!cluster.empty())
            actives.emplace_back(cluster.front() - half_distance,
                                 cluster.back() + half_distance);
    }

    // ---- phase 3: candidate intervals (hotspots.candidate_intervals) ----
    std::vector<WinInfo> winfos;      // the Python `windows` dict, in order
    std::vector<Region> intervals;
    for (auto& ar : actives) {
        int64_t lo = std::max<int64_t>(0, ar.first - flanking);
        int64_t hi = ar.second + flanking;
        std::vector<int32_t> rates(n_bams);
        for (int32_t b = 0; b < n_bams; b++)
            rates[b] = prorated(cand_cap[b], cand_per[b], hi - lo);
        auto sels = select_all(c, lo, hi, rates);
        htpu_window* w = make_window(c, sels, ar.first, ar.second);
        if (w == nullptr) continue;
        owned.push_back(w);
        WinInfo wi;
        wi.w = w;
        wi.rstart = ar.first;
        wi.rstop = ar.second;
        wi.regions = strict_regions(c, w, ar.first, ar.second);
        wi.sels = std::move(sels);
        intervals.insert(intervals.end(), wi.regions.begin(),
                         wi.regions.end());
        winfos.push_back(std::move(wi));
    }

    // hotspots.merge_intervals
    std::sort(intervals.begin(), intervals.end());
    std::vector<Region> merged;
    for (auto& r : intervals) {
        if (!merged.empty() && r.first <= merged.back().second)
            merged.back().second = std::max(merged.back().second, r.second);
        else
            merged.push_back(r);
    }

    // ---- phase 4: site generation (candidates.generate_sites) ----
    std::vector<WinInfo> fresh;       // windows built on reuse miss
    for (auto& cluster : cluster_intervals(merged, min_distance,
                                           max_allele_len,
                                           max_items_per_group)) {
        int64_t cstart = cluster.front().first - half_distance;
        int64_t cstop = cluster.back().second + half_distance - 1;

        WinInfo* wi = nullptr;
        for (auto& cand : winfos) {
            // the Python chained comparison a <= start < stop <= b
            if (cand.rstart <= cstart && cstart < cstop &&
                cstop <= cand.rstop) {
                wi = &cand;
                break;
            }
        }
        if (wi == nullptr) {
            int64_t lo = std::max<int64_t>(0, cstart - flanking);
            int64_t hi = cstop + flanking;
            std::vector<int32_t> rates(n_bams);
            for (int32_t b = 0; b < n_bams; b++)
                rates[b] = prorated(cand_cap[b], cand_per[b], hi - lo);
            auto sels = select_all(c, lo, hi, rates);
            htpu_window* w = make_window(c, sels, cstart, cstop);
            if (w == nullptr) continue;
            owned.push_back(w);
            WinInfo nw;
            nw.w = w;
            nw.rstart = cstart;
            nw.rstop = cstop;
            nw.regions = strict_regions(c, w, cstart, cstop);
            nw.sels = std::move(sels);
            fresh.push_back(std::move(nw));
            wi = &fresh.back();
        }

        if (!wi->assembled) {
            bool reassemble = hybrid && illumina_coverage(c, *wi) > 14.0;
            std::vector<int64_t> flat;
            for (auto& r : wi->regions) {
                flat.push_back(r.first);
                flat.push_back(r.second);
            }
            htpu_assemble_region(wi->w, flat.data(),
                                 (int32_t)wi->regions.size(),
                                 reassemble ? 1 : 0);
            wi->assembled = true;
        }
        if (wi->regions.empty()) continue;

        for (auto& sub : split_clusters(wi->regions, half_distance,
                                        max_items_per_group)) {
            // segment fetch with FastaFile clamping; indexed relative to the
            // UNCLAMPED seg_start, exactly as the Python driver does
            int64_t want = sub.seg_stop - std::max<int64_t>(0, sub.seg_start);
            want = std::max<int64_t>(want, 1);
            if ((int64_t)c.ref_buf.size() < want) c.ref_buf.resize(want);
            int64_t got = c.ref_fetch(sub.seg_start, sub.seg_stop,
                                      c.ref_buf.data(),
                                      (int64_t)c.ref_buf.size());
            std::string segment(c.ref_buf.data(), (size_t)std::max<int64_t>(got, 0));

            struct Rec {
                int64_t pos, stop;
                std::string ref;
                std::vector<std::string> alts;
                bool ref_supported;       // ref in alleles_at -> gt covers it
            };
            std::vector<Rec> records;
            for (auto& spot : sub.spots) {
                std::string ref_allele = py_slice(
                    segment, spot.first - sub.seg_start,
                    spot.second - sub.seg_start);
                if (ref_allele.empty()) continue;
                auto site_alleles = alleles_at(c, wi->w, spot.first,
                                               spot.second);
                Rec rec;
                rec.pos = spot.first;
                rec.stop = spot.first + (int64_t)ref_allele.size();
                rec.ref = ref_allele;
                rec.ref_supported = site_alleles.count(ref_allele) > 0;
                for (auto& a : site_alleles)
                    if (a != ref_allele) rec.alts.push_back(a);
                records.push_back(std::move(rec));
            }
            if (records.empty()) continue;
            std::stable_sort(records.begin(), records.end(),
                             [](const Rec& a, const Rec& b) {
                                 return a.pos < b.pos;
                             });

            for (auto& rec : records) {
                SiteQuery q;
                if (!run_site_query(c, wi->w, rec.pos, rec.stop,
                                    feature_length, include_hp, primary_pb,
                                    max_allele_len, q))
                    continue;
                // truth set from the calling-mode gt rule
                // (candidates.make_candidate_record + _site_tensors)
                std::set<std::string> truth(rec.alts.begin(), rec.alts.end());
                if (rec.ref_supported) truth.insert(rec.ref);

                int64_t row_bytes =
                    (int64_t)feature_length * (include_hp ? 7 : 6);
                int32_t emitted = 0;
                int32_t label_sum = 0;
                std::vector<std::string> ordered;
                ordered.push_back(rec.ref);
                ordered.insert(ordered.end(), rec.alts.begin(),
                               rec.alts.end());
                for (auto& allele : ordered) {
                    auto it = std::lower_bound(q.alleles.begin(),
                                               q.alleles.end(), allele);
                    if (it == q.alleles.end() || *it != allele) continue;
                    size_t i = (size_t)(it - q.alleles.begin());
                    int8_t label = truth.count(allele) ? 1 : 0;
                    out->labels.push_back(label);
                    label_sum += label;
                    out->rows0.push_back(q.rows0[i]);
                    out->rows1.push_back(hybrid ? q.rows1[i] : 0);
                    int64_t nrows = (int64_t)q.rows0[i] +
                                    (hybrid ? q.rows1[i] : 0);
                    if (coded) {
                        // code-on-copy: emit 1-byte cell codes + per-row
                        // scalars instead of the dense tensor (6-7x less)
                        int32_t channels = include_hp ? 7 : 6;
                        int32_t nscal = include_hp ? 3 : 2;
                        size_t c0 = out->codes.size();
                        size_t s0 = out->scalars.size();
                        out->codes.resize(
                            c0 + (size_t)nrows * feature_length);
                        out->scalars.resize(s0 + (size_t)nrows * nscal);
                        if (!htpu_encode_rows_coded(
                                q.feat.data() + q.offsets[i], nrows,
                                feature_length, channels,
                                out->codes.data() + c0,
                                out->scalars.data() + s0)) {
                            // not codable (never true of featurizer output):
                            // the caller re-runs this chunk dense
                            out->coded = -1;
                            cleanup();
                            return out;
                        }
                    } else {
                        out->feat.insert(
                            out->feat.end(),
                            q.feat.begin() + q.offsets[i],
                            q.feat.begin() + q.offsets[i] + nrows * row_bytes);
                    }
                    out->alleles.append(allele);
                    out->alleles.push_back('\0');
                    emitted++;
                }
                if (emitted == 0) continue;
                out->pos.push_back(rec.pos);
                out->stop.push_back(rec.stop);
                out->nalleles.push_back(emitted);
                out->site_labels.push_back(label_sum <= 1 ? 0 : 1);
            }
        }
    }
    cleanup();
    return out;
}

extern "C" {

htpu_chunk* htpu_chunk_sites(
        htpu_bam** bams, const uint8_t* bam_pacbio, const int32_t* bam_rids,
        int32_t n_bams,
        int64_t chunk_start, int64_t chunk_stop, int64_t chrom_len,
        int32_t subchunk_size, int32_t min_distance, int32_t flanking,
        int32_t max_items_per_group,
        int hybrid, int pacbio, int hybrid_hotspot, int include_hp,
        int32_t feature_length, int32_t max_allele_len,
        const int32_t* hs_max_reads,
        const int32_t* cand_cap, const int32_t* cand_per,
        const htpu_params* params,
        htpu_seed_fn next_seed, htpu_ref_fn ref_fetch) {
    return chunk_sites_impl(
        bams, bam_pacbio, bam_rids, n_bams, chunk_start, chunk_stop,
        chrom_len, subchunk_size, min_distance, flanking,
        max_items_per_group, hybrid, pacbio, hybrid_hotspot, include_hp,
        feature_length, max_allele_len, hs_max_reads, cand_cap, cand_per,
        params, next_seed, ref_fetch, 0);
}

htpu_chunk* htpu_chunk_sites_coded(
        htpu_bam** bams, const uint8_t* bam_pacbio, const int32_t* bam_rids,
        int32_t n_bams,
        int64_t chunk_start, int64_t chunk_stop, int64_t chrom_len,
        int32_t subchunk_size, int32_t min_distance, int32_t flanking,
        int32_t max_items_per_group,
        int hybrid, int pacbio, int hybrid_hotspot, int include_hp,
        int32_t feature_length, int32_t max_allele_len,
        const int32_t* hs_max_reads,
        const int32_t* cand_cap, const int32_t* cand_per,
        const htpu_params* params,
        htpu_seed_fn next_seed, htpu_ref_fn ref_fetch) {
    return chunk_sites_impl(
        bams, bam_pacbio, bam_rids, n_bams, chunk_start, chunk_stop,
        chrom_len, subchunk_size, min_distance, flanking,
        max_items_per_group, hybrid, pacbio, hybrid_hotspot, include_hp,
        feature_length, max_allele_len, hs_max_reads, cand_cap, cand_per,
        params, next_seed, ref_fetch, 1);
}

int32_t htpu_chunk_coded(htpu_chunk* r) { return r->coded; }
const uint8_t* htpu_chunk_codes(htpu_chunk* r) { return r->codes.data(); }
int64_t htpu_chunk_codes_len(htpu_chunk* r) {
    return (int64_t)r->codes.size();
}
const uint8_t* htpu_chunk_scalars(htpu_chunk* r) { return r->scalars.data(); }
int64_t htpu_chunk_scalars_len(htpu_chunk* r) {
    return (int64_t)r->scalars.size();
}

void htpu_chunk_destroy(htpu_chunk* r) { delete r; }

int64_t htpu_chunk_num_sites(htpu_chunk* r) { return (int64_t)r->pos.size(); }
const int64_t* htpu_chunk_positions(htpu_chunk* r) { return r->pos.data(); }
const int64_t* htpu_chunk_stops(htpu_chunk* r) { return r->stop.data(); }
const int32_t* htpu_chunk_nalleles(htpu_chunk* r) { return r->nalleles.data(); }
const int8_t* htpu_chunk_site_labels(htpu_chunk* r) {
    return r->site_labels.data();
}
const char* htpu_chunk_alleles(htpu_chunk* r) { return r->alleles.data(); }
int64_t htpu_chunk_alleles_len(htpu_chunk* r) {
    return (int64_t)r->alleles.size();
}
const int32_t* htpu_chunk_rows0(htpu_chunk* r) { return r->rows0.data(); }
const int32_t* htpu_chunk_rows1(htpu_chunk* r) { return r->rows1.data(); }
const int8_t* htpu_chunk_labels(htpu_chunk* r) { return r->labels.data(); }
const uint8_t* htpu_chunk_features(htpu_chunk* r) { return r->feat.data(); }
int64_t htpu_chunk_features_len(htpu_chunk* r) {
    return (int64_t)r->feat.size();
}

}  // extern "C"
