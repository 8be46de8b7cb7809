// Standalone profiling harness for the chunk orchestrator.
//
// Drives htpu_chunk_sites over a BAM + FASTA exactly like the production
// worker (hello_tpu/pipeline/parallel_call.host_sites_for_chunk), but as a
// plain C++ binary so gprof / perf can attribute time inside the engine.
// Not part of the shipped library; build with `make -C native profile`.
//
// Usage: profile_chunk <bam> <fasta> <chrom> <start> <stop> <chunk_size>
//                      [iters] [pacbio(0|1)]

#include "hello_native.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <fstream>
#include <random>
#include <string>
#include <vector>

static std::string g_ref;      // chromosome sequence
static std::mt19937_64 g_rng(13);

static uint64_t seed_fn() { return g_rng(); }

static int64_t ref_fetch(int64_t start, int64_t stop, char* out, int64_t cap) {
    int64_t n = (int64_t)g_ref.size();
    if (start < 0) start = 0;
    if (stop > n) stop = n;
    if (start >= stop) return 0;
    int64_t len = stop - start;
    if (len > cap) len = cap;
    memcpy(out, g_ref.data() + start, (size_t)len);
    return len;
}

static std::string load_fasta_chrom(const char* path, const char* chrom) {
    std::ifstream f(path);
    std::string line, seq;
    bool in = false;
    while (std::getline(f, line)) {
        if (!line.empty() && line[0] == '>') {
            std::string name = line.substr(1);
            size_t sp = name.find_first_of(" \t");
            if (sp != std::string::npos) name = name.substr(0, sp);
            in = (name == chrom);
            continue;
        }
        if (in) seq += line;
    }
    return seq;
}

int main(int argc, char** argv) {
    if (argc < 7) {
        fprintf(stderr, "usage: %s <bam> <fasta> <chrom> <start> <stop> "
                        "<chunk_size> [iters]\n", argv[0]);
        return 2;
    }
    const char* bam_path = argv[1];
    const char* fasta_path = argv[2];
    const char* chrom = argv[3];
    int64_t start = atoll(argv[4]);
    int64_t stop = atoll(argv[5]);
    int64_t chunk_size = atoll(argv[6]);
    int iters = argc > 7 ? atoi(argv[7]) : 1;
    int pacbio = argc > 8 ? atoi(argv[8]) : 0;

    g_ref = load_fasta_chrom(fasta_path, chrom);
    if (g_ref.empty()) { fprintf(stderr, "chrom not found\n"); return 1; }

    htpu_params params;
    htpu_default_params(&params);

    int64_t total_sites = 0, total_alleles = 0;
    double total_s = 0.0;
    for (int it = 0; it < iters; it++) {
        for (int64_t pos = start; pos < stop; pos += chunk_size) {
            int64_t end = pos + chunk_size < stop ? pos + chunk_size : stop;
            // per-chunk open mirrors the production worker (region-indexed)
            htpu_bam* bam = htpu_bam_open_region(bam_path, chrom,
                                                 pos > 75 ? pos - 75 : 0,
                                                 end + 75);
            if (!bam) { fprintf(stderr, "bam open failed\n"); return 1; }
            int32_t rid = -1;
            for (int32_t i = 0; i < htpu_bam_num_refs(bam); i++)
                if (strcmp(htpu_bam_ref_name(bam, i), chrom) == 0) rid = i;
            uint8_t pb = (uint8_t)pacbio;
            // constants.py: hotspot caps 10000/1000; prorating rates
            // (1000, 30) Illumina / (100, 100) PacBio
            int32_t hs_max = pacbio ? 1000 : 10000;
            int32_t cap = pacbio ? 100 : 1000;
            int32_t per = pacbio ? 100 : 30;
            auto t0 = std::chrono::steady_clock::now();
            htpu_chunk* ch = htpu_chunk_sites(
                &bam, &pb, &rid, 1, pos, end, (int64_t)g_ref.size(),
                /*subchunk=*/pacbio ? 10000 : 400,
                /*min_distance=*/30, /*flanking=*/75,
                /*max_items=*/1024, /*hybrid=*/0, /*pacbio=*/pacbio,
                /*hybrid_hotspot=*/0, /*include_hp=*/0,
                /*feature_length=*/150, /*max_allele_len=*/100,
                &hs_max, &cap, &per, &params, seed_fn, ref_fetch);
            auto t1 = std::chrono::steady_clock::now();
            total_s += std::chrono::duration<double>(t1 - t0).count();
            total_sites += htpu_chunk_num_sites(ch);
            const int32_t* na = htpu_chunk_nalleles(ch);
            for (int64_t i = 0; i < htpu_chunk_num_sites(ch); i++)
                total_alleles += na[i];
            htpu_chunk_destroy(ch);
            htpu_bam_close(bam);
        }
    }
    printf("sites=%lld alleles=%lld chunk_time=%.3fs rate=%.1f sites/s\n",
           (long long)total_sites, (long long)total_alleles, total_s,
           total_sites / total_s);
    return 0;
}
