/* hello_native — C API for the TPU-native variant-calling host engine.
 *
 * Native implementation of the host-side candidate search: per-position
 * allele counting, hotspot detection, allele assembly, support maps, and
 * colored pileup featurization, plus a BGZF/BAM loader.  The pure-Python
 * engine in hello_tpu/{counts,assembly,featurize}.py is the semantic
 * reference; this library implements the same contract for production
 * throughput and is validated against it by fuzz tests.
 *
 * All buffers cross the boundary as flat arrays (ctypes/numpy friendly).
 * Coordinates are 0-based half-open.
 */

#ifndef HELLO_NATIVE_H
#define HELLO_NATIVE_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- window engine ---- */

typedef struct htpu_window htpu_window;

typedef struct {
    double snv_threshold;     /* default 0.12 */
    double indel_threshold;   /* default 0.12 */
    int min_count;            /* default 2 */
    int min_mapq;             /* default 10 */
    int q_threshold;          /* default 10 */
    int max_allele_size;      /* default 100 */
    int band_margin;          /* default 6 */
    int max_reassembly_region_size; /* default 10 */
} htpu_params;

void htpu_default_params(htpu_params* out);

/* Create a window over reads.  seq/qual are concatenated per-read buffers
 * with offsets[n+1]; cigars are packed (length<<4 | op) uint32 with their own
 * offsets; orientation is +1/-1; pacbio/hp flags per read. */
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
    const htpu_params* params);

/* Scatter-gather window creation: one source descriptor per read, each
 * pointing into caller-owned pools (e.g. a BamData's flat arrays).  The
 * window copies each read's bytes ONCE straight into its own bulk buffers —
 * htpu_window_create requires pre-concatenated inputs, which costs callers
 * marshalling from per-record pools a second full copy. */
typedef struct htpu_read_src {
    const char* seq;
    const uint8_t* qual;
    int64_t seq_len;
    const uint32_t* cigars;
    int64_t n_cigars;
    int64_t ref_start;
    int32_t mapq;
    int8_t orientation;
    uint8_t pacbio;
    int8_t hp;
} htpu_read_src;

htpu_window* htpu_window_create_gather(
    const char* reference, int64_t ref_len, int64_t window_start,
    int64_t region_start, int64_t region_stop,
    const htpu_read_src* srcs, int32_t num_reads,
    const htpu_params* params);

void htpu_window_destroy(htpu_window* w);

/* Differing regions: writes up to max_out (start, stop) pairs; returns count
 * (which may exceed max_out — call again with a larger buffer). */
int32_t htpu_differing_regions(htpu_window* w, int strict, int hybrid_hotspot,
                               int64_t* out_pairs, int32_t max_out);

/* Assemble alleles from reads across the given regions. */
void htpu_assemble_region(htpu_window* w, const int64_t* region_pairs,
                          int32_t num_regions, int reassemble);

/* Alleles observed in a region (post-assembly): alleles are written
 * NUL-separated into buf; returns the number of alleles (or -needed if the
 * buffer is too small). */
int32_t htpu_alleles_at(htpu_window* w, int64_t start, int64_t stop,
                        char* buf, int64_t buf_len);

/* Supported alleles at a site with read ids.  Returns number of alleles;
 * allele strings NUL-separated in buf; counts[i] gives the number of
 * supporting reads of allele i; read ids concatenated in read_ids. */
int32_t htpu_supports_at(htpu_window* w, int64_t start, int64_t stop,
                         char* buf, int64_t buf_len,
                         int32_t* counts, int32_t max_alleles,
                         int32_t* read_ids, int64_t max_ids);

/* Number of reads of one platform supporting an allele at the assembled site. */
int32_t htpu_num_supports(htpu_window* w, int64_t start, int64_t stop,
                          const char* allele, int pacbio);

/* Feature map for one allele at the assembled site: out must hold
 * max_rows * feature_length * channels uint8.  Returns the number of rows
 * written (>= 1; a single zero row when no support). */
int32_t htpu_features(htpu_window* w, int64_t start, int64_t stop,
                      const char* allele, int32_t feature_length,
                      int pacbio, int include_hp,
                      uint8_t* out, int32_t max_rows);

/* Batched per-site query: supported alleles at the assembled site
 * [start, stop) with their feature tensors for one or two platforms, in a
 * single call (replaces the per-allele num_supports+features round trips).
 *
 * Emits every allele in the site's support table with
 * strlen(allele) <= max_allele_len and at least one supporting read of the
 * primary platform (or, in hybrid mode, either platform), in lexicographic
 * order.  Per allele i: rows0[i] rows of [feature_length x channels] uint8
 * are appended to feat for the primary platform, then (hybrid) rows1[i]
 * rows for PacBio; rows are >= 1 (single zero row when the platform has no
 * support).  alleles_buf receives the \0-joined allele strings.
 * Returns the number of alleles, or -1 if any output buffer is too small
 * (caller falls back to per-allele queries). */
int32_t htpu_site_query(htpu_window* w, int64_t start, int64_t stop,
                        int32_t feature_length, int include_hp, int hybrid,
                        int primary_pacbio, int32_t max_allele_len,
                        char* alleles_buf, int64_t alleles_buf_len,
                        int32_t* rows0, int32_t* rows1, int32_t max_alleles,
                        uint8_t* feat, int64_t feat_len, int64_t* feat_used);

/* ---- compact device-transfer packing (pipeline/compact.py host side) ----
 *
 * Gather the real read rows of a dense uint8 feature tensor [AR, L, C]
 * (C = 6 or 7) into the compact wire layout: per row, [L, 3] holding
 * (ch0, ch2, ch4 != 0), plus per-row scalar maxima of ch3, ch4 (and ch6 when
 * C == 7).  packed must hold n_rows*L*3 bytes, scalars n_rows*nscal with
 * nscal = C == 7 ? 3 : 2.  A tight native loop: the byte-strided channel
 * split is pathological for numpy. */
void htpu_compact_rows(const uint8_t* reads, const int32_t* rows,
                       int32_t n_rows, int32_t feature_length, int32_t channels,
                       uint8_t* packed, uint8_t* scalars);

/* Coded variant: one byte per cell instead of three.  Present cells carry
 * code = base_idx * 41 + qual_idx (base color in {0,30,100,180,250}, quality
 * color in the 41-value ladder int(254*q/40), q = 0..40); absent cells
 * (ch4 == 0) carry 255.  codes must hold n_rows*L bytes; scalars as above.
 * Returns 1 on success, 0 if any present cell holds a color outside the
 * palettes (caller falls back to the 3-byte format). */
int32_t htpu_compact_rows_coded(const uint8_t* reads, const int32_t* rows,
                                int32_t n_rows, int32_t feature_length,
                                int32_t channels, uint8_t* codes,
                                uint8_t* scalars);

/* Same coding over n_rows CONTIGUOUS rows (no row-index indirection). */
int32_t htpu_encode_rows_coded(const uint8_t* rows, int64_t n_rows,
                               int32_t feature_length, int32_t channels,
                               uint8_t* codes, uint8_t* scalars);

/* ---- BAM loader ---- */

typedef struct htpu_bam htpu_bam;

/* Load and decode a whole BAM file into flat arrays. Returns NULL on error. */
htpu_bam* htpu_bam_open(const char* path);
// O(region) open via the .bai linear index: decodes only records overlapping
// [start, stop) on `chromosome`; whole-file fallback when no index exists.
htpu_bam* htpu_bam_open_region(const char* path, const char* chromosome,
                               int64_t start, int64_t stop);
// Same, with an explicit .bai location (e.g. the per-user cache used when
// the BAM's directory is read-only).
htpu_bam* htpu_bam_open_region_bai(const char* path, const char* bai_path,
                                   const char* chromosome,
                                   int64_t start, int64_t stop);
void htpu_bam_close(htpu_bam* b);

int32_t htpu_bam_num_refs(htpu_bam* b);
const char* htpu_bam_ref_name(htpu_bam* b, int32_t i);
int64_t htpu_bam_ref_len(htpu_bam* b, int32_t i);

int64_t htpu_bam_num_reads(htpu_bam* b);
/* Flat array accessors (valid until htpu_bam_close). */
const char* htpu_bam_seqs(htpu_bam* b);
const int64_t* htpu_bam_seq_offsets(htpu_bam* b);
const uint8_t* htpu_bam_quals(htpu_bam* b);
const uint32_t* htpu_bam_cigars(htpu_bam* b);
const int64_t* htpu_bam_cigar_offsets(htpu_bam* b);
const int64_t* htpu_bam_ref_starts(htpu_bam* b);
const int64_t* htpu_bam_ref_ends(htpu_bam* b);
const int32_t* htpu_bam_ref_ids(htpu_bam* b);
const int32_t* htpu_bam_mapqs(htpu_bam* b);
const uint16_t* htpu_bam_flags(htpu_bam* b);
const int8_t* htpu_bam_hps(htpu_bam* b);
const char* htpu_bam_names(htpu_bam* b);
const int64_t* htpu_bam_name_offsets(htpu_bam* b);

/* ---- fast path: BAM -> window without the Python object boundary ---- */

/* Select usable reads overlapping [start, stop): DeepVariant-style flag
 * filter, (name, strand) dedup, reservoir subsampling to max_reads (mt19937
 * seeded with `seed`).  Returns the number written to out_idx.
 * NOT thread-safe per handle: dedup uses per-handle mutable scratch (the
 * production model is one single-threaded worker process per chunk) —
 * concurrent selects on one htpu_bam* need external serialisation. */
int32_t htpu_bam_select(htpu_bam* b, int32_t ref_id, int64_t start,
                        int64_t stop, int32_t max_reads, uint64_t seed,
                        int32_t* out_idx, int32_t max_out);

/* Create a window engine directly over selected reads of loaded BAMs.
 * bams/n_bams with per-BAM pacbio flags; idx/counts give each BAM's selected
 * read indices (concatenated order: bam0's reads then bam1's). */
htpu_window* htpu_window_create_from_bam(
    htpu_bam** bams, const uint8_t* bam_pacbio, int32_t n_bams,
    const int32_t* idx, const int32_t* counts,
    const char* reference, int64_t ref_len, int64_t window_start,
    int64_t region_start, int64_t region_stop,
    const htpu_params* params);

/* Min reference_start / max reference_end over a selection (for window
 * bounds); returns 0 on empty selection. */
int32_t htpu_bam_selection_bounds(htpu_bam* b, const int32_t* idx, int32_t n,
                                  int64_t* min_start, int64_t* max_end);

/* ---- chunk-level orchestrator ---- */

/* Caller-supplied RNG draw for a read selection (one call per BAM per
 * selection, in driver order — keeps reservoir sampling bit-identical to the
 * Python orchestration). */
typedef uint64_t (*htpu_seed_fn)(void);
/* Reference slice [start, stop) with FastaFile.fetch clamping; writes at most
 * cap bytes into out and returns the number written. */
typedef int64_t (*htpu_ref_fn)(int64_t start, int64_t stop, char* out,
                               int64_t cap);

typedef struct htpu_chunk htpu_chunk;

/* The whole per-chunk candidate pipeline (hotspots -> active regions ->
 * candidate intervals -> assembly -> per-site featurization) in one call.
 * Mirrors hello_tpu/pipeline/{hotspots,candidates}.py exactly (fuzz-verified);
 * see chunk.cpp.  Returns a result handle (never NULL). */
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
    htpu_seed_fn next_seed, htpu_ref_fn ref_fetch);

void htpu_chunk_destroy(htpu_chunk* r);
int64_t htpu_chunk_num_sites(htpu_chunk* r);
const int64_t* htpu_chunk_positions(htpu_chunk* r);  /* [n_sites] */
const int64_t* htpu_chunk_stops(htpu_chunk* r);      /* [n_sites] */
const int32_t* htpu_chunk_nalleles(htpu_chunk* r);   /* [n_sites] */
const int8_t* htpu_chunk_site_labels(htpu_chunk* r); /* [n_sites] */
/* per emitted allele (total = sum(nalleles)), in emission order: */
const char* htpu_chunk_alleles(htpu_chunk* r);       /* \0-joined strings */
int64_t htpu_chunk_alleles_len(htpu_chunk* r);
const int32_t* htpu_chunk_rows0(htpu_chunk* r);
const int32_t* htpu_chunk_rows1(htpu_chunk* r);
const int8_t* htpu_chunk_labels(htpu_chunk* r);
/* feature rows, per allele: rows0 then (hybrid) rows1 rows of
 * [feature_length x channels] uint8 */
const uint8_t* htpu_chunk_features(htpu_chunk* r);
int64_t htpu_chunk_features_len(htpu_chunk* r);

/* Coded emission (htpu_chunk_sites_coded): feature rows are 1-byte cell
 * codes + per-row scalars (the compact wire representation) instead of
 * dense [L x C] bytes — the dense tensor is never materialised.  Same
 * row order as htpu_chunk_features.  htpu_chunk_coded: 1 = coded buffers
 * valid, 0 = dense emission, -1 = a row was not codable (caller must
 * re-run the chunk with the dense entry point; never true of featurizer
 * output). */
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
    htpu_seed_fn next_seed, htpu_ref_fn ref_fetch);
int32_t htpu_chunk_coded(htpu_chunk* r);
const uint8_t* htpu_chunk_codes(htpu_chunk* r);      /* [n_rows x L] */
int64_t htpu_chunk_codes_len(htpu_chunk* r);
const uint8_t* htpu_chunk_scalars(htpu_chunk* r);    /* [n_rows x nscal] */
int64_t htpu_chunk_scalars_len(htpu_chunk* r);

#ifdef __cplusplus
}
#endif

#endif /* HELLO_NATIVE_H */
