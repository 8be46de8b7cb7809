"""Device-rate A/B for the packed-row read convolution (VERDICT r4 item 7).

Measures the scoring forward at production shapes on the real chip, three
ways over the SAME coded-wire batch (the production input format off-CPU):

  dense-expand : expand_compact -> conv over the full [A, R, L, C] grid
                 (the pre-round-5 wire path)
  packed       : expand_compact_packed -> conv over only the shipped rows
                 + per-allele segment-sum (moe.packed_read_reduce)
  dense-batch  : the dense PaddedBatch path (bench.py's device leg), for
                 cross-checking against the headline number

Occupancy is the lever: the packed path's win is proportional to the padding
fraction of the dense read grid, so reads-per-allele are drawn ragged
(``--reads_lo/--reads_hi``) to reproduce production bucket occupancy (~50-80%)
instead of the constant-depth grid bench.py uses.

Timing rules are bench.py's: rotated device-resident inputs, per-iteration
host readback sync, best median of three spaced windows.

Usage: python -m hello_tpu.ops.bench_packed [--sites 1024] [--precision bf16]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import numpy as np


def build_palette_sites(rng, num_sites, alleles, reads_lo, reads_hi,
                        L=150, C=6):
    """Palette-valid ragged SiteWork (encode_site_work must accept them)."""
    from ..pipeline.batching import SiteWork
    from ..pipeline.compact import (BASE_PALETTE, QUAL_PALETTE,
                                    REF_COLOR_PALETTE)

    sites = []
    for si in range(num_sites):
        start = 1000 + 3 * si
        stop = start + 1
        mid = (start + stop) // 2
        fstart = mid - L // 2
        seg_idx = rng.randint(0, 5, size=L)
        seg = np.eye(5, dtype=np.float32)[seg_idx]
        ref_colors = np.asarray(REF_COLOR_PALETTE, np.uint8)[seg_idx]
        pos = np.arange(L) + fstart
        pos_colors = np.where((pos >= start) & (pos < stop), 240,
                              70).astype(np.uint8)

        def block(num_reads):
            t = np.zeros((num_reads, L, C), np.uint8)
            for r in range(num_reads):
                a = rng.randint(0, L // 2)
                b = rng.randint(a + 10, L)
                t[r, a:b, 0] = BASE_PALETTE[rng.randint(0, 5, size=b - a)]
                t[r, a:b, 1] = ref_colors[a:b]
                t[r, a:b, 2] = QUAL_PALETTE[rng.randint(20, 41, size=b - a)]
                t[r, a:b, 3] = rng.randint(100, 160)
                t[r, a:b, 4] = 70 if rng.rand() < 0.5 else 240
                t[r, a:b, 5] = pos_colors[a:b]
            return t

        t0 = [block(rng.randint(reads_lo, reads_hi + 1))
              for _ in range(alleles)]
        t1 = [block(rng.randint(max(1, reads_lo // 2), reads_hi // 2 + 1))
              for _ in range(alleles)]
        sites.append(SiteWork("chrB", start, stop,
                              [f"a{si}_{i}" for i in range(alleles)],
                              t0, t1, seg))
    return sites


def _timed(fn, params, state, batches, iters, n_sites):
    import jax  # noqa: F401  (sync via np.asarray readback)

    for b in batches:
        np.asarray(fn(params, state, b)[0])        # compile + warm
    best = None
    for rep in range(3):
        if rep:
            time.sleep(2.0)
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            out = fn(params, state, batches[i % len(batches)])
            np.asarray(out[0])
            times.append(time.perf_counter() - t0)
        rate = n_sites / statistics.median(times)
        best = rate if best is None else max(best, rate)
    return best


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sites", type=int, default=1024)
    parser.add_argument("--alleles", type=int, default=2)
    parser.add_argument("--reads_lo", type=int, default=20)
    parser.add_argument("--reads_hi", type=int, default=60)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--precision", default="bf16")
    parser.add_argument("--model", default="hybrid")
    parser.add_argument("--fine_rows", action="store_true",
                        help="bucket the packed row axis finely (4096 steps) "
                        "so shipped rows ~= real rows — the ceiling a "
                        "row-budget batcher would reach (NOT a production "
                        "setting: too many live compile shapes)")
    args = parser.parse_args(argv)

    import jax

    from ..nn import layers
    from ..nn.moe import create_model
    from ..parallel.mesh import enable_compilation_cache
    from ..pipeline.batching import pack_sites
    from ..pipeline.compact import (encode_chunk_sites, expand_compact,
                                    expand_compact_packed, pack_sites_wire)

    enable_compilation_cache()
    layers.set_precision(args.precision)
    model = create_model(args.model)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    def build(seed):
        rng = np.random.RandomState(seed)
        sites = build_palette_sites(rng, args.sites, args.alleles,
                                    args.reads_lo, args.reads_hi)
        coded = encode_chunk_sites(sites)
        assert coded is not None, "sites failed to code"
        row_buckets = (list(range(4096, 300_000, 4096))
                       if args.fine_rows else None)
        wb = pack_sites_wire(coded, hybrid=model.hybrid,
                             row_buckets=row_buckets)
        dense = pack_sites(sites, hybrid=model.hybrid)
        return wb, dense

    wire_batches, dense_batches = [], []
    occ = rows = grid = None
    for k in range(2):
        wb, dense = build(k)
        if k == 0:
            rows = int(wb.wire["codes0"].shape[0]
                       + wb.wire.get("codes1", np.empty((0, 1))).shape[0])
            grid = int(np.prod(dense.read_mask0.shape)
                       + (np.prod(dense.read_mask1.shape)
                          if dense.read_mask1 is not None else 0))
            occ = rows / grid
        wire_batches.append(jax.device_put(wb.wire))
        dense_batches.append(jax.device_put(dense.device_dict()))
    print(f"workload: {args.sites} sites x {args.alleles} alleles, "
          f"shipped rows {rows} / dense grid {grid} "
          f"(occupancy {100 * occ:.0f}%)", file=sys.stderr)

    def fwd(expand):
        @jax.jit
        def f(params, state, batch):
            out, _ = model.apply(params, state, expand(batch), train=False)
            return out["experts"], out["meta"]
        return f

    n = args.sites
    r_packed = _timed(fwd(expand_compact_packed), params, state,
                      wire_batches, args.iters, n)
    r_expand = _timed(fwd(expand_compact), params, state,
                      wire_batches, args.iters, n)
    r_dense = _timed(fwd(lambda b: b), params, state,
                     dense_batches, args.iters, n)
    print(f"packed-row wire : {r_packed:8.0f} windows/s")
    print(f"dense-expand wire: {r_expand:8.0f} windows/s  "
          f"(packed = {r_packed / r_expand:.2f}x)")
    print(f"dense batch      : {r_dense:8.0f} windows/s  "
          f"(packed = {r_packed / r_dense:.2f}x)")


if __name__ == "__main__":
    main()
