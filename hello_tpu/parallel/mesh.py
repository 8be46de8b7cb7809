"""Device mesh and sharding utilities.

The model is small (~10M params), so the parallelism story is pure data
parallel (matching the reference's DDP over NCCL,
reference MixtureOfExpertsDNNFastDistributed.py:928-930): weights replicated,
batches sharded over a 1-axis ``data`` mesh, gradients psum-reduced over ICI.
Genome-scale inference additionally shards *regions* across hosts
(deterministic assignment by process index) — that part needs no collectives
until the final VCF merge.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def enable_compilation_cache(path: Optional[str] = None):
    """Enable the persistent XLA compilation cache so the one-time compile of
    each padded-batch bucket shape is paid once per machine, not once per
    process/run.  Opt out with HELLO_TPU_COMPILE_CACHE=0."""
    import os

    env = os.environ.get("HELLO_TPU_COMPILE_CACHE", "")
    if env == "0":
        return
    if env == "1":     # plain enable (mirrors the other HELLO_TPU_* flags),
        env = ""       # not a directory literally named "1"
    cache_dir = path or env or os.path.expanduser("~/.cache/hello_tpu_xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile, however quick (our buckets are many + small)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # cache is an optimisation; never fail a run over it
        pass


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-axis data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (device) axis of stacked batches over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_regions(regions: Sequence[Tuple[str, int, int]], process_index: int,
                  process_count: int, granularity: int = 0) -> list:
    """Deterministic round-robin region assignment for multi-host inference.

    Every host computes the same global ordering and takes its slice — no
    coordination needed (the reference shards analogously by handing
    different shard files to different worker processes).

    ``granularity`` > 0 splits regions into granule-sized pieces before the
    round robin, so hosts get near-equal base counts even when region sizes
    are wildly uneven (human chr1 is 5.4x chr21; whole-chromosome round
    robin would idle hosts).  Pieces inherit the chunked-calling semantics
    the per-host worker pool already uses, and the final VCF merge sorts, so
    piece boundaries behave exactly like worker chunk boundaries."""
    if granularity > 0:
        regions = list(split_regions(regions, granularity))
    ordered = sorted(regions)
    return [r for i, r in enumerate(ordered) if i % process_count == process_index]


def split_regions(regions: Sequence[Tuple[str, int, int]], size: int):
    """Split regions into at-most-``size``-base pieces (the single region
    splitter behind both worker chunking and granular host sharding)."""
    for chrom, start, stop in regions:
        pos = start
        while pos < stop:
            end = min(pos + size, stop)
            yield (chrom, pos, end)
            pos = end
