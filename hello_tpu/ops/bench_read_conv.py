"""Measure the fused Pallas read-convolver against the XLA path on the real
chip (honest timing: rotated device-resident inputs + per-iteration host
readback, per the remote-tunnel rules in bench.py).

Usage: python -m hello_tpu.ops.bench_read_conv [--A 512] [--R 128] [--iters 8]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--A", type=int, default=512)
    parser.add_argument("--R", type=int, default=128)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--precision", default="default")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ..nn import layers as L
    from ..nn.moe import create_model, masked_read_sum
    from ..ops import read_conv as rc

    L.set_precision(args.precision)
    model = create_model("illumina")
    params, _ = model.init(jax.random.PRNGKey(0))
    net = model.nets["read_conv0"]
    A, R = args.A, args.R

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(2):
        reads = rng.randint(0, 255, size=(A, R, 150, 6)).astype(np.uint8)
        mask = (rng.rand(A, R) < 0.8).astype(np.float32)
        batches.append((jax.device_put(reads), jax.device_put(mask)))
    params = jax.device_put(params)

    def timed(fn, tag):
        for b in batches:
            np.asarray(fn(*b))          # compile + warm
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*batches[i % 2])
            np.asarray(out)             # force true completion
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        print(f"{tag:30s} {med * 1e3:8.2f} ms  ({A * R / med / 1e6:.2f} Mreads/s)")
        return med

    @jax.jit
    def xla_path(reads, mask):
        Ax, Rx, Lx, Cx = reads.shape
        flat = reads.reshape(Ax * Rx, Lx, Cx).astype(jnp.float32)
        frames, _ = net.apply(params["read_conv0"], {}, flat)
        frames = frames.reshape(Ax, Rx, frames.shape[1], frames.shape[2])
        return masked_read_sum(frames, mask)

    base = timed(xla_path, f"xla ({args.precision})")

    weights = rc.extract_read_conv_weights(net, params["read_conv0"])
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        fn = jax.jit(lambda reads, mask, d=dtype:
                     rc.fused_read_convolver(reads, mask, weights,
                                             compute_dtype=d))
        try:
            t = timed(fn, f"pallas {tag}")
            print(f"  -> {base / t:.2f}x vs xla")
        except Exception as exc:
            print(f"pallas {tag}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
