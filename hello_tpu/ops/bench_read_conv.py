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


# Modeled HBM traffic of the XLA path, per read row.  Assumption: every
# intermediate activation tensor is written once and read once (XLA fuses
# elementwise/residual adds into the convs but cannot fuse conv->conv), plus
# the uint8 input row read once.  Element counts are the read_convolver's
# intermediates for L=150 (see ops/read_conv.py architecture constants).
_ACT_ELEMS_PER_READ = (
    16 * 148 + 16 * 146 + 32 * 144 + 32 * 71   # stem convs + maxpool out
    + 6 * (32 * 71)                            # 3x RB32 (2 convs each)
    + 3 * (64 * 36)                            # RBConv (conv1, conv2, shortcut)
    + 6 * (64 * 36)                            # 3x RB64
)
FLOPS_PER_READ = 2 * (
    3 * 6 * 16 * 148 + 3 * 16 * 16 * 146 + 3 * 16 * 32 * 144
    + 6 * (3 * 32 * 32 * 71)
    + 3 * 32 * 64 * 36 + 3 * 64 * 64 * 36 + 1 * 32 * 64 * 36
    + 6 * (3 * 64 * 64 * 36)
)   # ~10.2 MFLOP


def hbm_bytes_per_read(act_bytes: int) -> int:
    return 2 * _ACT_ELEMS_PER_READ * act_bytes + 150 * 6


def roofline(tag: str, reads_per_s: float, act_bytes: int,
             hbm_peak_gbs: float, flops_peak_tfs: float,
             model_bw: bool = True):
    fl = reads_per_s * FLOPS_PER_READ / 1e12
    line = (f"  {tag}: {fl:5.2f} TFLOP/s "
            f"({100 * fl / flops_peak_tfs:4.1f}% of {flops_peak_tfs:.0f} peak)")
    if model_bw:   # activation-traffic model applies to the XLA path only
        bw = reads_per_s * hbm_bytes_per_read(act_bytes) / 1e9
        line += (f" | modeled HBM {bw:7.1f} GB/s "
                 f"({100 * bw / hbm_peak_gbs:5.1f}% of {hbm_peak_gbs:.0f} peak)")
    print(line)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--A", type=int, default=512)
    parser.add_argument("--R", type=int, default=128)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--precision", default="default")
    parser.add_argument("--lanes", type=int, default=128,
                        help="kernel lane-block width (multiples of 128)")
    parser.add_argument("--hbm_peak", type=float, default=819.0,
                        help="chip HBM peak GB/s (v5e: 819)")
    parser.add_argument("--flops_peak", type=float, default=394.0,
                        help="chip bf16 peak TFLOP/s (v5e: 394)")
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

    # every timed fn returns a SCALAR: np.asarray on the full [A, 36, 64]
    # output would time the D2H transfer (~10 MB through a ~60 MB/s remote
    # tunnel dwarfs the compute), not the kernel.  The sum still forces the
    # whole reduction to be computed.
    @jax.jit
    def xla_path(reads, mask):
        Ax, Rx, Lx, Cx = reads.shape
        flat = reads.reshape(Ax * Rx, Lx, Cx).astype(jnp.float32)
        frames, _ = net.apply(params["read_conv0"], {}, flat)
        frames = frames.reshape(Ax, Rx, frames.shape[1], frames.shape[2])
        return jnp.sum(masked_read_sum(frames, mask))

    base = timed(xla_path, f"xla ({args.precision})")
    act_bytes = 2 if args.precision == "bf16" else 4
    roofline("xla", A * R / base, act_bytes, args.hbm_peak, args.flops_peak)

    weights = rc.extract_read_conv_weights(net, params["read_conv0"])
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        fn = jax.jit(lambda reads, mask, d=dtype:
                     jnp.sum(rc.fused_read_convolver(reads, mask, weights,
                                                     compute_dtype=d,
                                                     lanes=args.lanes)))
        try:
            t = timed(fn, f"pallas {tag} lanes={args.lanes}")
            print(f"  -> {base / t:.2f}x vs xla")
            roofline(f"pallas {tag}", A * R / t, act_bytes,
                     args.hbm_peak, args.flops_peak, model_bw=False)
        except Exception as exc:
            print(f"pallas {tag}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
