"""Pallas TPU kernel: fused read-convolver + masked per-allele reduction.

The read convolver is the hot op of the scoring path: every read row
``[150, C]`` runs through a 15-conv ResNet and the per-read features are then
summed per allele.  The XLA path materialises the per-read feature maps
``[A*R, 36, 64]`` in HBM and runs each small-channel conv as a separate op
with poor MXU lane utilisation (channels 6..64 vs 128 lanes).

This kernel processes one allele slot x one read chunk per grid step, keeping
every intermediate in VMEM and expressing each conv as one im2col matmul
``W[Co, K*Ci] @ X[K*Ci, L*R]`` — the column dimension packs positions x reads,
so MXU lanes stay full regardless of channel width.  The masked sum over reads
happens in-register before anything returns to HBM: per grid step only the
``[64, 36]`` per-allele accumulator is written (revisited-output accumulation
over read chunks; the TPU grid is sequential).

Weight-normalised parameters are folded into effective weights on the host
(`extract_read_conv_weights`).  Numerical parity with the layers path is
asserted in tests (interpret mode ~1e-5; on hardware the Mosaic MXU runs
matmuls in bf16 passes, giving XLA-default-precision-class accuracy — full
hybrid-model A/B on a v5e measured max sigmoid-probability difference 0.009
vs the XLA bf16 path).

ROOFLINE (measured on a v5e via ops/bench_read_conv.py, exclusive chip,
scalar-sync timing, A=512 x R=128 == A=1024 x R=64 == 65536 read rows):

  | path               | time    | TFLOP/s (peak 394) | modeled HBM GB/s (peak 819) |
  |--------------------|---------|--------------------|-----------------------------|
  | XLA bf16 act       | 48.4 ms | 13.8  (3.5%)       | 250  (30%)                  |
  | fused kernel f32   | 69.6 ms |  9.6  (2.4%)       | ~0 (VMEM-resident)          |
  | fused kernel bf16  | 81.6 ms |  8.2  (2.1%)       | ~0                          |
  (HBM model: every inter-conv activation written+read once, u8 input read
  once — 2 x 45,952 elements x act bytes + 900 per read; FLOPs: 10.2 MFLOP
  per read summed over the 17 convs.)

CONCLUSION — the earlier "HBM-bandwidth-bound" claim is REFUTED for the
production bf16-activation mode: XLA achieves only ~30% of peak bandwidth
and ~3.5% MFU, so neither roof binds.  The real bound is MXU tile
granularity: output channels are 16..64 against the MXU's 128 rows and
contractions are K=48..192 against its 128-lane depth, capping even a
perfect schedule near (M/128)x(K/128ceil) ~ 12-38% MFU for this network
(fixed by the reference checkpoints we must convert).  XLA's per-conv
kernels reach ~10% of that structural ceiling; the fused kernel recovers
lane occupancy and eliminates HBM traffic but pays more than that back in
Mosaic relayout/revisit overhead (~8% of its own ceiling).  In f32-activation
mode the picture flips: XLA's traffic doubles (f32-era measurement: XLA
212 ms vs kernel 151 ms at A=512 x R=128 — 1.40x for the kernel).

STATUS: the kernel auto-enables ONLY for f32-activation precisions
("default"/"highest"), for read buckets that are multiples of 128; the
production bf16 default takes the XLA path everywhere
(enable_pallas_read_convs; HELLO_TPU_PALLAS=0/1 forces).  For R < 128 an
allele-slot-packing variant (G = 128//R slots side by side, mask-matrix
reduction) exists and is numerically verified but loses to XLA in all
modes; pre-packing the lane layout outside the timed region does not close
the gap, so the loss is intrinsic to the packed schedule's small revisited
matmuls, not the input relayout.

POST-SCRIPT (round 5) — the lever that did move the device rate in bf16 is
not a kernel but a BATCHING change: the packed-row XLA path
(moe.packed_read_reduce — conv over only the shipped coded-wire rows +
segment-sum) wins exactly when its row axis is tightly packed.  Measured on
a v5e at 1024 sites x 2 alleles (ops/bench_packed.py): with the default
{cap/4, cap/2, cap} row-bucket ladder rounding ~62% occupancy up to cap,
packed = 0.92-0.94x of the dense-grid path (pure overhead); with rows
tightly bucketed (--fine_rows) packed = 12,758 w/s = 1.24x over the
dense-expanded wire path and 1.11x over the dense-batch path.  Production
therefore row-budgets coded batches to land in the cap/2 ladder step with
high occupancy (pipeline/batching.row_budgets_for_class) instead of paying
a deep ladder's compile-shape count — the FLOP skip comes from shipping
and convolving fewer rows, which no Mosaic schedule was needed for.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn import layers as L

# architecture constants (read_convolver for feature_length=150)
L_IN = 150
L_POOL = 71    # after 3 valid convs (->144) + maxpool k3 s2
L_OUT = 36     # after the stride-2 residual block
C_MID = 32
C_OUT = 64


def _conv2d_mat(w, b):
    """[K, Ci, Co] HIO -> (W2d [Co, K*Ci], b [Co]) matching im2col row order."""
    K, Ci, Co = w.shape
    w2 = jnp.transpose(w, (2, 0, 1)).reshape(Co, K * Ci)
    return w2, b


def _effective_conv(layer, p):
    if isinstance(layer, L.WeightNormedConv1d):
        v = p["v"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = p["g"] * v / norm
    else:
        w = p["w"]
    return _conv2d_mat(w, p["b"])


def extract_read_conv_weights(seq: L.Sequential, params) -> List[jnp.ndarray]:
    """Flatten the read-convolver parameters into the kernel's argument order.

    Order: stem conv1..3; 3x RB_FT(32) (2 convs each); RB_Conv (conv1, conv2,
    shortcut); 3x RB_FT(64).  Returns [w1, b1, w2, b2, ...] as 2-D/1-D arrays.
    """
    out: List[jnp.ndarray] = []

    def add(layer, p):
        w, b = _effective_conv(layer, p)
        out.extend([w, b])

    li = 0
    convs_seen = 0
    for i, layer in enumerate(seq.layers):
        p = params.get(str(i), {})
        if isinstance(layer, (L.Conv1d,)):  # includes WeightNormedConv1d
            add(layer, p)
            convs_seen += 1
        elif isinstance(layer, L.ResidualBlock):
            for j, sub in enumerate(layer.ff.layers):
                if isinstance(sub, L.Conv1d):
                    add(sub, p["ff"][str(j)])
            for j, sub in enumerate(layer.sh.layers):
                if isinstance(sub, L.Conv1d):
                    add(sub, p["sh"][str(j)])
    return out


def _im2col_valid(x, k):
    """[C, L, R] -> [k*C, (L-k+1)*R] for a valid (pad 0, stride 1) k-conv."""
    C, Lx, R = x.shape
    Lo = Lx - k + 1
    rows = [x[:, i:i + Lo, :].reshape(C, Lo * R) for i in range(k)]
    return jnp.concatenate(rows, axis=0)


def _conv_valid(x, w, b, k=3):
    C, Lx, R = x.shape
    Lo = Lx - k + 1
    X = _im2col_valid(x, k)
    y = jnp.dot(w, X, preferred_element_type=jnp.float32) + b[:, None]
    return jax.nn.relu(y).astype(x.dtype).reshape(w.shape[0], Lo, R)


def _pad_l(x, left=1, right=1):
    C, Lx, R = x.shape
    parts = []
    if left:
        parts.append(jnp.zeros((C, left, R), x.dtype))
    parts.append(x)
    if right:
        parts.append(jnp.zeros((C, right, R), x.dtype))
    return jnp.concatenate(parts, axis=1)


def _every2(x, start, count):
    """x[:, start:start+2*count:2, :] without strided slicing (Mosaic lowers
    3-D strided slices to unsupported gathers): slice, reshape pairs, take
    the even member."""
    C, Lx, R = x.shape
    sl = x[:, start:start + 2 * count, :]
    return sl.reshape(C, count, 2, R)[:, :, 0, :]


def _conv_same(x, w, b, relu=True):
    """k3 pad1 stride1 conv."""
    C, Lx, R = x.shape
    xp = _pad_l(x)
    X = _im2col_valid(xp, 3)
    y = jnp.dot(w, X, preferred_element_type=jnp.float32) + b[:, None]
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype).reshape(w.shape[0], Lx, R)


def _conv_stride2(x, w, b):
    """k3 pad1 stride2 conv: L -> (L+2-3)//2+1."""
    C, Lx, R = x.shape
    Lo = (Lx + 2 - 3) // 2 + 1
    # pad one extra on the right so every _every2 window fits
    xp = _pad_l(x, 1, 2)
    rows = [_every2(xp, i, Lo).reshape(C, Lo * R) for i in range(3)]
    X = jnp.concatenate(rows, axis=0)
    y = jnp.dot(w, X, preferred_element_type=jnp.float32) + b[:, None]
    return jax.nn.relu(y).astype(x.dtype).reshape(w.shape[0], Lo, R)


def _maxpool3s2(x):
    C, Lx, R = x.shape
    Lo = (Lx - 3) // 2 + 1
    xp = _pad_l(x, 0, 3)  # slack so every _every2 window fits
    a = _every2(xp, 0, Lo)
    b = _every2(xp, 1, Lo)
    c = _every2(xp, 2, Lo)
    return jnp.maximum(jnp.maximum(a, b), c)


def _stem_block(x, weights):
    """Stem: 3 valid convs + maxpool. [C_in, 150, R] -> [32, 71, R]."""
    w1, b1, w2, b2, w3, b3 = weights[:6]
    x = _conv_valid(x, w1, b1)                     # 16 x 148
    x = _conv_valid(x, w2, b2)                     # 16 x 146
    x = _conv_valid(x, w3, b3)                     # 32 x 144
    return _maxpool3s2(x)                          # 32 x 71

def _residual_block_stack(x, weights):
    """Residual stacks after the pool: [32, 71, R] -> [64, 36, R]."""
    wi = iter(range(0, len(weights), 2))

    def nxt():
        i = next(wi)
        return weights[i], weights[i + 1]

    # 3x RB_FT(32)
    for _ in range(3):
        w1, b1 = nxt(); w2, b2 = nxt()
        y = _conv_same(x, w1, b1)
        y = _conv_same(y, w2, b2)
        x = x + y
    # RB_Conv 32->64 stride 2
    w1, b1 = nxt(); w2, b2 = nxt(); ws, bs = nxt()
    y = _conv_stride2(x, w1, b1)                   # 64 x 36
    y = _conv_same(y, w2, b2)
    # shortcut: 1x1 stride-2 conv (no activation)
    C, Lx, R = x.shape
    Lo = y.shape[1]
    xs = _every2(_pad_l(x, 0, 1), 0, Lo).reshape(C, Lo * R)
    sc = (jnp.dot(ws, xs, preferred_element_type=jnp.float32)
          + bs[:, None]).astype(x.dtype).reshape(ws.shape[0], Lo, R)
    x = y + sc
    # 3x RB_FT(64)
    for _ in range(3):
        w1, b1 = nxt(); w2, b2 = nxt()
        y = _conv_same(x, w1, b1)
        y = _conv_same(y, w2, b2)
        x = x + y
    return x


def _stem_kernel(reads_ref, *rest, compute_dtype, num_weights):
    weight_refs = rest[:num_weights]
    out_ref = rest[num_weights]
    # reads arrive pre-transposed [1, C, L, Rc] so no in-kernel relayout
    # (Mosaic: u8 -> i32 -> float)
    x = reads_ref[0].astype(jnp.int32).astype(compute_dtype)
    weights = [w[...].astype(compute_dtype) if w.ndim == 2 else w[...]
               for w in weight_refs]
    out_ref[0, 0] = _stem_block(x, weights).astype(out_ref.dtype)


def _tail_kernel(stem_ref, maskmat_ref, *rest, compute_dtype, num_weights):
    weight_refs = rest[:num_weights]
    out_ref = rest[num_weights]
    rc = pl.program_id(1)
    x = stem_ref[0, 0].astype(compute_dtype)       # [32, 71, lanes]
    weights = [w[...].astype(compute_dtype) if w.ndim == 2 else w[...]
               for w in weight_refs]
    feats = _residual_block_stack(x, weights)      # [64, 36, lanes]
    lanes = feats.shape[2]
    mm = maskmat_ref[0, 0].astype(jnp.float32)     # [lanes, G]
    # masked per-slot reduction as one contraction over the lane dim
    reduced = jax.lax.dot_general(
        feats.astype(jnp.float32).reshape(C_OUT * feats.shape[1], lanes), mm,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    reduced = reduced.reshape(C_OUT, feats.shape[1], mm.shape[1])

    @pl.when(rc == 0)
    def _():
        out_ref[0] = reduced

    @pl.when(rc > 0)
    def _():
        out_ref[0] = out_ref[0] + reduced


def _lane_geometry(R: int, lanes: int):
    """(G, n_chunks) for a read-bucket width R at the kernel lane width."""
    if R % lanes == 0:
        return 1, R // lanes
    if lanes % R == 0:
        return lanes // R, 1
    raise ValueError(f"R={R} incompatible with lane width {lanes}")


def pack_reads_for_kernel(reads, lanes: int = 128):
    """[A, R, L, C] (any dtype) -> kernel lane layout [B, C, L, lanes*n_chunks].

    This is the relayout the fused kernel needs (reads transposed so the read
    axis is minor, G = lanes//R allele slots grouped into the lane dim).  It
    can run in XLA on device (jnp input) or — preferably — on the host in
    numpy at batch-assembly time, where it is a cheap memory copy instead of
    a device transpose op on the critical path."""
    xp = jnp if isinstance(reads, jax.Array) else np
    A, R, Lx, C = reads.shape
    G, n_chunks = _lane_geometry(R, lanes)
    pad_a = (-A) % G
    if pad_a:
        reads = xp.concatenate(
            [reads, xp.zeros((pad_a,) + reads.shape[1:], reads.dtype)])
    B = (A + pad_a) // G
    t = xp.transpose(reads, (0, 3, 2, 1))          # [Ap, C, L, R]
    if G > 1:
        t = t.reshape(B, G, C, Lx, R).transpose(0, 2, 3, 1, 4) \
             .reshape(B, C, Lx, G * R)
    if xp is np:
        t = np.ascontiguousarray(t)
    return t


def fused_read_convolver(reads: jax.Array, read_mask: jax.Array,
                         weights: Sequence[jax.Array],
                         compute_dtype=jnp.float32,
                         lanes: int = 128) -> jax.Array:
    """Fused read-convolver + masked reduction.

    reads: [A, R, 150, C] uint8; read_mask: [A, R]; weights: flattened
    effective conv weights (extract_read_conv_weights order).
    Returns reduced per-allele frames [A, 36, 64] float32 (NWC).

    The kernel's lane dimension is always ``lanes`` (128 on hardware — Mosaic
    only merges reshapes whose minor dim is the full 128-lane width):
    ``R >= lanes`` splits reads into ``R // lanes`` revisited-output chunks;
    ``R < lanes`` packs ``G = lanes // R`` allele slots side by side into the
    lane dim, with the per-slot masked reduction expressed as one
    ``[C*L, lanes] @ [lanes, G]`` contraction against a block-diagonal mask
    matrix.  ``lanes`` is parameterised only for interpret-mode tests."""
    reads_t = pack_reads_for_kernel(reads, lanes)
    return fused_read_convolver_packed(reads_t, read_mask, weights,
                                       compute_dtype=compute_dtype,
                                       lanes=lanes)


def fused_read_convolver_packed(reads_t: jax.Array, read_mask: jax.Array,
                                weights: Sequence[jax.Array],
                                compute_dtype=jnp.float32,
                                lanes: int = 128) -> jax.Array:
    """Fused kernel on pre-packed reads (see ``pack_reads_for_kernel``).

    reads_t: [B, C, L, lanes*n_chunks]; read_mask: [A, R] with the ORIGINAL
    (unpacked) allele/read axes — it defines A and R."""
    A, R = read_mask.shape
    G, n_chunks = _lane_geometry(R, lanes)
    B, C, Lx, _ = reads_t.shape
    assert Lx == L_IN, f"feature length {Lx} != {L_IN}"
    pad_a = (-A) % G
    if pad_a:
        read_mask = jnp.concatenate(
            [read_mask, jnp.zeros((pad_a, R), read_mask.dtype)])
    Ap = A + pad_a
    assert B == Ap // G, (B, Ap, G)

    stem_weights = list(weights[:6])
    tail_weights = list(weights[6:])

    def weight_specs(ws):
        specs = []
        for w in ws:
            if w.ndim == 2:
                specs.append(pl.BlockSpec(
                    w.shape, (lambda a, rc: (0, 0)), memory_space=pltpu.VMEM))
            else:
                specs.append(pl.BlockSpec(
                    w.shape, (lambda a, rc: (0,)), memory_space=pltpu.VMEM))
        return specs

    inter_dtype = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32

    # mask matrix [B, n_chunks, lanes, G]: column g selects slot g's reads
    m3 = read_mask.astype(jnp.float32).reshape(B, G, n_chunks, lanes // G)
    eye = jnp.eye(G, dtype=jnp.float32)
    maskmat = jnp.einsum("bgnr,gh->bngrh", m3, eye) \
                 .reshape(B, n_chunks, lanes, G)

    # stage 1: stem + pool -> [B, n_chunks, 32, 71, lanes]
    stem = pl.pallas_call(
        functools.partial(_stem_kernel, compute_dtype=compute_dtype,
                          num_weights=len(stem_weights)),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, C, L_IN, lanes), lambda a, rc: (a, 0, 0, rc),
                         memory_space=pltpu.VMEM),
        ] + weight_specs(stem_weights),
        out_specs=pl.BlockSpec((1, 1, C_MID, L_POOL, lanes),
                               lambda a, rc: (a, rc, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks, C_MID, L_POOL, lanes),
                                       inter_dtype),
    )(reads_t, *stem_weights)

    # stage 2: residual stacks + masked reduction -> [B, 64, 36, G]
    out = pl.pallas_call(
        functools.partial(_tail_kernel, compute_dtype=compute_dtype,
                          num_weights=len(tail_weights)),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, C_MID, L_POOL, lanes),
                         lambda a, rc: (a, rc, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes, G), lambda a, rc: (a, rc, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs(tail_weights),
        out_specs=pl.BlockSpec((1, C_OUT, L_OUT, G), lambda a, rc: (a, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C_OUT, L_OUT, G), jnp.float32),
    )(stem, maskmat, *tail_weights)
    # [B, 64, 36, G] -> [A, 36, 64] (NWC convention of the rest of the model)
    out = jnp.transpose(out, (0, 3, 2, 1)).reshape(Ap, L_OUT, C_OUT)
    return out[:A]


# expected per-conv (C_out, K*C_in/C_in_factor) shapes of the standard
# width-1 read_convolver, with the stem's first conv checked separately
# (its K depends on the 6/7 input channels)
_EXPECTED_TAIL_SHAPES = [
    (16, 48), (32, 48),                       # stem convs 2-3
    (32, 96), (32, 96), (32, 96), (32, 96), (32, 96), (32, 96),  # 3x RB32
    (64, 96), (64, 192), (64, 32),            # RBConv + shortcut
    (64, 192), (64, 192), (64, 192), (64, 192), (64, 192), (64, 192),  # 3x RB64
]


def _topology_matches(seq) -> bool:
    """The kernel hardcodes conv->ReLU with no norm layers: accept ONLY the
    weight-normed read_convolver's layer classes (a Softplus/LayerNorm or
    BatchNorm variant can have identical conv shapes but different math —
    silently wrong results if the shape check alone gated the kernel)."""
    def ok_layers(layers):
        for layer in layers:
            cls = type(layer).__name__
            if cls == "ResidualBlock":
                if not (ok_layers(layer.ff.layers) and ok_layers(layer.sh.layers)):
                    return False
            elif cls not in ("WeightNormedConv1d", "ReLU", "MaxPool1d", "Noop"):
                return False   # norm layers / other activations: XLA path
        return True
    return ok_layers(seq.layers)


def supports_network(model, params, name: str) -> bool:
    """Whether `name` is a standard width-1 weight-normed read_convolver the
    fused kernel can run (wide/addendum/layer_norm/batch-norm variants fall
    back to the XLA path)."""
    try:
        if not _topology_matches(model.nets[name]):
            return False
        weights = extract_read_conv_weights(model.nets[name], params[name])
    except Exception:
        return False
    mats = [w for w in weights if w.ndim == 2]
    if len(mats) != 1 + len(_EXPECTED_TAIL_SHAPES):
        return False
    if mats[0].shape[0] != 16 or mats[0].shape[1] not in (18, 21):
        return False
    return all(tuple(m.shape) == s
               for m, s in zip(mats[1:], _EXPECTED_TAIL_SHAPES))


def enable_pallas_read_convs(model, params, use_pallas=None) -> tuple:
    """Tag `model` so inference uses the fused kernel for each supported
    read-convolver.  ``use_pallas=None`` auto-enables on non-CPU backends
    ONLY in f32-activation modes ("default"/"highest"): with bf16
    activations (the production default) XLA's path halves its HBM traffic
    and beats the kernel at every bucket (v5e, A=512 x R=128: XLA 48.4 ms vs
    kernel 69.6 ms — see the roofline in the module docstring), while in f32
    modes the kernel's VMEM-resident schedule wins 1.40x.
    HELLO_TPU_PALLAS=0/1 forces off/on.  Returns the enabled network names."""
    import os

    env = os.environ.get("HELLO_TPU_PALLAS", "")
    if env in ("0", "1"):
        use_pallas = env == "1"
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform not in ("cpu",)
                      and L.ACT_DTYPE is None)
    names = ()
    if use_pallas:
        names = tuple(name for name in ("read_conv0", "read_conv1")
                      if model.nets.get(name) is not None
                      and supports_network(model, params, name))
    model.pallas_read_convs = names
    return names


def reduced_read_frames_pallas(model, params, name: str, reads, read_mask,
                               compute_dtype=jnp.float32):
    """Drop-in replacement for read_conv + masked_read_sum for a standard
    read-convolver network (`name` in {"read_conv0", "read_conv1"})."""
    weights = extract_read_conv_weights(model.nets[name], params[name])
    return fused_read_convolver(reads, read_mask, weights,
                                compute_dtype=compute_dtype)
