"""Config-driven functional network builder for JAX/TPU.

The reference framework declares networks as lists of ``{"type": ..., "kwargs": ...}``
dicts interpreted onto torch.nn modules (reference python/NNTools.py:633-657).  We keep
the same declarative config format — so architecture configs and trained checkpoints
translate mechanically — but interpret it into *functional* JAX layers:

  * activations are laid out ``[batch, length, channels]`` (NWC — the TPU-native
    convolution layout), not torch's NCW;
  * parameters are plain pytrees (nested dicts of jnp arrays);
  * batch-norm statistics live in a separate ``state`` pytree threaded through
    ``apply`` so the whole network stays a pure function;
  * everything composes under ``jax.jit`` / ``pjit`` with static shapes.

Output-length semantics for convolution / pooling follow the torch formula
``L_out = floor((L + 2p - d*(k-1) - 1)/s) + 1`` so that layer stacks produce the
same shapes as the reference architectures.

Layer protocol::

    params, state, out_shape = layer.init(key, in_shape)
    y, new_state = layer.apply(params, state, x, train=False, rng=None)

``in_shape``/``out_shape`` exclude the batch dimension: ``(L, C)`` for sequence
activations, ``(C,)`` for vectors, or a tuple of shapes for multi-input layers.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_EPS_BN = 1e-5

#: Matmul/conv precision. "highest" gives float32-accurate MXU passes (needed
#: for VCF-level parity with the CPU reference); "default" allows bf16 MXU
#: passes for maximum throughput; "bf16" additionally carries conv activations
#: in bfloat16 (the read-conv stack is HBM-bandwidth-bound at its small
#: channel widths, so halving the materialised intermediates is the dominant
#: win; MXU accumulation stays f32 and Linear outputs — the expert logits —
#: stay f32).  Switch with set_precision().
PRECISION = "highest"

#: Conv activation dtype; None keeps float32 activations.
ACT_DTYPE = None


def set_precision(precision: str):
    """Set global matmul/conv precision: 'highest' (fp32 parity), 'default'
    (bf16 MXU passes), or 'bf16' (bf16 MXU passes + bf16 conv activations)."""
    global PRECISION, ACT_DTYPE
    assert precision in ("highest", "default", "high", "bf16")
    ACT_DTYPE = jnp.bfloat16 if precision == "bf16" else None
    PRECISION = "default" if precision == "bf16" else precision


def _conv_in(x):
    """Cast conv inputs to the activation dtype (no-op in f32 modes)."""
    if ACT_DTYPE is not None and x.dtype == jnp.float32:
        return x.astype(ACT_DTYPE)
    return x


def _conv_out(y):
    """Cast the f32-accumulated conv output back to the activation dtype."""
    if ACT_DTYPE is not None:
        return y.astype(ACT_DTYPE)
    return y


def _split(key, n):
    return jax.random.split(key, n)


def kaiming_uniform(key, shape, fan_in):
    """torch-style default init for conv/linear weights: U(-b, b), b = 1/sqrt(fan_in)*sqrt(3)*gain.

    torch uses kaiming_uniform_(a=sqrt(5)) which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    scaled by sqrt(3)*gain with gain=1/sqrt(3) -> bound = 1/sqrt(fan_in).
    """
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def conv_out_len(length, kernel, padding, dilation, stride):
    return (length + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


class Layer:
    """Base layer: stateless identity."""

    def init(self, key, in_shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, train=False, rng=None):
        return x, state


class Noop(Layer):
    # accepts and ignores arguments, like the reference's Noop placeholder
    # (NNTools.py:586-592) which is configured with num_features in place of
    # a norm layer to keep Sequential indices aligned
    def __init__(self, *args, **kwargs):
        pass


class Conv1d(Layer):
    """1-D convolution over NWC activations; weights stored HIO ``[K, Cin/groups, Cout]``."""

    def __init__(self, in_channels, out_channels, kernel_size, padding=0, dilation=1,
                 stride=1, groups=1, bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.padding = padding
        self.dilation = dilation
        self.stride = stride
        self.groups = groups
        self.use_bias = bias

    def init(self, key, in_shape):
        L, C = in_shape
        assert C == self.in_channels, f"Conv1d expects {self.in_channels} channels, got {C}"
        k1, k2 = _split(key, 2)
        fan_in = self.in_channels // self.groups * self.kernel_size
        w = kaiming_uniform(k1, (self.kernel_size, self.in_channels // self.groups,
                                 self.out_channels), fan_in)
        params = {"w": w}
        if self.use_bias:
            params["b"] = kaiming_uniform(k2, (self.out_channels,), fan_in)
        out_l = conv_out_len(L, self.kernel_size, self.padding, self.dilation, self.stride)
        return params, {}, (out_l, self.out_channels)

    def _conv(self, x, w, train=False):
        x = _conv_in(x)
        # Inference accumulates into f32 outputs (the precision-sweep
        # evidence was gathered with this).  bf16-activation TRAINING keeps
        # the conv output in bf16 instead: jax's conv transpose refuses the
        # mixed (f32 cotangent x bf16 weight) case the f32 accumulation
        # would create in the backward pass.
        preferred = jnp.float32
        if train and ACT_DTYPE is not None and x.dtype == ACT_DTYPE:
            preferred = None
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
            preferred_element_type=preferred,
            precision=PRECISION,
        )

    def apply(self, params, state, x, train=False, rng=None):
        y = self._conv(x, params["w"], train=train)
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        return _conv_out(y), state


class WeightNormedConv1d(Conv1d):
    """Weight-normalised Conv1d: ``w = g * v / ||v||`` with the norm taken per
    output channel over (kernel, in-channel) — matching torch weight_norm over
    Conv1d.weight dims (1, 2) (reference NNTools.WeightNormedConv1d)."""

    def init(self, key, in_shape):
        params, state, out_shape = super().init(key, in_shape)
        v = params.pop("w")
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))  # [Cout]
        params["v"] = v
        params["g"] = norm  # torch init: g = ||v||
        return params, state, out_shape

    def apply(self, params, state, x, train=False, rng=None):
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = params["g"] * v / norm
        y = self._conv(x, w, train=train)
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        return _conv_out(y), state


class Linear(Layer):
    """Dense layer; weight stored ``[in, out]``."""

    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias

    def init(self, key, in_shape):
        assert in_shape[-1] == self.in_features, \
            f"Linear expects {self.in_features} features, got {in_shape}"
        k1, k2 = _split(key, 2)
        w = kaiming_uniform(k1, (self.in_features, self.out_features), self.in_features)
        params = {"w": w}
        if self.use_bias:
            params["b"] = kaiming_uniform(k2, (self.out_features,), self.in_features)
        return params, {}, in_shape[:-1] + (self.out_features,)

    def apply(self, params, state, x, train=False, rng=None):
        y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32, precision=PRECISION)
        if self.use_bias:
            y = y + params["b"]
        return y, state


class WeightNormedLinear(Linear):
    """Weight-normalised Linear; norm per output feature over input dim."""

    def init(self, key, in_shape):
        params, state, out_shape = super().init(key, in_shape)
        v = params.pop("w")
        norm = jnp.sqrt(jnp.sum(v * v, axis=0))
        params["v"] = v
        params["g"] = norm
        return params, state, out_shape

    def apply(self, params, state, x, train=False, rng=None):
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        w = params["g"] * v / norm
        y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=PRECISION)
        if self.use_bias:
            y = y + params["b"]
        return y, state


# Row mask for train-mode BatchNorm statistics: padded batch rows (allele
# slot / read padding) must not contaminate batch mean/var (CLAUDE.md:
# "padding must stay provably inert").  Set around a network apply (it is a
# trace-time Python global, so it simply becomes part of the traced graph);
# None = plain unmasked statistics.  Eval-mode BN uses running stats and is
# padding-inert regardless.
_BN_BATCH_MASK = None


def set_bn_batch_mask(mask):
    global _BN_BATCH_MASK
    _BN_BATCH_MASK = mask


class BatchNorm1d(Layer):
    """BatchNorm over the channel axis (last axis in NWC).

    Normalises per channel over (batch, length) for 3-D inputs or (batch,) for
    2-D inputs.  ``state`` holds running mean / var (biased normalisation,
    unbiased running update — torch semantics, momentum 0.1).  Train-mode
    statistics honour ``set_bn_batch_mask`` (weighted over real rows only).
    """

    def __init__(self, num_features, momentum=0.1, eps=_EPS_BN):
        self.num_features = num_features
        self.momentum = momentum
        self.eps = eps

    def init(self, key, in_shape):
        params = {
            "gamma": jnp.ones((self.num_features,), jnp.float32),
            "beta": jnp.zeros((self.num_features,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }
        return params, state, in_shape

    def apply(self, params, state, x, train=False, rng=None):
        axes = tuple(range(x.ndim - 1))
        mask = _BN_BATCH_MASK
        if train and mask is not None and mask.shape[0] == x.shape[0]:
            # weighted statistics over real rows only (mask [B] in {0,1});
            # each row contributes x.shape[1] positions for 3-D activations
            m = mask.astype(jnp.float32)
            mb = m.reshape((-1,) + (1,) * (x.ndim - 1))
            per_row = float(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1.0
            count = jnp.maximum(jnp.sum(m) * per_row, 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * mb, axis=axes) / count
            var = jnp.sum(jnp.square(xf - mean) * mb, axis=axes) / count
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        elif train:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = np.prod([x.shape[a] for a in axes]) if x.ndim > 1 else x.shape[0]
            unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        if x.dtype != jnp.float32:
            # fold into one scale/shift computed in f32, applied in x's dtype
            # so bf16 activations stay bf16 (no f32 promotion between convs)
            rs = jax.lax.rsqrt(var + self.eps) * params["gamma"]
            y = x * rs.astype(x.dtype) + (params["beta"] - mean * rs).astype(x.dtype)
        else:
            y = (x - mean) * jax.lax.rsqrt(var + self.eps) * params["gamma"] \
                + params["beta"]
        return y, new_state


class LayerNormModule(Layer):
    """LayerNorm over channels (last axis) — reference NNTools.LayerNormModule."""

    def __init__(self, num_features, eps=1e-5):
        self.num_features = num_features
        self.eps = eps

    def init(self, key, in_shape):
        params = {
            "gamma": jnp.ones((self.num_features,), jnp.float32),
            "beta": jnp.zeros((self.num_features,), jnp.float32),
        }
        return params, {}, in_shape

    def apply(self, params, state, x, train=False, rng=None):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params["gamma"] + params["beta"], state


class ReLU(Layer):
    def apply(self, params, state, x, train=False, rng=None):
        return jax.nn.relu(x), state


class ELU(Layer):
    def __init__(self, alpha=1.0):
        self.alpha = alpha

    def apply(self, params, state, x, train=False, rng=None):
        return jax.nn.elu(x, self.alpha), state


class SELU(Layer):
    def apply(self, params, state, x, train=False, rng=None):
        return jax.nn.selu(x), state


class Sigmoid(Layer):
    def apply(self, params, state, x, train=False, rng=None):
        return jax.nn.sigmoid(x), state


class Softplus(Layer):
    """torch.nn.Softplus equivalent (used by the layer_norm model config)."""

    def __init__(self, beta=1.0, threshold=20.0):
        self.beta = beta
        self.threshold = threshold

    def apply(self, params, state, x, train=False, rng=None):
        # torch switches to the linear identity above threshold for stability
        soft = jax.nn.softplus(self.beta * x) / self.beta
        return jnp.where(self.beta * x > self.threshold, x, soft), state


class Tanh(Layer):
    def apply(self, params, state, x, train=False, rng=None):
        return jnp.tanh(x), state


class Softmax(Layer):
    def __init__(self, dim=-1):
        self.dim = dim

    def apply(self, params, state, x, train=False, rng=None):
        return jax.nn.softmax(x, axis=self.dim), state


class Dropout(Layer):
    def __init__(self, p=0.5):
        self.p = p

    def apply(self, params, state, x, train=False, rng=None):
        if not train or self.p == 0.0:
            return x, state
        assert rng is not None, "Dropout in train mode needs an rng"
        keep = jax.random.bernoulli(rng, 1.0 - self.p, x.shape)
        return jnp.where(keep, x / (1.0 - self.p), 0.0), state


class MaxPool1d(Layer):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size
        self.padding = padding

    def init(self, key, in_shape):
        L, C = in_shape
        out_l = conv_out_len(L, self.kernel_size, self.padding, 1, self.stride)
        return {}, {}, (out_l, C)

    def apply(self, params, state, x, train=False, rng=None):
        y = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=[(0, 0), (self.padding, self.padding), (0, 0)],
        )
        return y, state


class AvgPool1d(Layer):
    """torch AvgPool1d with count_include_pad=True (divisor = kernel_size)."""

    def __init__(self, kernel_size, stride=None, padding=0):
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size
        self.padding = padding

    def init(self, key, in_shape):
        L, C = in_shape
        out_l = conv_out_len(L, self.kernel_size, self.padding, 1, self.stride)
        return {}, {}, (out_l, C)

    def apply(self, params, state, x, train=False, rng=None):
        y = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=[(0, 0), (self.padding, self.padding), (0, 0)],
        )
        return y / self.kernel_size, state


class AdaptiveAvgPool1d(Layer):
    """Only output_size=1 is used by the reference architectures (terminus blocks)."""

    def __init__(self, output_size=1):
        assert output_size == 1, "only output_size=1 supported"

    def init(self, key, in_shape):
        L, C = in_shape
        return {}, {}, (1, C)

    def apply(self, params, state, x, train=False, rng=None):
        return jnp.mean(x, axis=1, keepdims=True), state


class Flatten(Layer):
    def init(self, key, in_shape):
        return {}, {}, (int(np.prod(in_shape)),)

    def apply(self, params, state, x, train=False, rng=None):
        return x.reshape(x.shape[0], -1), state


class GlobalPool(Layer):
    """Sum over the length dimension (reference NNTools.GlobalPool sums dim=2 in NCW)."""

    def init(self, key, in_shape):
        L, C = in_shape
        return {}, {}, (C,)

    def apply(self, params, state, x, train=False, rng=None):
        return jnp.sum(x, axis=1), state


class Transposer(Layer):
    """Length<->channel transpose marker.

    The reference uses ``Transposer(1, 2)`` to convert a length-major tensor
    ``[B, L, C]`` into torch conv layout ``[B, C, L]``
    (e.g. architectures/meta_convolver_ref.py:28-36 for one-hot reference
    segments).  Our activations are natively NWC ``[B, L, C]``, which is already
    the layout the following conv expects, so this is an identity here.
    """

    def __init__(self, dim0=1, dim1=2):
        pass


class SelectArgument(Layer):
    def __init__(self, select):
        self.select = select

    def init(self, key, in_shape):
        assert isinstance(in_shape, tuple) and isinstance(in_shape[self.select], (tuple, type(None)))
        return {}, {}, in_shape[self.select]

    def apply(self, params, state, x, train=False, rng=None):
        return x[self.select], state


class ConcatenateChannels(Layer):
    """Concatenate a tuple of NWC tensors along channels."""

    def init(self, key, in_shape):
        shapes = [s for s in in_shape if s is not None]
        L = shapes[0][0]
        C = sum(s[1] for s in shapes)
        return {}, {}, (L, C)

    def apply(self, params, state, x, train=False, rng=None):
        return jnp.concatenate([t for t in x if t is not None], axis=-1), state


class AdditiveLayer(Layer):
    def init(self, key, in_shape):
        return {}, {}, in_shape[0]

    def apply(self, params, state, x, train=False, rng=None):
        return x[0] + x[1], state


class LinearCombination(Layer):
    def __init__(self, coefficients):
        self.coefficients = coefficients

    def init(self, key, in_shape):
        out = next(s for s in in_shape if s is not None)
        return {}, {}, out

    def apply(self, params, state, x, train=False, rng=None):
        result = 0.0
        for c, t in zip(self.coefficients, x):
            if c != 0 and t is not None:
                result = result + c * t
        return result, state


class DotProduct(Layer):
    """Scaled dot product of two vector batches -> [B, 1]."""

    def init(self, key, in_shape):
        return {}, {}, (1,)

    def apply(self, params, state, x, train=False, rng=None):
        a, b = x
        res = jnp.sum(a * b, axis=-1, keepdims=True) / math.sqrt(a.shape[-1])
        return res, state


def positional_encoding(length, feature_size, dtype=jnp.float32):
    """Sinusoidal positional encoding [length, feature_size]
    (reference Attention.PositionalEncoding:5-36)."""
    stepper = 1.0 / (10000 ** (jnp.arange(0, feature_size, 2, dtype=dtype)
                               / feature_size))
    args = jnp.arange(length, dtype=dtype)[:, None] * stepper[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


class MultiheadAttention(Layer):
    """Bidirectional multi-head attention block over [B, L, E] sequences.

    Faithful to the reference implementation (reference Attention.py:39-152),
    including its quirk of applying **no softmax** to the attention scores
    (the scaled q@k^T weights multiply v directly), plus residual + LayerNorm
    and a Linear+ReLU feed-forward with its own residual + LayerNorm.
    """

    def __init__(self, head_dim, n_heads, embedding_dim, add_positional=False):
        assert n_heads * head_dim == embedding_dim
        self.head_dim = head_dim
        self.n_heads = n_heads
        self.embedding_dim = embedding_dim
        self.add_positional = add_positional

    def init(self, key, in_shape):
        L, E = in_shape
        assert E == self.embedding_dim
        keys = _split(key, 6)
        e = self.embedding_dim
        params = {
            # kaiming-uniform like torch's init for 2-D weights
            "w_q": kaiming_uniform(keys[0], (e, e), e),
            "w_k": kaiming_uniform(keys[1], (e, e), e),
            "w_v": kaiming_uniform(keys[2], (e, e), e),
            "w_o": kaiming_uniform(keys[3], (e, e), e),
            "ln_attn": {"gamma": jnp.ones((e,)), "beta": jnp.zeros((e,))},
            "lin_w": kaiming_uniform(keys[4], (e, e), e),
            "lin_b": kaiming_uniform(keys[5], (e,), e),
            "ln_lin": {"gamma": jnp.ones((e,)), "beta": jnp.zeros((e,))},
        }
        return params, {}, in_shape

    @staticmethod
    def _layer_norm(x, p, eps=1e-5):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]

    def apply(self, params, state, x, train=False, rng=None):
        B, L, E = x.shape
        if self.add_positional:
            x = x + positional_encoding(L, E)[None, :, :]
        q = jnp.dot(x, params["w_q"], precision=PRECISION)
        k = jnp.dot(x, params["w_k"], precision=PRECISION)
        v = jnp.dot(x, params["w_v"], precision=PRECISION)

        def heads(t):
            return jnp.transpose(t.reshape(B, L, self.n_heads, self.head_dim),
                                 (0, 2, 1, 3))

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhld,bhmd->bhlm", qh, kh,
                            precision=PRECISION) / (self.head_dim ** 0.5)
        # reference quirk: no softmax over the scores
        ctx = jnp.einsum("bhlm,bhmd->bhld", scores, vh, precision=PRECISION)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, L, E)
        attn_out = jnp.dot(ctx, params["w_o"], precision=PRECISION)
        attended = self._layer_norm(x + attn_out, params["ln_attn"])
        lin = jax.nn.relu(jnp.dot(attended, params["lin_w"],
                                  precision=PRECISION) + params["lin_b"])
        return self._layer_norm(lin + attended, params["ln_lin"]), state


class HelloEncoder(Layer):
    """Embedding + stacked attention encoder over NWC sequences
    (reference Attention.HelloEncoder:154-190; torch transposes NCW<->NLC at
    the boundaries — our activations are already [B, L, C])."""

    def __init__(self, n_layers, n_heads, input_dim, embedding_dim):
        self.input_dim = input_dim
        self.embedding_dim = embedding_dim
        self.blocks = [
            MultiheadAttention(embedding_dim // n_heads, n_heads,
                               embedding_dim, add_positional=(i == 0))
            for i in range(n_layers)]

    def init(self, key, in_shape):
        L, C = in_shape
        assert C == self.input_dim
        keys = _split(key, len(self.blocks) + 2)
        e = self.embedding_dim
        params = {"embed_w": kaiming_uniform(keys[0], (C, e), C),
                  "embed_b": kaiming_uniform(keys[-1], (e,), C)}
        for i, blk in enumerate(self.blocks):
            p, _s, _o = blk.init(keys[i + 1], (L, e))
            params[f"attn{i}"] = p
        return params, {}, (L, e)

    def apply(self, params, state, x, train=False, rng=None):
        y = jnp.dot(x, params["embed_w"], precision=PRECISION) + params["embed_b"]
        for i, blk in enumerate(self.blocks):
            y, _ = blk.apply(params[f"attn{i}"], {}, y, train=train, rng=rng)
        return y, state


class Sequential(Layer):
    def __init__(self, layers: Sequence[Layer]):
        self.layers = list(layers)

    def init(self, key, in_shape):
        params, state = {}, {}
        shape = in_shape
        keys = _split(key, max(len(self.layers), 1))
        for i, layer in enumerate(self.layers):
            p, s, shape = layer.init(keys[i], shape)
            if p:
                params[str(i)] = p
            if s:
                state[str(i)] = s
        return params, state, shape

    def apply(self, params, state, x, train=False, rng=None):
        new_state = dict(state)
        for i, layer in enumerate(self.layers):
            k = str(i)
            lrng = None
            if rng is not None:
                rng, lrng = _split(rng, 2)
            y, s = layer.apply(params.get(k, {}), state.get(k, {}), x, train=train, rng=lrng)
            if s:
                new_state[k] = s
            x = y
        return x, new_state


class ResidualBlock(Layer):
    """feedforward(x) + shortcut(x) (reference NNTools.ResidualBlock)."""

    def __init__(self, feedforward: "Sequential", shortcut: "Sequential"):
        self.ff = feedforward
        self.sh = shortcut

    def init(self, key, in_shape):
        k1, k2 = _split(key, 2)
        pf, sf, out_shape = self.ff.init(k1, in_shape)
        ps, ss, sh_shape = self.sh.init(k2, in_shape)
        assert tuple(out_shape) == tuple(sh_shape), \
            f"residual branches disagree: {out_shape} vs {sh_shape}"
        params = {"ff": pf, "sh": ps}
        state = {}
        if sf:
            state["ff"] = sf
        if ss:
            state["sh"] = ss
        return params, state, out_shape

    def apply(self, params, state, x, train=False, rng=None):
        r1, r2 = (None, None) if rng is None else _split(rng, 2)
        yf, sf = self.ff.apply(params["ff"], state.get("ff", {}), x, train=train, rng=r1)
        ys, ss = self.sh.apply(params["sh"], state.get("sh", {}), x, train=train, rng=r2)
        new_state = dict(state)
        if sf:
            new_state["ff"] = sf
        if ss:
            new_state["sh"] = ss
        return yf + ys, new_state


class Fork(Layer):
    """Apply net_i to args[i] and return the list of results (reference NNTools.Fork)."""

    def __init__(self, nets: Sequence[Sequential]):
        self.nets = list(nets)

    def init(self, key, in_shape):
        keys = _split(key, len(self.nets))
        params, state, shapes = {}, {}, []
        for i, (net, shp) in enumerate(zip(self.nets, in_shape)):
            p, s, o = net.init(keys[i], shp)
            if p:
                params[f"net{i}"] = p
            if s:
                state[f"net{i}"] = s
            shapes.append(o)
        return params, state, tuple(shapes)

    def apply(self, params, state, x, train=False, rng=None):
        outs = []
        new_state = dict(state)
        for i, net in enumerate(self.nets):
            k = f"net{i}"
            lrng = None
            if rng is not None:
                rng, lrng = _split(rng, 2)
            y, s = net.apply(params.get(k, {}), state.get(k, {}), x[i], train=train, rng=lrng)
            if s:
                new_state[k] = s
            outs.append(y)
        return outs, new_state


class Inception(Layer):
    """Parallel branches concatenated along channels (reference NNTools.Inception)."""

    def __init__(self, branches: Sequence[Sequential]):
        self.branches = list(branches)

    def init(self, key, in_shape):
        keys = _split(key, len(self.branches))
        params, state = {}, {}
        out_l, out_c = None, 0
        for i, br in enumerate(self.branches):
            p, s, o = br.init(keys[i], in_shape)
            if p:
                params[f"branch{i}"] = p
            if s:
                state[f"branch{i}"] = s
            out_l = o[0]
            out_c += o[1]
        return params, state, (out_l, out_c)

    def apply(self, params, state, x, train=False, rng=None):
        outs = []
        new_state = dict(state)
        for i, br in enumerate(self.branches):
            k = f"branch{i}"
            lrng = None
            if rng is not None:
                rng, lrng = _split(rng, 2)
            y, s = br.apply(params.get(k, {}), state.get(k, {}), x, train=train, rng=lrng)
            if s:
                new_state[k] = s
            outs.append(y)
        return jnp.concatenate(outs, axis=-1), new_state


# ---------------------------------------------------------------------------
# Config interpretation
# ---------------------------------------------------------------------------

_SIMPLE = {
    "Noop": Noop,
    "ReLU": ReLU,
    "ELU": ELU,
    "SELU": SELU,
    "Sigmoid": Sigmoid,
    "Softplus": Softplus,
    "Tanh": Tanh,
    "Softmax": Softmax,
    "Flatten": Flatten,
    "GlobalPool": GlobalPool,
    "Transposer": Transposer,
    "SelectArgument": SelectArgument,
    "ConcatenateChannels": ConcatenateChannels,
    "AdditiveLayer": AdditiveLayer,
    "LinearCombination": LinearCombination,
    "DotProduct": DotProduct,
    "Dropout": Dropout,
    "AdaptiveAvgPool1d": AdaptiveAvgPool1d,
}

_KW_RENAMES_DROP = {"inplace"}


def _clean_kwargs(kwargs):
    return {k: v for k, v in (kwargs or {}).items() if k not in _KW_RENAMES_DROP}


def build_layer(spec: dict) -> Layer:
    """Build one layer from a ``{"type": ..., "kwargs": ...}`` spec."""
    ltype = spec["type"]
    kwargs = _clean_kwargs(spec.get("kwargs", {}))

    if ltype in ("Conv1d", "WeightNormedConv1d"):
        cls = Conv1d if ltype == "Conv1d" else WeightNormedConv1d
        return cls(
            in_channels=kwargs["in_channels"],
            out_channels=kwargs["out_channels"],
            kernel_size=kwargs["kernel_size"],
            padding=kwargs.get("padding", 0),
            dilation=kwargs.get("dilation", 1),
            stride=kwargs.get("stride", 1),
            groups=kwargs.get("groups", 1),
            bias=kwargs.get("bias", True),
        )
    if ltype in ("Linear", "WeightNormedLinear"):
        cls = Linear if ltype == "Linear" else WeightNormedLinear
        return cls(kwargs["in_features"], kwargs["out_features"], bias=kwargs.get("bias", True))
    if ltype == "BatchNorm1d":
        return BatchNorm1d(kwargs["num_features"], momentum=kwargs.get("momentum", 0.1),
                           eps=kwargs.get("eps", _EPS_BN))
    if ltype == "LayerNormModule":
        return LayerNormModule(kwargs["num_features"])
    if ltype == "MaxPool1d":
        return MaxPool1d(kwargs["kernel_size"], stride=kwargs.get("stride"),
                         padding=kwargs.get("padding", 0))
    if ltype == "AvgPool1d":
        return AvgPool1d(kwargs["kernel_size"], stride=kwargs.get("stride"),
                         padding=kwargs.get("padding", 0))
    if ltype == "ResidualBlock":
        return ResidualBlock(build_network(kwargs["feedforward"]),
                             build_network(kwargs["shortcut"]))
    if ltype == "Fork":
        return Fork([build_network(a) for a in kwargs["net_args"]])
    if ltype == "Inception":
        return Inception([build_network(b) for b in kwargs["branches"]])
    if ltype == "MultiheadAttention":
        return MultiheadAttention(
            head_dim=kwargs["head_dim"], n_heads=kwargs["n_heads"],
            embedding_dim=kwargs["embedding_dim"],
            add_positional=kwargs.get("add_positional", False))
    if ltype == "HelloEncoder":
        return HelloEncoder(
            n_layers=kwargs["n_layers"], n_heads=kwargs["n_heads"],
            input_dim=kwargs["input_dim"],
            embedding_dim=kwargs["embedding_dim"])
    if ltype in _SIMPLE:
        return _SIMPLE[ltype](**kwargs)
    raise ValueError(f"Unknown layer type: {ltype}")


def build_network(config: Sequence[dict]) -> Sequential:
    """Build a Sequential from a list of layer specs (NNTools.Network equivalent)."""
    return Sequential([build_layer(spec) for spec in config])
