"""Layer-level numerical parity tests against torch.

Each test builds the same layer in torch and in hello_tpu, copies the torch
parameters through the checkpoint converter, and checks outputs match on random
inputs.  This validates both the layer semantics (layout, padding, pooling
formulas) and the converter's weight transposition.
"""

import numpy as np
import pytest

import torch

from hello_tpu.nn import layers as L
from hello_tpu.nn.convert import _convert_sequential
import jax


def run_both(config, torch_modules, x_np, train=False, tol=1e-5):
    """Run a torch Sequential and our Sequential on the same input.

    x_np: [B, C, L] (torch layout) or [B, C] for vector inputs.
    """
    tmodel = torch.nn.Sequential(*torch_modules)
    tmodel.eval()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_np)).numpy()

    seq = L.build_network(config)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, state = _convert_sequential(seq, sd, "")

    if x_np.ndim == 3:
        jx = np.transpose(x_np, (0, 2, 1))  # NCW -> NWC
    else:
        jx = x_np
    j_out, _ = seq.apply(params, state, jax.numpy.asarray(jx), train=train)
    j_out = np.asarray(j_out)
    if j_out.ndim == 3:
        j_out = np.transpose(j_out, (0, 2, 1))
    np.testing.assert_allclose(t_out, j_out, rtol=tol, atol=tol)


def test_conv1d_basic(rng):
    x = rng.randn(4, 6, 150).astype(np.float32)
    run_both(
        [{"type": "Conv1d", "kwargs": {"in_channels": 6, "out_channels": 16,
                                       "kernel_size": 3, "padding": 0, "dilation": 1,
                                       "stride": 1, "groups": 1}}],
        [torch.nn.Conv1d(6, 16, 3)],
        x,
    )


def test_conv1d_strided_padded_dilated(rng):
    x = rng.randn(2, 8, 71).astype(np.float32)
    run_both(
        [{"type": "Conv1d", "kwargs": {"in_channels": 8, "out_channels": 12,
                                       "kernel_size": 3, "padding": 1, "dilation": 2,
                                       "stride": 2, "groups": 1}}],
        [torch.nn.Conv1d(8, 12, 3, padding=1, dilation=2, stride=2)],
        x,
    )


def test_conv1d_groups(rng):
    x = rng.randn(2, 8, 20).astype(np.float32)
    run_both(
        [{"type": "Conv1d", "kwargs": {"in_channels": 8, "out_channels": 8,
                                       "kernel_size": 3, "padding": 1, "dilation": 1,
                                       "stride": 1, "groups": 4}}],
        [torch.nn.Conv1d(8, 8, 3, padding=1, groups=4)],
        x,
    )


def test_weight_normed_conv(rng):
    class WNConv(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1d = torch.nn.utils.weight_norm(torch.nn.Conv1d(6, 16, 3, padding=1))

        def forward(self, x):
            return self.conv1d(x)

    x = rng.randn(3, 6, 50).astype(np.float32)
    run_both(
        [{"type": "WeightNormedConv1d", "kwargs": {"in_channels": 6, "out_channels": 16,
                                                   "kernel_size": 3, "padding": 1,
                                                   "dilation": 1, "stride": 1, "groups": 1}}],
        [WNConv()],
        x,
    )


def test_linear_and_weight_normed_linear(rng):
    class WNLinear(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = torch.nn.utils.weight_norm(torch.nn.Linear(32, 3))

        def forward(self, x):
            return self.linear(x)

    x = rng.randn(5, 32).astype(np.float32)
    run_both([{"type": "Linear", "kwargs": {"in_features": 32, "out_features": 3}}],
             [torch.nn.Linear(32, 3)], x)
    run_both([{"type": "WeightNormedLinear", "kwargs": {"in_features": 32, "out_features": 3}}],
             [WNLinear()], x)


def test_batchnorm_eval(rng):
    bn = torch.nn.BatchNorm1d(16)
    # randomize running stats
    bn.running_mean.data = torch.from_numpy(rng.randn(16).astype(np.float32))
    bn.running_var.data = torch.from_numpy(rng.rand(16).astype(np.float32) + 0.5)
    bn.weight.data = torch.from_numpy(rng.randn(16).astype(np.float32))
    bn.bias.data = torch.from_numpy(rng.randn(16).astype(np.float32))
    x = rng.randn(4, 16, 30).astype(np.float32)
    run_both([{"type": "BatchNorm1d", "kwargs": {"num_features": 16}}], [bn], x)


def test_maxpool_and_avgpool(rng):
    x = rng.randn(2, 8, 144).astype(np.float32)
    run_both([{"type": "MaxPool1d", "kwargs": {"kernel_size": 3, "stride": 2, "padding": 0}}],
             [torch.nn.MaxPool1d(3, stride=2)], x)
    run_both([{"type": "AvgPool1d", "kwargs": {"kernel_size": 3, "stride": 2, "padding": 1}}],
             [torch.nn.AvgPool1d(3, stride=2, padding=1)], x)


def test_terminus_stack(rng):
    """AdaptiveAvgPool1d -> Flatten -> Linear (the classification head)."""
    class Flatten(torch.nn.Module):
        def forward(self, x):
            return x.view(x.shape[0], -1)

    x = rng.randn(3, 256, 9).astype(np.float32)
    run_both(
        [
            {"type": "AdaptiveAvgPool1d", "kwargs": {"output_size": 1}},
            {"type": "Flatten", "kwargs": {}},
            {"type": "Linear", "kwargs": {"in_features": 256, "out_features": 1}},
        ],
        [torch.nn.AdaptiveAvgPool1d(1), Flatten(), torch.nn.Linear(256, 1)],
        x,
    )


def test_residual_block_conv_shortcut(rng):
    """Residual block with downsampling conv shortcut, matching the reference block layout."""
    from hello_tpu.nn.archs import residual_conv

    class TorchResidual(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ffNetwork = _TorchNetWrap(torch.nn.Sequential(
                torch.nn.Conv1d(32, 64, 3, padding=1, stride=2),
                torch.nn.BatchNorm1d(64),
                torch.nn.ReLU(),
                torch.nn.Conv1d(64, 64, 3, padding=1, stride=1),
                torch.nn.BatchNorm1d(64),
                torch.nn.ReLU(),
            ))
            self.shNetwork = _TorchNetWrap(torch.nn.Sequential(
                torch.nn.Conv1d(32, 64, 1, stride=2),
            ))

        def forward(self, x):
            return self.ffNetwork(x) + self.shNetwork(x)

    x = rng.randn(2, 32, 71).astype(np.float32)
    cfg = [residual_conv(32, 64, [3, 3], [1, 1], [1, 1, 1], [2, 1, 2], weight_norm=False)]
    run_both(cfg, [TorchResidual()], x)


class _TorchNetWrap(torch.nn.Module):
    """Mimic NNTools.Network which holds a Sequential in attribute ``network``."""

    def __init__(self, seq):
        super().__init__()
        self.network = seq

    def forward(self, x):
        return self.network(x)


def test_shape_inference_read_convolver():
    """The read convolver must map [B,150,6] -> [B,36,64] as the reference does."""
    from hello_tpu.nn.archs import read_convolver

    seq = L.build_network(read_convolver(weight_norm=True))
    params, state, out_shape = seq.init(jax.random.PRNGKey(0), (150, 6))
    assert tuple(out_shape) == (36, 64)

    x = np.zeros((2, 150, 6), np.float32)
    y, _ = seq.apply(params, state, jax.numpy.asarray(x))
    assert y.shape == (2, 36, 64)


def test_shape_inference_compressor_xattn():
    from hello_tpu.nn.archs import compressor_conv, xattn_subtract

    comp = L.build_network(compressor_conv(weight_norm=True))
    _, _, out_shape = comp.init(jax.random.PRNGKey(0), (36, 64))
    assert tuple(out_shape) == (18, 128)

    xat = L.build_network(xattn_subtract(weight_norm=True))
    _, _, out_shape = xat.init(jax.random.PRNGKey(0),
                               ((18, 128), ((18, 128), (18, 128))))
    assert tuple(out_shape) == (1,)
