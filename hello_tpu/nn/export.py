"""Export hello_tpu parameters to a reference-compatible torch state_dict.

The inverse of :mod:`hello_tpu.nn.convert`: produces a state_dict whose keys
and layouts match the reference torch model tree (MoEAttention built by
create_moe_attention_model), so models trained in this framework can be loaded
back into the reference ecosystem (``model.load_state_dict(...)``) or saved as
its ``.wrapper.dnn``-style artifacts.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from . import layers as L
from .convert import _TORCH_ATTR
from .moe import MoEAttention


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _export_layer(layer: L.Layer, params, state, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(layer, L.WeightNormedConv1d):
        out[prefix + "conv1d.weight_v"] = _np(params["v"]).transpose(2, 1, 0)
        out[prefix + "conv1d.weight_g"] = _np(params["g"]).reshape(-1, 1, 1)
        if "b" in params:
            out[prefix + "conv1d.bias"] = _np(params["b"])
    elif isinstance(layer, L.Conv1d):
        out[prefix + "weight"] = _np(params["w"]).transpose(2, 1, 0)
        if "b" in params:
            out[prefix + "bias"] = _np(params["b"])
    elif isinstance(layer, L.WeightNormedLinear):
        out[prefix + "linear.weight_v"] = _np(params["v"]).transpose(1, 0)
        out[prefix + "linear.weight_g"] = _np(params["g"]).reshape(-1, 1)
        if "b" in params:
            out[prefix + "linear.bias"] = _np(params["b"])
    elif isinstance(layer, L.Linear):
        out[prefix + "weight"] = _np(params["w"]).transpose(1, 0)
        if "b" in params:
            out[prefix + "bias"] = _np(params["b"])
    elif isinstance(layer, L.LayerNormModule):
        out[prefix + "normer.weight"] = _np(params["gamma"])
        out[prefix + "normer.bias"] = _np(params["beta"])
    elif isinstance(layer, L.BatchNorm1d):
        out[prefix + "weight"] = _np(params["gamma"])
        out[prefix + "bias"] = _np(params["beta"])
        out[prefix + "running_mean"] = _np(state.get("mean", np.zeros_like(params["gamma"])))
        out[prefix + "running_var"] = _np(state.get("var", np.ones_like(params["gamma"])))
        out[prefix + "num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    elif isinstance(layer, L.ResidualBlock):
        _export_sequential(layer.ff, params.get("ff", {}), state.get("ff", {}),
                           prefix + "ffNetwork.network.", out)
        _export_sequential(layer.sh, params.get("sh", {}), state.get("sh", {}),
                           prefix + "shNetwork.network.", out)
    elif isinstance(layer, L.Fork):
        for i, net in enumerate(layer.nets):
            _export_sequential(net, params.get(f"net{i}", {}),
                               state.get(f"net{i}", {}),
                               prefix + f"net{i}.network.", out)
    elif isinstance(layer, L.Inception):
        for i, br in enumerate(layer.branches):
            _export_sequential(br, params.get(f"branch{i}", {}),
                               state.get(f"branch{i}", {}),
                               prefix + f"branch{i}.network.", out)
    elif params:
        # mirror convert.py's strictness: silently exporting nothing for a
        # parameter-bearing layer corrupts the state_dict far from the cause
        raise NotImplementedError(
            f"export for layer type {type(layer).__name__} at {prefix!r} "
            "is not implemented (it owns parameters)")


def _export_sequential(seq: L.Sequential, params, state, prefix, out):
    for i, layer in enumerate(seq.layers):
        _export_layer(layer, params.get(str(i), {}), state.get(str(i), {}),
                      f"{prefix}{i}.", out)


def export_state_dict(model: MoEAttention, params, state) -> Dict[str, np.ndarray]:
    """Export (params, state) as a torch-layout state_dict of numpy arrays."""
    out: Dict[str, np.ndarray] = {}
    for name, net in model.nets.items():
        if net is None or name not in params:
            continue
        _export_sequential(net, params[name], state.get(name, {}),
                           f"{_TORCH_ATTR[name]}.network.", out)
    return out


def save_torch_checkpoint(path: str, model: MoEAttention, params, state):
    """Save as a torch-loadable state_dict file (requires torch)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(model, params, state).items()}
    torch.save(sd, path)
    return path
