"""Convert reference (torch) HELLO checkpoints into hello_tpu parameter pytrees.

The reference ships inference models as whole-module torch pickles
(``*.wrapper.dnn`` — MoEMergedWrapperAdvanced wrapping MoEAttention; loaded via
``torch.load`` in reference python/caller_calling.py:863).  This module maps a
torch ``state_dict`` onto the parameter pytree produced by
:class:`hello_tpu.nn.moe.MoEAttention`, handling:

  * layout transposition: torch conv weights ``[O, I, K]`` -> HIO ``[K, I, O]``,
    linear ``[O, I]`` -> ``[I, O]``;
  * weight-norm decomposition ``weight_g``/``weight_v`` (kept decomposed so the
    parametrisation — and therefore training behaviour — matches);
  * batch-norm running statistics -> the separate ``state`` pytree;
  * the reference's structural containers (Network.network Sequential indices,
    ResidualBlock ffNetwork/shNetwork, Fork net{i}, Inception branch{i}).

No torch import is required: the state_dict can be loaded with
``torch.load(..., map_location="cpu")`` by the caller, or passed as a mapping of
name -> numpy array.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

from . import layers as L
from .moe import MoEAttention

# my network name -> torch attribute name on MoEAttention
_TORCH_ATTR = {
    "read_conv0": "read_convolver0",
    "read_conv1": "read_convolver1",
    "compressor0": "compressor0",
    "compressor1": "compressor1",
    "compressor2": "compressor2",
    "xattn0": "xattn0",
    "xattn1": "xattn1",
    "xattn2": "xattn2",
    "combiner0": "combiner0",
    "combiner1": "combiner1",
    "meta": "meta",
}


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _convert_layer(layer: L.Layer, sd: Mapping[str, np.ndarray], prefix: str):
    """Return (params, state) for one layer pulled from the torch state_dict."""
    if isinstance(layer, L.WeightNormedConv1d):
        v = _np(sd[prefix + "conv1d.weight_v"]).transpose(2, 1, 0)
        g = _np(sd[prefix + "conv1d.weight_g"]).reshape(-1)
        p = {"v": v, "g": g}
        if prefix + "conv1d.bias" in sd:
            p["b"] = _np(sd[prefix + "conv1d.bias"])
        return p, {}
    if isinstance(layer, L.Conv1d):
        p = {"w": _np(sd[prefix + "weight"]).transpose(2, 1, 0)}
        if prefix + "bias" in sd:
            p["b"] = _np(sd[prefix + "bias"])
        return p, {}
    if isinstance(layer, L.WeightNormedLinear):
        v = _np(sd[prefix + "linear.weight_v"]).transpose(1, 0)
        g = _np(sd[prefix + "linear.weight_g"]).reshape(-1)
        p = {"v": v, "g": g}
        if prefix + "linear.bias" in sd:
            p["b"] = _np(sd[prefix + "linear.bias"])
        return p, {}
    if isinstance(layer, L.Linear):
        p = {"w": _np(sd[prefix + "weight"]).transpose(1, 0)}
        if prefix + "bias" in sd:
            p["b"] = _np(sd[prefix + "bias"])
        return p, {}
    if isinstance(layer, (L.BatchNorm1d, L.LayerNormModule)):
        if isinstance(layer, L.LayerNormModule):
            return ({"gamma": _np(sd[prefix + "normer.weight"]),
                     "beta": _np(sd[prefix + "normer.bias"])}, {})
        params = {"gamma": _np(sd[prefix + "weight"]),
                  "beta": _np(sd[prefix + "bias"])}
        state = {"mean": _np(sd[prefix + "running_mean"]),
                 "var": _np(sd[prefix + "running_var"])}
        return params, state
    if isinstance(layer, L.ResidualBlock):
        pf, sf = _convert_sequential(layer.ff, sd, prefix + "ffNetwork.network.")
        ps, ss = _convert_sequential(layer.sh, sd, prefix + "shNetwork.network.")
        params = {"ff": pf, "sh": ps}
        state = {}
        if sf:
            state["ff"] = sf
        if ss:
            state["sh"] = ss
        return params, state
    if isinstance(layer, L.Fork):
        params, state = {}, {}
        for i, net in enumerate(layer.nets):
            p, s = _convert_sequential(net, sd, prefix + f"net{i}.network.")
            if p:
                params[f"net{i}"] = p
            if s:
                state[f"net{i}"] = s
        return params, state
    if isinstance(layer, L.Inception):
        params, state = {}, {}
        for i, br in enumerate(layer.branches):
            p, s = _convert_sequential(br, sd, prefix + f"branch{i}.network.")
            if p:
                params[f"branch{i}"] = p
            if s:
                state[f"branch{i}"] = s
        return params, state
    if isinstance(layer, L.Sequential):
        return _convert_sequential(layer, sd, prefix)
    if not isinstance(layer, _STATELESS_LAYERS):
        # e.g. MultiheadAttention / HelloEncoder: silently returning {} would
        # produce an empty pytree that KeyErrors at apply time
        raise NotImplementedError(
            f"no torch conversion for parameter-bearing layer "
            f"{type(layer).__name__} at {prefix!r}")
    return {}, {}


_STATELESS_LAYERS = (
    L.Noop, L.ReLU, L.ELU, L.SELU, L.Sigmoid, L.Softplus, L.Tanh, L.Softmax,
    L.Dropout,
    L.MaxPool1d, L.AvgPool1d, L.AdaptiveAvgPool1d, L.Flatten, L.GlobalPool,
    L.Transposer, L.SelectArgument, L.ConcatenateChannels, L.AdditiveLayer,
    L.LinearCombination, L.DotProduct,
)


def _convert_sequential(seq: L.Sequential, sd: Mapping[str, np.ndarray], prefix: str):
    params, state = {}, {}
    for i, layer in enumerate(seq.layers):
        p, s = _convert_layer(layer, sd, f"{prefix}{i}.")
        if p:
            params[str(i)] = p
        if s:
            state[str(i)] = s
    return params, state


def detect_prefix(sd: Mapping[str, np.ndarray]) -> str:
    """Detect the state-dict prefix: '' for bare MoEAttention, 'moeMerged.' for
    the MoEMergedWrapperAdvanced inference wrapper, 'module.' for DDP dumps."""
    for key in sd:
        for cand in ("moeMerged.module.", "module.moeMerged.", "moeMerged.", "module.", ""):
            if key.startswith(cand + "read_convolver0."):
                return cand
    return ""


def convert_state_dict(sd: Mapping[str, np.ndarray], model: MoEAttention,
                       prefix: str | None = None):
    """Convert a torch state_dict into (params, state) for ``model``."""
    if prefix is None:
        prefix = detect_prefix(sd)
    params, state = {}, {}
    for name, net in model.nets.items():
        if net is None:
            continue
        tname = _TORCH_ATTR[name]
        net_prefix = f"{prefix}{tname}.network."
        if not any(k.startswith(net_prefix) for k in sd):
            # network configured but absent from checkpoint (e.g. deleted xattn)
            continue
        p, s = _convert_sequential(net, sd, net_prefix)
        params[name] = p
        if s:
            state[name] = s
    return params, state


def load_torch_checkpoint(path: str, model: MoEAttention,
                          reference_python: str = "/root/reference/python"):
    """Load a ``.wrapper.dnn`` / state-dict torch file and convert it.

    Requires torch (CPU) to unpickle.  Whole-module pickles (the reference's
    shipped ``.wrapper.dnn`` artifacts are torch.save'd MoEMergedWrapperAdvanced
    modules) reference HELLO's class names; when available, the reference
    python tree is added to sys.path for the duration of the unpickle.
    """
    import sys

    import torch  # local import: torch is only needed for checkpoint conversion

    injected = False
    if os.path.isdir(reference_python) and reference_python not in sys.path:
        sys.path.insert(0, reference_python)
        injected = True
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        if injected:
            sys.path.remove(reference_python)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    sd = {k: _np(v) for k, v in sd.items()}
    return convert_state_dict(sd, model)
