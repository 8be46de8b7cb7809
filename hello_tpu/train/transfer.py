"""Transfer learning: build-on-top parameter grafting.

Replaces the reference's addendum/xfer-learning flow (reference
python/MixtureOfExpertsAdvancedXferLearning.py build_on_top:94): a model built
with addendum blocks reuses a trained base model's parameters for the shared
prefix of every network; the appended addendum layers keep their fresh
initialisation and are the (primary) training target.
"""

from __future__ import annotations

from typing import Tuple

from ..nn.moe import MoEAttention


def build_on_top(base_model: MoEAttention, base_params, base_state,
                 extended_model: MoEAttention, extended_params, extended_state
                 ) -> Tuple[dict, dict]:
    """Copy base parameters onto the shared layer prefix of an extended model.

    Layer alignment is by Sequential index: the extended network's first
    ``len(base)`` layers must match the base network layer-for-layer.
    Returns the grafted (params, state) for the extended model.
    """
    params = dict(extended_params)
    state = dict(extended_state)
    for name, base_net in base_model.nets.items():
        if base_net is None or name not in base_params:
            continue
        ext_net = extended_model.nets.get(name)
        assert ext_net is not None, f"extended model missing network {name}"
        assert len(ext_net.layers) >= len(base_net.layers), name
        new_p = dict(params.get(name, {}))
        new_s = dict(state.get(name, {}))
        for i in range(len(base_net.layers)):
            k = str(i)
            if k in base_params[name]:
                new_p[k] = base_params[name][k]
            if name in base_state and k in base_state[name]:
                new_s[k] = base_state[name][k]
        params[name] = new_p
        if new_s:
            state[name] = new_s
    return params, state
