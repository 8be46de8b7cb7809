"""Checkpointing: full-state training checkpoints and inference params.

The reference saves full torch-pickled modules and trainer state
(reference AlleleSearcherDNN.py:2105-2203, MixtureOfExpertsDNNFastDistributed.py:904-907).
Here checkpoints are plain pytrees of numpy arrays serialised with pickle —
host-portable, framework-neutral, and loadable without model classes.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, state, opt_state=None, step: int = 0,
                    extra: Optional[Dict[str, Any]] = None):
    """Save a training/inference checkpoint atomically."""
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "step": int(step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Any, Any]:
    """Load (params, state) from a checkpoint file."""
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    return payload["params"], payload["state"]


def load_full_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fh:
        return pickle.load(fh)
