"""Full train-state checkpointing with deterministic resume.

The reference saves model weights only, every CheckEvery iterations, and has
*no restore path at startup* (``model.py:30-39``; SURVEY.md §3.5). Here the
checkpoint carries params + optimizer state + device PRNG key + step, plus
(via ``extra``) each batch pipeline's host state at its *consumption* point
and the prefetcher's round-robin position — production may run ahead in
background threads, so the consumption-point snapshot is what makes the
resumed batch stream (and therefore the whole run) bit-exact.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(path: str, *, params, opt_state, step: int, rng_key,
         host_rng_state: Optional[Dict[str, Any]] = None,
         extra: Optional[Dict[str, Any]] = None) -> str:
    """Write checkpoint ``<path>-<step>.ckpt`` and update ``<path>.latest``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fname = f"{path}-{step}.ckpt"
    state = {
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "step": int(step),
        "rng_key": np.asarray(rng_key),
        "host_rng_state": host_rng_state,
        "extra": extra or {},
    }
    tmp = fname + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, fname)
    with open(path + ".latest", "w") as f:
        f.write(os.path.basename(fname))
    return fname


def latest_path(path: str) -> Optional[str]:
    marker = path + ".latest"
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    full = os.path.join(os.path.dirname(os.path.abspath(path)), name)
    return full if os.path.exists(full) else None


def restore(fname: str) -> Dict[str, Any]:
    with open(fname, "rb") as f:
        return pickle.load(f)


def restore_latest(path: str) -> Optional[Dict[str, Any]]:
    p = latest_path(path)
    return restore(p) if p else None
