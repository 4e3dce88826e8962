"""Full train-state checkpointing with deterministic resume.

The reference saves model weights only, every CheckEvery iterations, and has
*no restore path at startup* (``model.py:30-39``; SURVEY.md §3.5). Here the
checkpoint carries params + optimizer state + device PRNG key + step, plus
(via ``extra``) each batch pipeline's host state at its *consumption* point
and the prefetcher's round-robin position — production may run ahead in
background threads, so the consumption-point snapshot is what makes the
resumed batch stream (and therefore the whole run) bit-exact.

Format (versioned): a fixed header ``RPTPUCK1<version:u32><crc32:u32>``
followed by a pickled state dict. The version gates schema evolution (a
mismatch fails loudly instead of mis-restoring), and the CRC detects
truncated/corrupted files before unpickling. Like any pickle-based format
this is for checkpoints YOU wrote — do not restore files from untrusted
sources. (Round-2 advisory; an Orbax backend remains a candidate once
multi-host arrays are in play.)
"""
from __future__ import annotations

import os
import pickle
import struct
import zlib
from typing import Any, Dict, Optional

import jax
import numpy as np

_MAGIC = b"RPTPUCK1"
_VERSION = 1


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(path: str, *, params, opt_state, step: int, rng_key,
         host_rng_state: Optional[Dict[str, Any]] = None,
         extra: Optional[Dict[str, Any]] = None) -> str:
    """Write checkpoint ``<path>-<step>.ckpt`` and update ``<path>.latest``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fname = f"{path}-{step}.ckpt"
    state = {
        "schema_version": _VERSION,
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "step": int(step),
        "rng_key": np.asarray(rng_key),
        "host_rng_state": host_rng_state,
        "extra": extra or {},
    }
    payload = pickle.dumps(state, protocol=pickle.HIGHEST_PROTOCOL)
    header = _MAGIC + struct.pack("<II", _VERSION,
                                  zlib.crc32(payload) & 0xFFFFFFFF)
    tmp = fname + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(payload)
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
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(
            f"{fname}: not a relationprediction_tpu checkpoint "
            f"(bad magic; pre-versioning checkpoints are not supported)")
    version, crc = struct.unpack("<II", blob[len(_MAGIC):len(_MAGIC) + 8])
    if version != _VERSION:
        raise ValueError(f"{fname}: checkpoint schema version {version} "
                         f"!= supported {_VERSION}")
    payload = blob[len(_MAGIC) + 8:]
    if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
        raise ValueError(f"{fname}: checksum mismatch (corrupt/truncated "
                         f"checkpoint)")
    return pickle.loads(payload)


def restore_latest(path: str) -> Optional[Dict[str, Any]]:
    p = latest_path(path)
    return restore(p) if p else None
