"""Checkpoint/resume via npz artifact caching (SURVEY.md SS5.4).

Parity with the reference's data_output_utils.save_npa / load_npa /
load_or_comp (SURVEY.md SS2 row 8): expensive artifacts — assembled
operators, steady states, per-timestep Riccati factors — are cached on
disk keyed by (config hash, artifact name); a rerun of the same config
resumes from the last completed artifact instead of recomputing. Arrays
live in a single compressed npz per artifact; scipy sparse matrices are
stored as their CSR triplet arrays.
"""
from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np

DEFAULT_CACHE_DIR = os.environ.get(
    "OPTCONPY_TPU_CACHE", os.path.join(os.getcwd(), "data")
)


def _code_salt() -> str:
    """Package-version salt folded into artifact filenames.

    A gains npz cached under a config hash must not survive solver
    changes across releases — bump __version__ when numerics change and
    stale artifacts miss automatically.
    """
    from .. import __version__

    return "v" + __version__.replace(".", "_")


def _artifact_path(key: str, name: str, cache_dir: str | None) -> Path:
    d = Path(cache_dir or DEFAULT_CACHE_DIR)
    return d / f"{key}-{_code_salt()}__{name}.npz"


def save_arrays(key: str, name: str, arrays: dict, cache_dir=None) -> Path:
    """Atomically save a dict of numpy arrays (save_npa parity)."""
    path = _artifact_path(key, name, cache_dir)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)  # atomic: partial writes never corrupt
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_arrays(key: str, name: str, cache_dir=None) -> dict | None:
    """Load a cached artifact, or None if absent (load_npa parity)."""
    path = _artifact_path(key, name, cache_dir)
    if not path.exists():
        return None
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def load_or_comp(key: str, name: str, compute, cache_dir=None) -> dict:
    """Return the cached artifact for (key, name), computing + saving it
    on a miss — the reference's memoization contract (SURVEY.md SS3.5).

    compute: () -> dict[str, np.ndarray].
    """
    cached = load_arrays(key, name, cache_dir)
    if cached is not None:
        return cached
    arrays = {k: np.asarray(v) for k, v in compute().items()}
    save_arrays(key, name, arrays, cache_dir)
    return arrays


def save_csr(mat) -> dict:
    """Encode a scipy CSR matrix as plain arrays for npz storage."""
    m = mat.tocsr()
    return {
        "data": m.data,
        "indices": m.indices,
        "indptr": m.indptr,
        "shape": np.asarray(m.shape),
    }


def load_csr(arrays: dict):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (arrays["data"], arrays["indices"], arrays["indptr"]),
        shape=tuple(arrays["shape"]),
    )


def write_meta(key: str, meta: dict, cache_dir=None) -> Path:
    """Store the run's config JSON next to its artifacts (resume audit)."""
    d = Path(cache_dir or DEFAULT_CACHE_DIR)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{key}__meta.json"
    path.write_text(json.dumps(meta, indent=2, sort_keys=True))
    return path
