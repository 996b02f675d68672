"""Scene save/load — .npz and MATLAB .mat containers.

Capability parity: the reference's scene persistence (SURVEY.md §2.1 R8
"load/save scenes (.mat)"; reference mount empty, see SURVEY.md §0). The
.mat path keeps round-trip compatibility with MATLAB-era tooling; .npz is
the native fast path. Both store the same schema:

    cameras (C, cam_dim), points (P, 3), obs_2d (O, 2),
    cam_idx (O,), pt_idx (O,), plus scalar metadata (model, counts).

Padded rows are stripped on save and re-created on load, so files are
portable across pad_multiple settings.
"""

from __future__ import annotations

import os

import numpy as np

from tpu_ba.core import BAProblem, make_problem


def _to_arrays(problem: BAProblem) -> dict:
    n = problem.n_obs
    return {
        "cameras": np.asarray(problem.cameras),
        "points": np.asarray(problem.points),
        "obs_2d": np.asarray(problem.obs_2d)[:n],
        "cam_idx": np.asarray(problem.cam_idx)[:n].astype(np.int32),
        "pt_idx": np.asarray(problem.pt_idx)[:n].astype(np.int32),
        "model": np.asarray(problem.model),
    }


def save_scene(path: str, problem: BAProblem) -> None:
    """Save a scene as .npz or .mat (chosen by extension)."""
    arrays = _to_arrays(problem)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mat":
        from scipy.io import savemat

        savemat(path, arrays)
    elif ext == ".npz":
        np.savez_compressed(path, **arrays)
    else:
        raise ValueError(f"unsupported scene extension {ext!r} (use .npz or .mat)")


def load_scene(path: str, *, dtype=np.float32,
               pad_multiple: int = 1024) -> BAProblem:
    """Load a scene saved by save_scene (or a MATLAB struct with the same
    field names)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mat":
        from scipy.io import loadmat

        raw = loadmat(path)
    elif ext == ".npz":
        raw = dict(np.load(path, allow_pickle=False))
    else:
        raise ValueError(f"unsupported scene extension {ext!r} (use .npz or .mat)")

    def arr(name):
        if name not in raw:
            raise KeyError(f"scene file {path} missing field {name!r}")
        return np.asarray(raw[name])

    model = raw.get("model", "bal")
    model = str(np.asarray(model).reshape(-1)[0]) if not isinstance(model, str) else model
    return make_problem(
        arr("cameras"), arr("points"), arr("obs_2d"),
        arr("cam_idx").reshape(-1), arr("pt_idx").reshape(-1),
        model=model, dtype=dtype, pad_multiple=pad_multiple,
    )
