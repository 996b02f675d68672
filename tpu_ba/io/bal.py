"""BAL (Bundle Adjustment in the Large) problem-file support.

Capability parity: BAL problems are the benchmark substrate mandated by
BASELINE.json (configs 2,3,5: Ladybug-49, Ladybug-1723, Trafalgar,
Venice-1778). Format::

    <num_cameras> <num_points> <num_observations>
    <cam_idx> <pt_idx> <x> <y>          # × num_observations
    <camera params, 9 lines each>        # aa(3), t(3), f, k1, k2
    <point coords, 3 lines each>

This sandbox has **zero network egress** (SURVEY.md §7e), so real BAL files
cannot be downloaded; :func:`make_bal_like_problem` synthesizes
dimension-matched stand-ins (same camera/point/observation counts, same
camera model, vehicle-ring trajectory like Ladybug) and every report labels
them as such. Real files load with :func:`load_bal` if ever provided.
"""

from __future__ import annotations

import os

import numpy as np


def _cross_np(a, b):
    """Component-wise cross product — numpy's np.cross has a pathologically
    slow path for large (N, 3) inputs in this environment (~1000x)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    import numpy as _np
    return _np.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)

from tpu_ba.core import BAProblem, make_problem

# (n_cameras, n_points, n_observations) of the canonical BAL problems named in
# BASELINE.json. Used to synthesize dimension-matched stand-ins offline.
BAL_DATASET_DIMS = {
    "ladybug-49": (49, 7776, 31843),
    "ladybug-1723": (1723, 156502, 678718),
    "trafalgar-257": (257, 65132, 225911),
    "venice-1778": (1778, 993923, 5001946),
}


def load_bal(path: str, *, dtype=np.float32, pad_multiple: int = 1024,
             normalize: bool = False, use_native: bool = True) -> BAProblem:
    """Parse a BAL text file (optionally gzipped) into a BAProblem.

    Tries the native C++ parser (tpu_ba/io/_native — mmap + hand-rolled
    float scanner, ~100x faster on Venice-sized files) and falls back to the
    Python tokenizer, which remains the oracle.
    """
    parsed = None
    if use_native:
        from tpu_ba.io.native import parse_bal_native

        parsed = parse_bal_native(path)
    if parsed is not None:
        cams, pts, obs_2d, cam_idx, pt_idx = parsed
    else:
        if path.endswith(".gz"):
            import gzip

            with gzip.open(path, "rt") as fh:
                text = fh.read()
        else:
            with open(path) as fh:
                text = fh.read()
        vals = np.array(text.split(), dtype=np.float64)
        n_cams, n_pts, n_obs = int(vals[0]), int(vals[1]), int(vals[2])
        off = 3
        obs_block = vals[off: off + 4 * n_obs].reshape(n_obs, 4)
        off += 4 * n_obs
        cams = vals[off: off + 9 * n_cams].reshape(n_cams, 9)
        off += 9 * n_cams
        pts = vals[off: off + 3 * n_pts].reshape(n_pts, 3)
        cam_idx = obs_block[:, 0].astype(np.int32)
        pt_idx = obs_block[:, 1].astype(np.int32)
        obs_2d = obs_block[:, 2:4]
    if normalize:
        cams, pts = normalize_bal(cams, pts)
    return make_problem(cams, pts, obs_2d, cam_idx, pt_idx, model="bal",
                        dtype=dtype, pad_multiple=pad_multiple)


def save_bal(path: str, problem: BAProblem) -> None:
    """Write a BAProblem (unpadded part) in BAL text format."""
    n_obs = problem.n_obs
    cams = np.asarray(problem.cameras, np.float64)
    pts = np.asarray(problem.points, np.float64)
    ci = np.asarray(problem.cam_idx[:n_obs])
    pi = np.asarray(problem.pt_idx[:n_obs])
    uv = np.asarray(problem.obs_2d[:n_obs], np.float64)
    with open(path, "w") as fh:
        fh.write(f"{problem.n_cameras} {problem.n_points} {n_obs}\n")
        for o in range(n_obs):
            fh.write(f"{ci[o]} {pi[o]} {uv[o, 0]:.16e} {uv[o, 1]:.16e}\n")
        for c in range(problem.n_cameras):
            fh.write("\n".join(f"{v:.16e}" for v in cams[c]) + "\n")
        for p in range(problem.n_points):
            fh.write("\n".join(f"{v:.16e}" for v in pts[p]) + "\n")


def normalize_bal(cams, pts):
    """Center/scale the scene for f32 conditioning (SURVEY.md §7c).

    Translates the point-cloud median to the origin and rescales its median
    absolute deviation to 100 — the standard BAL normalization. Cameras'
    translations are adjusted so reprojections are unchanged.
    """
    cams = cams.copy()
    pts = pts.copy()
    med = np.median(pts, axis=0)
    dev = np.median(np.abs(pts - med).sum(axis=1))
    scale = 100.0 / max(dev, 1e-12)
    # X' = scale (X - med). Camera: P = R X + t = R (X'/scale + med) + t
    #   ⇒ with R' = R, t' = scale (t + R med), P' = scale·P projects the same
    #   (projection divides x/z so global scale cancels).
    # vectorized Rodrigues over all cameras at once (a Python per-camera
    # loop costs ~seconds at Venice's 1778 cameras and sits on the real-BAL
    # load path — VERDICT.md round 1, weak #9)
    aa = cams[:, 0:3]
    theta = np.linalg.norm(aa, axis=1, keepdims=True)            # (C, 1)
    k = aa / np.where(theta < 1e-12, 1.0, theta)                 # (C, 3)
    medb = np.broadcast_to(med, aa.shape)
    ct, st = np.cos(theta), np.sin(theta)
    Rmed = (medb * ct + _cross_np(k, medb) * st
            + k * (k @ med)[:, None] * (1.0 - ct))
    Rmed = np.where(theta < 1e-12, medb, Rmed)
    cams[:, 3:6] = scale * (cams[:, 3:6] + Rmed)
    pts = scale * (pts - med)
    return cams, pts


def make_bal_like_problem(
    name: str,
    *,
    pixel_noise: float = 1.0,
    cam_perturb: float = 0.02,
    point_perturb: float = 0.05,
    intrinsics_perturb: float = 0.0,
    outlier_frac: float = 0.0,
    seed: int = 0,
    dtype=np.float32,
    pad_multiple: int = 1024,
):
    """Synthesize a BAL-dimension-matched stand-in problem (no network —
    SURVEY.md §7e). Ladybug-style: cameras along a closed vehicle loop,
    points in a band around the trajectory, each point seen by a window of
    nearby cameras; observation count matched exactly.

    Returns (problem, ground_truth dict).
    """
    if name not in BAL_DATASET_DIMS:
        raise KeyError(f"unknown BAL stand-in {name!r}; have {sorted(BAL_DATASET_DIMS)}")
    n_cams, n_pts, n_obs = BAL_DATASET_DIMS[name]

    # disk cache: generation is deterministic but numpy on this VM is slow
    cache_key = (f"balstandin_{name}_s{seed}_n{pixel_noise}_c{cam_perturb}"
                 f"_p{point_perturb}_i{intrinsics_perturb}_o{outlier_frac}")
    cache_path = os.path.join("data", "cache", cache_key + ".npz")
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        problem = make_problem(
            z["cams0"].astype(dtype), z["points0"].astype(dtype),
            z["obs"].astype(dtype), z["cam_idx"], z["pt_idx"],
            model="bal", dtype=dtype, pad_multiple=pad_multiple,
        )
        ground_truth = {"cameras": z["cams_gt"], "points": z["points_gt"],
                        "pixel_noise": pixel_noise, "n_obs": int(z["cam_idx"].shape[0])}
        return problem, ground_truth

    rng = np.random.default_rng(seed)

    # trajectory: closed loop of radius R with lateral wobble
    s = 2 * np.pi * np.arange(n_cams) / n_cams
    R_loop = 30.0
    centers = np.stack(
        [R_loop * np.cos(s), 0.2 * rng.standard_normal(n_cams), R_loop * np.sin(s)],
        axis=-1,
    )

    # points scattered in an annulus around the loop, biased outward
    ang = 2 * np.pi * rng.random(n_pts)
    rad = R_loop + rng.normal(8.0, 3.0, n_pts)
    height = rng.normal(1.0, 2.0, n_pts)
    points_gt = np.stack([rad * np.cos(ang), height, rad * np.sin(ang)], axis=-1)

    from tpu_ba.io.synthetic import _look_at_rotation, _matrix_to_aa_np, _project_bal_np

    cams_gt = np.zeros((n_cams, 9))
    for i in range(n_cams):
        # look outward from the loop at the point band
        target = centers[i] * np.array([1.3, 0.0, 1.3])
        Rm = _look_at_rotation(centers[i], target)
        cams_gt[i, 0:3] = _matrix_to_aa_np(Rm)
        cams_gt[i, 3:6] = -Rm @ centers[i]
        cams_gt[i, 6] = 400.0 * (1.0 + 0.05 * rng.standard_normal())
        cams_gt[i, 7] = -1e-7 * rng.random()
        cams_gt[i, 8] = 1e-13 * rng.random()

    # visibility: candidate cameras = angular window around each point, then
    # keep only candidates where the point is genuinely visible (in front of
    # the camera — BAL looks down −z — and projecting to a sane pixel)
    pt_ang = np.arctan2(points_gt[:, 2], points_gt[:, 0])
    cam_ang = np.arctan2(centers[:, 2], centers[:, 0])
    k_target = max(int(np.ceil(n_obs / n_pts)), 2)
    k_window = min(n_cams, 2 * k_target + 4)
    cam_order = np.argsort(cam_ang)
    nearest_pos = np.searchsorted(cam_ang[cam_order], pt_ang) % n_cams
    offsets = np.arange(k_window) - k_window // 2
    window = cam_order[(nearest_pos[:, None] + offsets[None, :]) % n_cams]  # (P, k)

    cand_cam = window.reshape(-1).astype(np.int32)
    cand_pt = np.repeat(np.arange(n_pts, dtype=np.int32), k_window)
    cam_flat = cams_gt[cand_cam]
    X_flat = points_gt[cand_pt]
    aa, t = cam_flat[:, 0:3], cam_flat[:, 3:6]
    theta = np.linalg.norm(aa, axis=1, keepdims=True)
    k_ax = aa / np.where(theta < 1e-12, 1.0, theta)
    c, s = np.cos(theta), np.sin(theta)
    P = (X_flat * c + _cross_np(k_ax, X_flat) * s
         + k_ax * np.sum(k_ax * X_flat, 1, keepdims=True) * (1 - c) + t)
    uv = _project_bal_np(cam_flat, X_flat)
    valid = (P[:, 2] < -1.0) & (np.abs(uv) < 1500.0).all(axis=1)

    # rank candidates per point: valid first, then nearest in window order
    valid_mat = valid.reshape(n_pts, k_window)
    rank = np.argsort(~valid_mat, axis=1, kind="stable")[:, :k_target]  # (P, k_t)
    chosen_valid = np.take_along_axis(valid_mat, rank, axis=1)
    cam_idx = np.take_along_axis(window, rank, axis=1)[chosen_valid].astype(np.int32)
    pt_idx = np.repeat(np.arange(n_pts, dtype=np.int32), k_target).reshape(
        n_pts, k_target)[chosen_valid]

    # match the exact observation count: trim extras or duplicate valid pairs
    total = cam_idx.shape[0]
    if total > n_obs:
        keep = rng.permutation(total)[:n_obs]
        keep.sort()
        cam_idx, pt_idx = cam_idx[keep], pt_idx[keep]
    elif total < n_obs:
        extra = rng.integers(0, total, n_obs - total)
        cam_idx = np.concatenate([cam_idx, cam_idx[extra]])
        pt_idx = np.concatenate([pt_idx, pt_idx[extra]])

    obs = _project_bal_np(cams_gt[cam_idx], points_gt[pt_idx])
    obs += pixel_noise * rng.standard_normal(obs.shape)
    if outlier_frac > 0:
        n_out = int(outlier_frac * obs.shape[0])
        out_idx = rng.choice(obs.shape[0], n_out, replace=False)
        obs[out_idx] += rng.normal(0.0, 40.0, (n_out, 2))  # gross outliers

    cams0 = cams_gt.copy()
    cams0[:, 0:3] += cam_perturb * rng.standard_normal((n_cams, 3))
    cams0[:, 3:6] += cam_perturb * 5.0 * rng.standard_normal((n_cams, 3))
    if intrinsics_perturb > 0:
        cams0[:, 6] *= 1.0 + intrinsics_perturb * rng.standard_normal(n_cams)
        cams0[:, 7] = 0.0  # start distortion from zero: must be re-estimated
        cams0[:, 8] = 0.0
    points0 = points_gt + point_perturb * rng.standard_normal((n_pts, 3))

    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    np.savez_compressed(
        cache_path, cams0=cams0, points0=points0, obs=obs,
        cam_idx=cam_idx, pt_idx=pt_idx, cams_gt=cams_gt, points_gt=points_gt,
    )

    problem = make_problem(
        cams0.astype(dtype), points0.astype(dtype), obs.astype(dtype),
        cam_idx, pt_idx, model="bal", dtype=dtype, pad_multiple=pad_multiple,
    )
    ground_truth = {"cameras": cams_gt, "points": points_gt,
                    "pixel_noise": pixel_noise, "n_obs": int(cam_idx.shape[0])}
    return problem, ground_truth


def find_bal_file(name: str, search_dirs=("data", "/root/data")) -> str | None:
    """Locate a real BAL file if the driver ever provides one."""
    candidates = [
        f"problem-{name}.txt", f"problem-{name}.txt.gz", f"{name}.txt", f"{name}.txt.gz",
    ]
    for d in search_dirs:
        for c in candidates:
            p = os.path.join(d, c)
            if os.path.exists(p):
                return p
    return None
