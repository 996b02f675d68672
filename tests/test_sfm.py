"""SfM frontend tests: features → matching → two-view → PnP → incremental."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ba.geometry.rotations import aa_to_matrix, matrix_to_aa
from tpu_ba.io.sequences import render_blob_sequence
from tpu_ba.sfm.features import detect_harris, describe_patches
from tpu_ba.sfm.matching import match_descriptors
from tpu_ba.sfm.pnp import pnp_ransac
from tpu_ba.sfm.triangulate import triangulate_points
from tpu_ba.sfm.twoview import estimate_essential_ransac, decompose_essential


def test_harris_finds_blobs():
    frames, gt = render_blob_sequence(n_frames=1, n_points=60, seed=1)
    xy, score = detect_harris(jnp.asarray(frames[0]), max_corners=128)
    assert int(jnp.sum(score > 0)) >= 40  # most blobs found


def test_matching_consistency():
    frames, gt = render_blob_sequence(n_frames=5, n_points=80, seed=2)
    d = []
    kp = []
    sc = []
    for f in range(2):  # adjacent frames (small baseline)
        img = jnp.asarray(frames[f])
        xy, s = detect_harris(img, max_corners=128)
        kp.append(np.asarray(xy))
        sc.append(s)
        d.append(describe_patches(img, xy))
    idx2, val = match_descriptors(d[0], d[1], sc[0], sc[1])
    assert int(jnp.sum(val)) >= 25


def _synthetic_two_view(n=100, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 8, n)], -1)
    aa = np.array([0.03, -0.05, 0.02])
    t = np.array([0.6, 0.1, 0.05])
    R = np.asarray(aa_to_matrix(jnp.asarray(aa)))
    x1 = X[:, 0:2] / X[:, 2:3]
    Xc = X @ R.T + t
    x2 = Xc[:, 0:2] / Xc[:, 2:3]
    x1 += noise * rng.standard_normal(x1.shape)
    x2 += noise * rng.standard_normal(x2.shape)
    return X, R, t, x1, x2


def test_essential_and_decompose():
    X, R, t, x1, x2 = _synthetic_two_view(noise=1e-4)
    key = jax.random.PRNGKey(0)
    E, inl, n = estimate_essential_ransac(
        key, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        jnp.ones(len(x1), bool), inlier_thresh=1e-4)
    assert int(n) > 80
    R_est, t_est, n_good = decompose_essential(
        E, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), inl)
    # rotation error
    dR = np.asarray(R_est) @ R.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, f"rotation error {ang}"
    # translation direction (E determines t up to scale)
    t_dir = np.asarray(t_est) / np.linalg.norm(np.asarray(t_est))
    cos = abs(t_dir @ (t / np.linalg.norm(t)))
    assert cos > 0.99, f"translation direction cos {cos}"


def test_triangulation_exact():
    X, R, t, x1, x2 = _synthetic_two_view(noise=0.0)
    P1 = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1), jnp.float64)
    P2 = jnp.asarray(np.concatenate([R, t[:, None]], 1), jnp.float64)
    Xt = triangulate_points(P1, P2, jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(Xt), X, rtol=1e-5, atol=1e-6)


def test_pnp_recovers_pose():
    rng = np.random.default_rng(3)
    X = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-2, 2, 200),
                  rng.uniform(4, 8, 200)], -1)
    aa = np.array([0.1, -0.2, 0.05])
    t = np.array([0.3, -0.1, 0.5])
    R = np.asarray(aa_to_matrix(jnp.asarray(aa)))
    Xc = X @ R.T + t
    x = Xc[:, 0:2] / Xc[:, 2:3] + 1e-4 * rng.standard_normal((200, 2))
    aa_e, t_e, inl, n = pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(X, jnp.float32),
        jnp.asarray(x, jnp.float32), jnp.ones(200, bool), inlier_thresh=1e-5)
    assert int(n) > 150
    np.testing.assert_allclose(np.asarray(t_e), t, atol=0.01)
    np.testing.assert_allclose(np.asarray(aa_e), aa, atol=0.01)


def test_incremental_sfm_end_to_end():
    from tpu_ba.sfm.incremental import SfMConfig, run_incremental_sfm

    frames, gt = render_blob_sequence(n_frames=6, n_points=200, seed=4)
    res = run_incremental_sfm(frames, gt["K"],
                              SfMConfig(max_corners=256, ba_iters=5,
                                        final_ba_iters=10))
    assert res.registered.sum() >= 5, res.report
    assert res.report["n_points"] > 50, res.report
    # mean reprojection error under a pixel
    rmse = np.sqrt(2 * res.final_cost / max(res.report["n_obs"], 1))
    assert rmse < 2.0, (rmse, res.report)


def test_kitti_format_directory_end_to_end(tmp_path):
    """KITTI-format directory → io.sequences.read_kitti_sequence → full
    incremental SfM (VERDICT round 2, next #5: a disk-format sequence had
    never been driven end-to-end)."""
    import os

    import numpy as np
    from PIL import Image

    from tpu_ba.io.sequences import read_kitti_sequence, render_blob_sequence
    from tpu_ba.sfm.incremental import SfMConfig, run_incremental_sfm

    frames, gt = render_blob_sequence(n_frames=10, n_points=250, seed=6)

    root = tmp_path / "seq00"
    img_dir = root / "image_0"
    os.makedirs(img_dir)
    for i, f in enumerate(np.asarray(frames)):
        Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8)).save(
            img_dir / f"{i:06d}.png")
    np.savetxt(root / "times.txt", 0.1 * np.arange(frames.shape[0]))
    fx, fy, cx, cy = gt["K"]
    with open(root / "calib.txt", "w") as fh:
        fh.write("P0: " + " ".join(str(v) for v in
                                   [fx, 0, cx, 0, 0, fy, cy, 0, 0, 0, 1, 0])
                 + "\n")

    rframes, rgt = read_kitti_sequence(str(root))
    assert rframes.shape == frames.shape
    np.testing.assert_allclose(rgt["K"], gt["K"], rtol=1e-6)
    # 8-bit PNG round trip quantizes intensities — stay within 1/255
    assert np.max(np.abs(rframes - np.asarray(frames))) <= 1.5 / 255

    res = run_incremental_sfm(rframes, rgt["K"], SfMConfig(seed=6))
    assert res.registered.sum() >= 8
    from tpu_ba.bench.ate import ate_rmse

    ate = ate_rmse(res.poses, gt["poses"], mask=res.registered)
    assert ate["ate_rmse"] < 0.5, ate
