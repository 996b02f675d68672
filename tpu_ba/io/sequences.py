"""Image-sequence input: synthetic renderer + TUM/KITTI readers.

Capability parity: the reference class of package is driven by demo image
sequences (SURVEY.md §2.1 R8); BASELINE.json config 4 asks for a "TUM/KITTI
sequence" through the SfM pipeline. This sandbox has no network and no real
datasets (SURVEY.md §7e), so:

* :func:`render_blob_sequence` — the testable stand-in: renders Gaussian
  keypoint blobs of a known 3-D scene along a known trajectory, giving an
  end-to-end SfM ground truth (documented as synthetic in all reports).
* :func:`read_tum_sequence` / :func:`read_kitti_sequence` — real-format
  readers (TUM rgb.txt + groundtruth.txt; KITTI odometry image_0/times/calib)
  that load actual datasets if ever provided on disk.
"""

from __future__ import annotations

import os

import numpy as np


def render_blob_sequence(n_frames: int = 8, n_points: int = 300,
                         H: int = 240, W: int = 320,
                         fx: float = 280.0, fy: float = 280.0,
                         seed: int = 0, blob_sigma: float = 1.2,
                         noise: float = 0.01):
    """Render a synthetic tracked-keypoint sequence (+z pinhole convention).

    Returns (frames (F, H, W) float32 in [0, 1], gt) with gt containing true
    poses (F, 6), points (P, 3), and intrinsics (fx, fy, cx, cy).
    """
    import jax
    import jax.numpy as jnp

    from tpu_ba.geometry.rotations import matrix_to_aa
    from tpu_ba.io.synthetic import _look_at_rotation

    rng = np.random.default_rng(seed)
    cx, cy = W / 2.0, H / 2.0

    # points in a slab in front of the cameras
    points = np.stack([
        rng.uniform(-3.0, 3.0, n_points),
        rng.uniform(-2.2, 2.2, n_points),
        rng.uniform(5.0, 9.0, n_points),
    ], axis=-1)
    # each point renders as a distinctive multi-lobe sprite (distinct local
    # appearance — otherwise normalized patch descriptors cannot tell
    # identical Gaussian blobs apart and the ratio test kills every match)
    n_lobes = 5
    ring_ang = rng.uniform(0, 2 * np.pi, (n_points, n_lobes))
    ring_rad = rng.uniform(2.2, 3.8, (n_points, n_lobes))
    lobe_off = np.stack([ring_rad * np.cos(ring_ang), ring_rad * np.sin(ring_ang)], -1)
    lobe_off[:, 0, :] = 0.0  # dominant central lobe keeps the corner on-point
    lobe_amp = rng.uniform(0.15, 0.4, (n_points, n_lobes))
    lobe_amp[:, 0] = 1.0

    # sideways arc trajectory looking at the slab center
    target = np.array([0.0, 0.0, 7.0])
    poses = np.zeros((n_frames, 6))
    for f in range(n_frames):
        s = (f / max(n_frames - 1, 1) - 0.5)
        center = np.array([3.0 * s, 0.6 * s, 0.4 * np.abs(s)])
        # +z convention: view direction maps to +z ⇒ rows [x, y, +d]
        d = target - center
        d = d / np.linalg.norm(d)
        up = np.array([0.0, 1.0, 0.0])
        x_cam = np.cross(up, d)  # right-handed with +z forward
        x_cam /= np.linalg.norm(x_cam)
        y_cam = np.cross(d, x_cam)
        R = np.stack([x_cam, y_cam, d])
        import jax.numpy as _jnp
        poses[f, 0:3] = np.asarray(matrix_to_aa(_jnp.asarray(R)))
        poses[f, 3:6] = -R @ center

    # render: sum of per-point sprites at projected locations (vectorized)
    pts_j = jnp.asarray(points, jnp.float32)
    off_j = jnp.asarray(lobe_off.reshape(-1, 2), jnp.float32)      # (P*L, 2)
    amp_j = jnp.asarray(lobe_amp.reshape(-1), jnp.float32)         # (P*L,)
    yy, xx = jnp.mgrid[0:H, 0:W]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)

    @jax.jit
    def render(aa, t):
        from tpu_ba.geometry.rotations import rotate_aa
        P = rotate_aa(aa[None, :], pts_j) + t[None, :]
        z = jnp.maximum(P[:, 2], 1e-3)
        u = fx * P[:, 0] / z + cx
        v = fy * P[:, 1] / z + cy
        vis = (u > 4) & (u < W - 5) & (v > 4) & (v < H - 5) & (P[:, 2] > 0.5)
        uu = jnp.repeat(u, n_lobes) + off_j[:, 0]
        vv = jnp.repeat(v, n_lobes) + off_j[:, 1]
        w = jnp.repeat(jnp.where(vis, 1.0, 0.0), n_lobes) * amp_j
        d2 = (xx[None] - uu[:, None, None]) ** 2 + (yy[None] - vv[:, None, None]) ** 2
        img = jnp.sum(w[:, None, None] * jnp.exp(-d2 / (2 * blob_sigma**2)), axis=0)
        return jnp.clip(img, 0.0, 1.0)

    frames = np.stack([
        np.asarray(render(jnp.asarray(poses[f, 0:3], jnp.float32),
                          jnp.asarray(poses[f, 3:6], jnp.float32)))
        for f in range(n_frames)
    ])
    frames += noise * rng.standard_normal(frames.shape).astype(np.float32)
    frames = np.clip(frames, 0.0, 1.0).astype(np.float32)

    gt = {"poses": poses, "points": points, "K": (fx, fy, cx, cy)}
    return frames, gt


def read_tum_sequence(root: str, max_frames: int | None = None):
    """Read a TUM RGB-D style sequence directory: ``rgb.txt`` (timestamp
    filename per line) and optional ``groundtruth.txt`` (t tx ty tz qx qy qz
    qw). Returns (frames (F, H, W) float32 grayscale, gt dict)."""
    from PIL import Image

    rgb_txt = os.path.join(root, "rgb.txt")
    entries = []
    with open(rgb_txt) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, path = line.split()[:2]
            entries.append((float(ts), os.path.join(root, path)))
    if max_frames:
        entries = entries[:max_frames]
    frames = np.stack([
        np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        for _, p in entries
    ])
    gt = {"timestamps": np.asarray([t for t, _ in entries])}
    gt_txt = os.path.join(root, "groundtruth.txt")
    if os.path.exists(gt_txt):
        rows = []
        with open(gt_txt) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append([float(v) for v in line.split()])
        gt["trajectory"] = np.asarray(rows)  # t tx ty tz qx qy qz qw
    return frames, gt


def read_kitti_sequence(root: str, max_frames: int | None = None):
    """Read a KITTI odometry sequence directory: ``image_0/*.png``,
    ``times.txt``, ``calib.txt`` (P0 row). Returns (frames, gt dict)."""
    from PIL import Image

    img_dir = os.path.join(root, "image_0")
    names = sorted(n for n in os.listdir(img_dir) if n.endswith(".png"))
    if max_frames:
        names = names[:max_frames]
    frames = np.stack([
        np.asarray(Image.open(os.path.join(img_dir, n)).convert("L"), np.float32) / 255.0
        for n in names
    ])
    gt = {}
    times = os.path.join(root, "times.txt")
    if os.path.exists(times):
        gt["timestamps"] = np.loadtxt(times)
    calib = os.path.join(root, "calib.txt")
    if os.path.exists(calib):
        with open(calib) as fh:
            for line in fh:
                if line.startswith("P0:"):
                    P0 = np.asarray([float(v) for v in line.split()[1:]]).reshape(3, 4)
                    gt["K"] = (P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2])
    return frames, gt
