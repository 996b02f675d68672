"""Scene and convergence visualization (headless matplotlib).

Capability parity: the reference's plotting of cameras/points and
reprojection overlays (SURVEY.md §2.1 R8 "plot cameras/points",
"reprojection overlays"; reference mount empty, see SURVEY.md §0).
All functions render to a file (Agg backend — the sandbox has no display)
and return the path.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _camera_centers(cameras) -> np.ndarray:
    """BAL convention: x_cam = R(aa) @ X + t  ⇒  center = −Rᵀ t."""
    import jax

    from tpu_ba.geometry.rotations import aa_to_matrix

    cams = np.asarray(cameras)
    R = np.asarray(jax.vmap(aa_to_matrix)(cams[:, :3]))
    t = cams[:, 3:6]
    return -np.einsum("cij,ci->cj", R, t)


def plot_scene(cameras, points, path: str, *, title: str = "scene",
               max_points: int = 20000, elev: float = 20.0,
               azim: float = -60.0) -> str:
    """3-D scatter of structure + camera centers (reference-style scene plot)."""
    plt = _plt()
    pts = np.asarray(points)
    if pts.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], max_points, replace=False)
        pts = pts[sel]
    centers = _camera_centers(cameras)

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, c="#4477aa", alpha=0.4,
               label=f"points ({pts.shape[0]})")
    ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], s=14, c="#cc3311",
               marker="^", label=f"cameras ({centers.shape[0]})")
    # robust axis limits (BA scenes have outliers)
    allp = np.concatenate([pts, centers])
    lo, hi = np.percentile(allp, 2, axis=0), np.percentile(allp, 98, axis=0)
    mid, span = (lo + hi) / 2, float(np.max(hi - lo)) / 2 + 1e-9
    ax.set_xlim(mid[0] - span, mid[0] + span)
    ax.set_ylim(mid[1] - span, mid[1] + span)
    ax.set_zlim(mid[2] - span, mid[2] + span)
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_reprojection(problem, cameras, points, path: str, *,
                      camera: int = 0, title: str | None = None) -> str:
    """Measured vs reprojected 2-D features for one camera (overlay plot)."""
    import jax
    import jax.numpy as jnp

    from tpu_ba.geometry.cameras import project_bal

    plt = _plt()
    ci = np.asarray(problem.cam_idx)
    mask = np.asarray(problem.mask)
    sel = np.nonzero((ci == camera) & mask)[0]
    obs = np.asarray(problem.obs_2d)[sel]
    pts = jnp.asarray(np.asarray(points)[np.asarray(problem.pt_idx)[sel]])
    cam = jnp.asarray(np.asarray(cameras)[camera])
    proj = np.asarray(jax.vmap(project_bal, in_axes=(None, 0))(cam, pts))

    fig, ax = plt.subplots(figsize=(7, 6))
    ax.scatter(obs[:, 0], obs[:, 1], s=10, c="#4477aa", label="measured")
    ax.scatter(proj[:, 0], proj[:, 1], s=10, c="#cc3311", marker="x",
               label="reprojected")
    for k in range(min(len(sel), 400)):
        ax.plot([obs[k, 0], proj[k, 0]], [obs[k, 1], proj[k, 1]],
                c="gray", lw=0.4, alpha=0.5)
    err = np.sqrt(((obs - proj) ** 2).sum(-1))
    ax.set_title(title or f"camera {camera}: reprojection "
                          f"(rmse {float(np.sqrt((err**2).mean())):.2f}px)")
    ax.invert_yaxis()
    ax.legend(fontsize=8)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_convergence(result, path: str, *, title: str = "LM convergence") -> str:
    """Cost / λ / CG-iteration histories from an LMResult."""
    plt = _plt()
    cost = np.asarray(result.cost_history, np.float64)
    lam = np.asarray(result.lam_history, np.float64)
    cg = np.asarray(result.cg_history)
    n = int(result.iterations)
    it = np.arange(1, n + 1)

    fig, axes = plt.subplots(3, 1, figsize=(7, 8), sharex=True)
    axes[0].semilogy(it, np.maximum(cost[:n], 1e-30), c="#4477aa")
    axes[0].set_ylabel("cost")
    axes[0].set_title(title)
    axes[1].semilogy(it, np.maximum(lam[:n], 1e-30), c="#cc3311")
    axes[1].set_ylabel("λ")
    axes[2].bar(it, cg[:n], color="#228833")
    axes[2].set_ylabel("CG iters")
    axes[2].set_xlabel("LM iteration (linear solves)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
