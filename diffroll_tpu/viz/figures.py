"""Roll/spec visualization: validation figure grids and denoising GIFs.

Equivalent of the reference's TensorBoard figure grids
(`visualize_figure`, reference task/diffusion.py:643-649, 1069-1076) and
the reverse-process animation (`animate_sampling`, :1078-1088, GIF export
:356-378). matplotlib runs host-side on numpy copies; the trajectory
arrives as one stacked array from the sampler scan's `record_every`
outputs instead of 200 per-step host syncs.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def roll_figure(
    pred: np.ndarray,
    label: Optional[np.ndarray] = None,
    spec: Optional[np.ndarray] = None,
    max_cols: int = 2,
):
    """Grid of predicted rolls (top), labels / specs below when given.

    pred/label: (B, T, 88); spec: (B, T, n_mels). Returns the figure.
    """
    plt = _mpl()
    pred = np.asarray(pred)
    b = min(pred.shape[0], max_cols)
    rows = 1 + (label is not None) + (spec is not None)
    fig, axes = plt.subplots(rows, b, figsize=(4 * b, 2.2 * rows),
                             squeeze=False)
    for j in range(b):
        axes[0][j].imshow(pred[j].T, aspect="auto", origin="lower",
                          cmap="magma")
        axes[0][j].set_title(f"pred {j}", fontsize=8)
        r = 1
        if label is not None:
            axes[r][j].imshow(np.asarray(label)[j].T, aspect="auto",
                              origin="lower", cmap="magma")
            axes[r][j].set_title(f"label {j}", fontsize=8)
            r += 1
        if spec is not None:
            axes[r][j].imshow(np.asarray(spec)[j].T, aspect="auto",
                              origin="lower", cmap="viridis")
            axes[r][j].set_title(f"spec {j}", fontsize=8)
    for ax in fig.axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    return fig


def param_heatmaps(params, names=("trainable_parameters", "uncon_z"),
                   max_panels: int = 4):
    """Heatmaps of learned unconditional embeddings — the reference logs
    these every validation epoch (reference task/diffusion.py:282-288).
    `params` is a flax params tree; matching leaves are rendered."""
    plt = _mpl()
    import jax

    leaves = [
        (jax.tree_util.keystr(path), np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if any(n in jax.tree_util.keystr(path) for n in names)
        and getattr(leaf, "ndim", 0) == 2
    ][:max_panels]
    if not leaves:
        return None
    fig, axes = plt.subplots(1, len(leaves), figsize=(4 * len(leaves), 2.5),
                             squeeze=False)
    for ax, (name, leaf) in zip(axes[0], leaves):
        im = ax.imshow(leaf.T, aspect="auto", origin="lower", cmap="coolwarm")
        ax.set_title(name.split("'")[-2] if "'" in name else name, fontsize=7)
        fig.colorbar(im, ax=ax, fraction=0.05)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    return fig


def animate_trajectory(trajectory: np.ndarray, clip: int = 0, fps: int = 8):
    """(S, B, T, 88) sampler trajectory -> matplotlib animation for `clip`."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    traj = np.asarray(trajectory)[:, clip]  # (S, T, 88)
    fig, ax = plt.subplots(figsize=(6, 3))
    im = ax.imshow(traj[0].T, aspect="auto", origin="lower", cmap="magma",
                   vmin=traj.min(), vmax=traj.max())
    ax.set_xticks([])
    ax.set_yticks([])
    title = ax.set_title("step 0", fontsize=9)

    def update(i):
        im.set_data(traj[i].T)
        title.set_text(f"step {i}")
        return [im, title]

    anim = FuncAnimation(fig, update, frames=len(traj), interval=1000 // fps,
                         blit=False)
    return fig, anim


def save_trajectory_gif(
    trajectory: np.ndarray,
    path: str | pathlib.Path,
    clip: int = 0,
    fps: int = 8,
) -> pathlib.Path:
    """Write the denoising animation as a GIF (pillow writer — the
    reference needs imagemagick, reference task/diffusion.py:377)."""
    fig, anim = animate_trajectory(trajectory, clip=clip, fps=fps)
    path = pathlib.Path(path)
    anim.save(str(path), writer="pillow", fps=fps)
    _mpl().close(fig)
    return path
