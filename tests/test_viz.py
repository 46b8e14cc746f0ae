"""Visualization smoke tests: figure grid + denoising GIF export."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from diffroll_tpu.viz import roll_figure, save_trajectory_gif


def test_roll_figure_variants():
    rng = np.random.RandomState(0)
    pred = rng.rand(3, 32, 88)
    label = (rng.rand(3, 32, 88) > 0.9).astype(np.float32)
    spec = rng.rand(3, 32, 229)
    fig = roll_figure(pred, label, spec)
    assert len(fig.axes) == 6  # 3 rows x 2 cols (max_cols)
    fig2 = roll_figure(pred)
    assert len(fig2.axes) == 2
    import matplotlib.pyplot as plt

    plt.close("all")


def test_trajectory_gif(tmp_path):
    rng = np.random.RandomState(1)
    traj = rng.rand(5, 2, 32, 88).astype(np.float32)
    out = save_trajectory_gif(traj, tmp_path / "anim.gif", clip=1, fps=4)
    data = out.read_bytes()
    assert data[:6] in (b"GIF87a", b"GIF89a")
    assert len(data) > 1000
