from .figures import (
    animate_trajectory,
    param_heatmaps,
    roll_figure,
    save_trajectory_gif,
)

__all__ = ["roll_figure", "animate_trajectory", "save_trajectory_gif",
           "param_heatmaps"]
