"""Guidance / threshold sweep harness.

The reference produces its paper tables (note F1 vs guidance w and vs
spec-dropout p) by hand in `visualization_master.ipynb` (SURVEY.md §6).
This entry runs the full eval at each point of a w (and/or
frame-threshold) grid over one checkpoint and writes a machine-readable
table + a figure.

    python -m diffroll_tpu sweep pretrained_path=<ckpt> dataset.root=... \
        w_grid=[0,0.1,0.5,1,1.5,4] threshold_grid=[0.5]
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

from ..config import from_argv
from . import _common
from .test import run_test


def main(argv: Optional[List[str]] = None):
    argv = sys.argv[1:] if argv is None else argv
    w_grid = [0.0, 0.1, 0.5, 1.0, 1.5, 4.0]
    thr_grid = [0.5]
    rest = []
    for tok in argv:
        if tok.startswith("w_grid="):
            w_grid = [float(v) for v in tok.split("=", 1)[1].strip("[]").split(",")]
        elif tok.startswith("threshold_grid="):
            thr_grid = [float(v) for v in tok.split("=", 1)[1].strip("[]").split(",")]
        else:
            rest.append(tok)

    cfg, _, overrides = from_argv(rest, "test")
    cfg, model, task, state = _common.load_pretrained(cfg, overrides=overrides)
    run_dir = _common.make_run_dir(cfg, "sweep")

    rows = []
    for w in w_grid:
        # one sampling pass per w; thresholding is eval-only, so every
        # threshold is scored from the same sampled rolls
        c = cfg.replace(task=cfg.task.replace(w=w))
        t = type(task)(model, c.task) if c.task_type != "baseline" else task
        by_thr = run_test(c, model, t, state, thresholds=thr_grid)
        for thr in thr_grid:
            rows.append({"w": w, "frame_threshold": thr, **by_thr[thr]})
            print(json.dumps(rows[-1]), file=sys.stderr)

    (run_dir / "sweep.json").write_text(json.dumps(rows, indent=2))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 3))
        for thr in thr_grid:
            pts = [r for r in rows if r["frame_threshold"] == thr]
            ax.plot([r["w"] for r in pts], [100 * r["note_f1"] for r in pts],
                    marker="o", label=f"thr={thr}")
        ax.set_xlabel("guidance w")
        ax.set_ylabel("note F1 (%)")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(run_dir / "sweep.png", dpi=120)
    except Exception as e:  # figure is decoration; the json table already
        print(f"sweep figure skipped: {e}", file=sys.stderr)  # landed above
    print(json.dumps({"run_dir": str(run_dir), "points": len(rows)}))
    return rows


if __name__ == "__main__":
    main()
