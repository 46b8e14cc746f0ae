"""Sweep harnesses for the reference's paper tables.

The reference produces its tables (note F1 vs guidance w and vs
spec-dropout p) by hand in `visualization_master.ipynb` (SURVEY.md §6).
Two modes:

  * eval-side (default): full eval at each point of a w x frame-threshold
    grid over ONE checkpoint -> table + figure (ipynb cell 6);
  * training-side (`p_grid=`): one full train+test run per spec_dropout
    value -> the note/frame-F1-vs-p table + figure, the paper's central
    experiment (ipynb cell 2), in one command.

    python -m diffroll_tpu sweep pretrained_path=<ckpt> dataset.root=... \
        w_grid=[0,0.1,0.5,1,1.5,4] threshold_grid=[0.5]
    python -m diffroll_tpu sweep spec_roll p_grid=[0,0.1,0.3,0.5] \
        dataset.root=... trainer.max_epochs=20
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

from ..config import from_argv
from . import _common
from .test import run_test


def run_p_sweep(p_grid: List[float], rest: List[str]):
    """The paper's MAIN experiment end-to-end: one TRAINED model per
    spec_dropout p, each evaluated on the test split, collected into the
    note/frame-F1-vs-p table + figure (reference
    visualization_master.ipynb cell 2; BASELINE.md rows 1-2). Each point
    is a full train run — size the preset/overrides accordingly.

        python -m diffroll_tpu sweep spec_roll p_grid=[0,0.1,0.3] \\
            dataset.root=... trainer.max_epochs=...
    """
    import pathlib

    from . import train as train_cli

    out_tok = [t for t in rest if t.startswith("trainer.output_dir=")]
    base = pathlib.Path(out_tok[-1].split("=", 1)[1]) if out_tok \
        else pathlib.Path("outputs")
    sweep_dir = base / "p_sweep"
    rest = [t for t in rest if not t.startswith("trainer.output_dir=")]

    rows = []
    for p in p_grid:
        out = sweep_dir / f"p{p:g}"
        print(f"=== p-sweep point spec_dropout={p:g} -> {out}",
              file=sys.stderr)
        train_cli.main([*rest, f"model.spec_dropout={p}",
                        f"trainer.output_dir={out}"])
        metric_files = sorted(out.rglob("test_metrics.json"))
        if not metric_files:
            raise FileNotFoundError(
                f"training at p={p} produced no test_metrics.json under "
                f"{out} (no test split?)")
        rows.append({"spec_dropout": p,
                     **json.loads(metric_files[-1].read_text())})
        print(json.dumps(rows[-1]), file=sys.stderr)

    (sweep_dir / "p_sweep.json").write_text(json.dumps(rows, indent=2))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 3))
        ps = [r["spec_dropout"] for r in rows]
        for key, marker in (("note_f1", "o"), ("frame_f1", "s")):
            ax.plot(ps, [100 * r[key] for r in rows], marker=marker,
                    label=key.replace("_", " "))
        ax.set_xlabel("spec dropout p")
        ax.set_ylabel("F1 (%)")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(sweep_dir / "p_sweep.png", dpi=120)
    except Exception as e:
        print(f"p-sweep figure skipped: {e}", file=sys.stderr)
    print(json.dumps({"run_dir": str(sweep_dir), "points": len(rows)}))
    return rows


def main(argv: Optional[List[str]] = None):
    argv = sys.argv[1:] if argv is None else argv
    w_grid = [0.0, 0.1, 0.5, 1.0, 1.5, 4.0]
    thr_grid = [0.5]
    p_grid: Optional[List[float]] = None
    rest = []
    for tok in argv:
        if tok.startswith("w_grid="):
            w_grid = [float(v) for v in tok.split("=", 1)[1].strip("[]").split(",")]
        elif tok.startswith("threshold_grid="):
            thr_grid = [float(v) for v in tok.split("=", 1)[1].strip("[]").split(",")]
        elif tok.startswith("p_grid="):
            p_grid = [float(v) for v in tok.split("=", 1)[1].strip("[]").split(",")]
        else:
            rest.append(tok)

    if p_grid is not None:
        return run_p_sweep(p_grid, rest)

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
