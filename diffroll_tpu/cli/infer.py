"""Unconditional roll generation with the U-Net (RollDiffusion) family.

Mirrors `infer.py` (reference :19-45): sample pure noise shaped like a
piano roll, run the unconditional reverse process, save the trajectory and
decoded MIDI.

    python -m diffroll_tpu infer pretrained_path=<ckpt> num_samples=4
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

import jax
import numpy as np

from ..config import from_argv
from . import _common
from .sample import export_clip


def main(argv: Optional[List[str]] = None):
    cfg, _, overrides = from_argv(sys.argv[1:] if argv is None else argv, "infer")
    cfg, model, task, state = _common.load_pretrained(cfg, overrides=overrides)
    run_dir = _common.make_run_dir(cfg, "infer")

    sample = jax.jit(
        lambda params, x_T, k: task.sample(params, x_T, k, record_every=10)
    )
    key = jax.random.key(cfg.trainer.seed)
    key, nk, sk = jax.random.split(key, 3)
    x_T = jax.random.normal(nk, (cfg.num_samples, cfg.model.frames,
                                 cfg.model.pitches))
    x0, traj = sample(state.params, x_T, sk)
    x0, traj = np.asarray(x0), np.asarray(traj)

    manifest = []
    for j in range(cfg.num_samples):
        n = export_clip(run_dir, f"roll_{j:03d}", x0[j], cfg,
                        trajectory=traj[:, j])
        manifest.append({"clip": f"roll_{j:03d}", "notes": n})
    (run_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({"run_dir": str(run_dir), "clips": len(manifest)}))
    return run_dir


if __name__ == "__main__":
    main()
