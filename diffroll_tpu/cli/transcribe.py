"""Transcription of arbitrary-length audio files (beyond the reference,
whose pipeline is fixed to 20.48 s windows — reference README.md:126).

    python -m diffroll_tpu transcribe pretrained_path=<ckpt> \
        dataset.audio_path=my_audio dataset.audio_ext=mp3 \
        task.w=0.5 overlap_frames=32
"""

from __future__ import annotations

import json
import pathlib
import sys
from typing import List, Optional

import jax
import numpy as np

from ..config import from_argv
from ..io.wav import read_wav, resample
from ..tasks.transcribe import transcribe_long
from . import _common
from .sample import export_clip


def main(argv: Optional[List[str]] = None):
    argv = sys.argv[1:] if argv is None else argv
    overlap = 32
    rest = []
    for tok in argv:
        if tok.startswith("overlap_frames="):
            overlap = int(tok.split("=", 1)[1])
        else:
            rest.append(tok)
    cfg, _, overrides = from_argv(rest, "sampling")
    cfg, model, task, state = _common.load_pretrained(cfg, overrides=overrides)
    run_dir = _common.make_run_dir(cfg, "transcribe")
    mesh = _common.setup_mesh(cfg)

    folder = pathlib.Path(cfg.dataset.audio_path)
    files = sorted(folder.glob(f"*.{cfg.dataset.audio_ext}"))
    if not files:
        raise SystemExit(f"no *.{cfg.dataset.audio_ext} files under {folder}")

    key = jax.random.key(cfg.trainer.seed)
    manifest = []
    for i, f in enumerate(files):
        audio, sr = read_wav(f, mono=True)
        if sr != cfg.dataset.sampling_rate:
            audio = resample(audio, sr, cfg.dataset.sampling_rate)
        key, k = jax.random.split(key)
        roll = transcribe_long(
            task, state.params, audio, k,
            sample_rate=cfg.dataset.sampling_rate,
            batch_size=cfg.dataloader.test_batch_size,
            overlap_frames=overlap, mesh=mesh,
        )
        n_notes = export_clip(run_dir, f"{i:03d}_{f.stem}", roll, cfg)
        manifest.append({"file": f.name, "frames": int(roll.shape[0]),
                         "notes": n_notes})
        print(f"{f.name}: {roll.shape[0]} frames, {n_notes} notes",
              file=sys.stderr)

    (run_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({"run_dir": str(run_dir), "clips": len(manifest)}))
    return run_dir


if __name__ == "__main__":
    main()
