"""Sampling entry: transcription / inpainting / generation from noise.

Mirrors `sampling.py` (reference :22-73) + `predict_step` (reference
task/diffusion.py:513-637): Gaussian noise (S, 640, 88), optionally paired
with waveforms from a folder of audio (`Custom`) or a dataset split, run
through the configured reverse-diffusion sampler, then exported as piano
rolls (npz), note events, and MIDI files (notes shorter than
`task.generation_filter` seconds are dropped, reference :609).

MIDI timing uses the real hop/sr grid — NOT the reference's HOP_LENGTH=160
constant, which compresses predict-step MIDI 3.2x (reference
task/diffusion.py:19,604; SURVEY.md §7 'bugs not to replicate').

    python -m diffroll_tpu sample dataset.audio_path=my_audio dataset.audio_ext=mp3 \
        pretrained_path=<ckpt> task.w=0.5
    python -m diffroll_tpu sample task.sampling_type=generation_ddpm_x0 \
        pretrained_path=<ckpt> num_samples=8
    python -m diffroll_tpu sample task.sampling_type=inpainting_ddpm_x0 \
        task.inpainting_t=[100,200] pretrained_path=<ckpt> dataset.name=MAPS
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import from_argv
from ..eval.notes import extract_notes, notes_to_hz_seconds
from ..io.midi import write_midi
from . import _common


def export_clip(run_dir, name, roll, cfg, trajectory=None):
    """Save one sampled roll: npz + decoded MIDI (+ trajectory snapshots)."""
    np.savez_compressed(run_dir / f"{name}.npz", roll=roll,
                        **({"trajectory": trajectory} if trajectory is not None else {}))
    pitches, intervals = extract_notes(
        roll, roll, cfg.task.frame_threshold, cfg.task.frame_threshold
    )
    scaling = cfg.dataset.hop_length / cfg.dataset.sampling_rate
    keep = (intervals[:, 1] - intervals[:, 0]) * scaling > cfg.task.generation_filter
    pitches, intervals = pitches[keep], intervals[keep]
    sec = intervals.astype(np.float64) * scaling
    write_midi(str(run_dir / f"{name}.mid"),
               (pitches + 21).tolist(), [tuple(iv) for iv in sec])
    return int(len(pitches))


def main(argv: Optional[List[str]] = None):
    cfg, _, overrides = from_argv(sys.argv[1:] if argv is None else argv, "sampling")
    cfg, model, task, state = _common.load_pretrained(cfg, overrides=overrides)
    run_dir = _common.make_run_dir(cfg, "sample")
    generation = cfg.task.sampling_type.startswith("generation")

    frames, pitches = cfg.model.frames, cfg.model.pitches
    key = jax.random.key(cfg.trainer.seed)

    if generation:
        # pure noise; no audio needed (reference sampling.py:44-46)
        batches = [
            {"audio": None, "file_name": [f"gen_{i}" for i in
                                          range(cfg.dataloader.test_batch_size)]}
            for _ in range(-(-cfg.num_samples // cfg.dataloader.test_batch_size))
        ]
    else:
        ds = _common.build_dataset(cfg.dataset, "test")
        loader = _common.build_loader(cfg, ds, "test")
        batches = list(loader)

    sample = jax.jit(
        lambda params, x_T, k, waveform: task.sample(
            params, x_T, k, waveform=waveform, record_every=10)
    )
    sample_uncond = jax.jit(
        lambda params, x_T, k: task.sample(params, x_T, k, record_every=10)
    )

    manifest = []
    idx = 0
    for batch in batches:
        if generation:
            bsz = len(batch["file_name"])
        else:
            bsz = len(batch["audio"])
        key, nk, sk = jax.random.split(key, 3)
        x_T = jax.random.normal(nk, (bsz, frames, pitches))
        if generation or batch["audio"] is None:
            x0, traj = sample_uncond(state.params, x_T, sk)
        else:
            x0, traj = sample(state.params, x_T, sk, jnp.asarray(batch["audio"]))
        x0 = np.asarray(x0)
        traj = np.asarray(traj) if traj is not None else None
        if idx == 0 and traj is not None:
            # denoising animation for the first clip (the reference's
            # algo2.gif, task/diffusion.py:356-378)
            from ..viz import save_trajectory_gif

            save_trajectory_gif(traj, run_dir / "denoising.gif")
        names = batch.get("file_name") or [f"clip_{idx + j}" for j in range(bsz)]
        # num_samples caps EVERY mode (reference sampling.py:26-27 draws
        # exactly S noise tensors; before r4 only generation honored it and
        # a dataset-driven run sampled the entire split)
        for j in range(min(bsz, cfg.num_samples - idx)):
            name = str(names[j]).rsplit(".", 1)[0]
            n_notes = export_clip(
                run_dir, f"{idx + j:03d}_{name}", x0[j], cfg,
                trajectory=traj[:, j] if traj is not None else None,
            )
            manifest.append({"clip": name, "notes": n_notes})
        idx += bsz
        if idx >= cfg.num_samples:
            break

    (run_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({"run_dir": str(run_dir), "clips": len(manifest)}))
    return run_dir


if __name__ == "__main__":
    main()
