"""Eval boundary measurement: butted tiles vs context-overlapped windows.

The eval protocol scores full recordings reassembled from fixed-size
windows (reference `overlap: True` segmentation, config/dataset/MAPS.yaml:
26-44). Our windows were butted tiles (r2); frames near window edges are
denoised with truncated temporal context and an onset split across a
boundary can fracture a note. This tool measures what that costs: train
the small flagship on the synthetic corpus (v2), build LONG held-out
recordings (several windows each), and score them two ways with the SAME
trained model and the SAME sampler draws:

  * tiled    — butted windows, concatenated (the r2 eval protocol;
               dataset.eval_overlap_frames=0)
  * stitched — windows sharing `overlap` frames, crossfade-stitched
               (tasks/transcribe.stitch_rolls; eval_overlap_frames>0)

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python -u tools/eval_boundary.py
CPU smoke: ... platform=cpu steps=200 n_train=16 n_long=2

Output: one JSON line with note/frame F1 per protocol + the deltas.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
if ARGS.get("platform"):
    import jax

    jax.config.update("jax_platforms", ARGS["platform"])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from synthetic_end_to_end import (FRAMES, HOP, SEQ, SR, TIMESTEPS,  # noqa: E402
                                  render_notes_v2)
from diffroll_tpu import models  # noqa: E402
from diffroll_tpu.data.rasterize import rasterize_notes  # noqa: E402
from diffroll_tpu.eval.evaluate import evaluate_rolls  # noqa: E402
from diffroll_tpu.io.midi import MidiNote  # noqa: E402
from diffroll_tpu.tasks import DiffusionTask, TaskConfig  # noqa: E402
from diffroll_tpu.tasks.transcribe import split_windows, stitch_rolls  # noqa: E402
from diffroll_tpu.train import (TrainState, make_optimizer,  # noqa: E402
                                make_train_step)


def make_notes(seed, n_frames):
    """Note events across a long recording — deliberately NOT aligned to
    window boundaries, so some notes straddle every seam."""
    rng = np.random.RandomState(seed)
    dur_s = n_frames * HOP / SR
    notes, tpos = [], 0.1
    while tpos < dur_s - 0.5:
        dur = rng.uniform(0.15, 0.9)
        for p in rng.choice(np.arange(30, 86), size=rng.randint(1, 5),
                            replace=False):
            notes.append(MidiNote(tpos, tpos + dur, int(p),
                                  int(rng.randint(40, 127))))
        tpos += rng.uniform(0.15, 0.6)
    return notes


def main():
    steps = int(ARGS.get("steps", 4000))
    n_train = int(ARGS.get("n_train", 128))
    n_long = int(ARGS.get("n_long", 8))
    long_windows = int(ARGS.get("long_windows", 4))
    overlap = int(ARGS.get("overlap", 32))
    bsz = 8

    print("building corpora...", file=sys.stderr)
    train = []
    for i in range(n_train):
        notes = make_notes(i, FRAMES)
        rng = np.random.RandomState(10_000 + i)
        train.append((render_notes_v2(notes, SEQ, rng),
                      rasterize_notes(notes, FRAMES, HOP, SR)[0]))
    train_audio = jnp.asarray(np.stack([a for a, _ in train]))
    train_frame = jnp.asarray(np.stack([f for _, f in train]))

    long_frames = FRAMES * long_windows
    longs = []
    for i in range(n_long):
        notes = make_notes(5_000 + i, long_frames)
        rng = np.random.RandomState(20_000 + i)
        longs.append((render_notes_v2(notes, long_frames * HOP, rng),
                      rasterize_notes(notes, long_frames, HOP, SR)[0]))

    model = models.build(
        "ClassifierFreeDiffRoll", residual_channels=128, residual_layers=8,
        frames=FRAMES, timesteps=TIMESTEPS, spec_dropout=0.1,
        dtype=ARGS.get("dtype", "bfloat16"))
    task = DiffusionTask(model, TaskConfig(
        timesteps=TIMESTEPS, training_mode="x_0", loss_type="l2",
        sampling_type="cfdg_ddpm_x0", w=0.5))
    params = model.init(jax.random.key(0))
    tx = make_optimizer(4e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(task.loss_fn, tx, donate_state=False)

    key = jax.random.key(1)
    for i in range(steps):
        key, bk, sk = jax.random.split(key, 3)
        idx = jax.random.choice(bk, n_train, (bsz,), replace=False)
        state, losses = step(state, {"frame": train_frame[idx],
                                     "audio": train_audio[idx]}, sk)
        if i % 500 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(losses['diffusion_loss']):.4f}",
                  file=sys.stderr)

    run = jax.jit(lambda p, x, k, wav: task.sample(p, x, k, waveform=wav)[0])

    def transcribe(audio, ov):
        wins = split_windows(audio.astype(np.float32), SEQ, HOP, ov)
        n = len(wins)
        pad = (-n) % bsz
        if pad:
            wins = np.concatenate([wins, np.zeros((pad, SEQ), np.float32)])
        rolls = []
        for s in range(0, len(wins), bsz):
            k1, k2 = jax.random.split(jax.random.key(97 + s), 2)
            x_T = jax.random.normal(k1, (bsz, FRAMES, 88))
            rolls.append(np.asarray(run(state.params,
                                        x_T, k2, jnp.asarray(wins[s:s+bsz]))))
        rolls = np.concatenate(rolls)[:n]
        if ov > 0:
            return stitch_rolls(rolls, ov, long_frames)
        return np.concatenate(list(rolls))[:long_frames]

    out = {"train_steps": steps, "overlap_frames": overlap,
           "long_windows": long_windows, "n_long": n_long}
    for tag, ov in (("tiled", 0), ("stitched", overlap)):
        preds, labels = [], []
        for audio, label in longs:
            preds.append(transcribe(audio, ov))
            labels.append(label)
        m = evaluate_rolls(np.stack(preds), np.stack(labels),
                           frame_threshold=0.5, hop_length=HOP,
                           sample_rate=SR)
        out[f"{tag}_note_f1"] = round(m["note_f1"], 4)
        out[f"{tag}_frame_f1"] = round(m["frame_f1"], 4)
        print(f"{tag}: note {m['note_f1']:.4f} frame {m['frame_f1']:.4f}",
              file=sys.stderr)
    out["note_f1_delta"] = round(out["stitched_note_f1"]
                                 - out["tiled_note_f1"], 4)
    out["frame_f1_delta"] = round(out["stitched_frame_f1"]
                                  - out["tiled_frame_f1"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
