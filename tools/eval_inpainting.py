"""Inpainting quality evaluation: masked-region F1 vs transcription / floor.

The reference's second capability (reference sampling.py:29-43;
task/diffusion.py:999-1025) is inpainting: the spectrogram conditioner is
forced to -1 inside a time band, and the model must reconstruct the roll
there from musical context + the learned roll prior, while transcribing
normally outside. This tool measures that, which the reference never did
quantitatively:

  * three conditions over the same held-out windows and noise draws —
      transcription  cfdg_ddpm_x0        (no mask; ceiling inside the band)
      inpainting     inpainting_ddpm_x0  (spec[:, t0:t1, :] = -1)
      generation     generation_ddpm_x0  (whole spec = -1; floor — what the
                                          roll prior alone achieves)
  * frame/note F1 scored separately INSIDE [t0, t1) and OUTSIDE it
    (rolls sliced to the region; boundary-crossing notes are cut the same
    way for prediction and label).

Expected shape: inpainting == transcription outside the band (the mask
must not disturb normal transcription), and inside the band
floor < inpainting < transcription (context helps, audio is still absent).

    python tools/eval_inpainting.py ckpt=<checkpoints dir> \
        root=/tmp/psweep_tree mask=48,80 w=0.5 out=/tmp/inpainting.json

Windows are butted (eval_overlap_frames=0) so the mask band sits at the
same frames of every 128-frame window.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def main():
    import jax

    if ARGS.get("platform", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffroll_tpu.cli import _common
    from diffroll_tpu.config import compose
    from diffroll_tpu.eval.evaluate import evaluate_rolls

    ckpt = ARGS["ckpt"]
    root = ARGS.get("root", "/tmp/psweep_tree")
    t0, t1 = (int(x) for x in ARGS.get("mask", "48,80").split(","))
    w = float(ARGS.get("w", "0.5"))
    seq = int(ARGS.get("seq", "65536"))

    cfg = compose("test", {
        "pretrained_path": ckpt,
        "dataset.root": root,
        "dataset.sequence_length": seq,
        "dataset.eval_overlap_frames": 0,
        "dataloader.test_batch_size": int(ARGS.get("batch", "8")),
        "dataloader.num_workers": 2,
        "trainer.output_dir": ARGS.get("tmpdir", "/tmp/eval_inpainting_out"),
    })
    cfg, model, task, state = _common.load_pretrained(cfg)
    win = seq // cfg.dataset.hop_length
    assert 0 <= t0 < t1 <= win, (t0, t1, win)

    conditions = {
        "transcription": cfg.task.replace(
            sampling_type="cfdg_ddpm_x0", w=w,
            inpainting_t=None, inpainting_f=None),
        "inpainting": cfg.task.replace(
            sampling_type="inpainting_ddpm_x0", w=w,
            inpainting_t=(t0, t1), inpainting_f=None),
        "generation": cfg.task.replace(
            sampling_type="generation_ddpm_x0", w=w,
            inpainting_t=None, inpainting_f=None),
    }

    ds = _common.build_dataset(cfg.dataset, "test")
    results = {}
    for name, task_cfg in conditions.items():
        t = task.__class__(model, task_cfg)
        sample = jax.jit(lambda p, x, k, wav, _t=t: _t.sample(
            p, x, k, waveform=wav)[0])
        loader = _common.build_loader(cfg, ds, "test")
        preds, labels = [], []
        key = jax.random.key(0)
        for batch in loader:
            frame = np.asarray(batch["frame"])
            audio = jnp.asarray(batch["audio"])
            key, nk, sk = jax.random.split(key, 3)
            # same noise draws across conditions: fold the batch index
            x_T = jax.random.normal(
                jax.random.fold_in(jax.random.key(7), len(preds)),
                frame.shape)
            preds.append(np.asarray(sample(state.params, x_T, sk, audio)))
            labels.append(frame)
        pred = np.concatenate(preds)
        label = np.concatenate(labels)

        def region(a, b):
            return evaluate_rolls(
                pred[:, a:b], label[:, a:b],
                frame_threshold=cfg.task.frame_threshold,
                hop_length=cfg.dataset.hop_length,
                sample_rate=cfg.dataset.sampling_rate)

        outside = evaluate_rolls(
            np.concatenate([pred[:, :t0], pred[:, t1:]], axis=1),
            np.concatenate([label[:, :t0], label[:, t1:]], axis=1),
            frame_threshold=cfg.task.frame_threshold,
            hop_length=cfg.dataset.hop_length,
            sample_rate=cfg.dataset.sampling_rate)
        results[name] = {
            "inside_mask": region(t0, t1),
            "outside_mask": outside,
            "n_windows": int(pred.shape[0]),
        }
        print(f"[{name}] inside note_f1={results[name]['inside_mask']['note_f1']:.3f} "
              f"frame_f1={results[name]['inside_mask']['frame_f1']:.3f} | "
              f"outside note_f1={results[name]['outside_mask']['note_f1']:.3f} "
              f"frame_f1={results[name]['outside_mask']['frame_f1']:.3f}",
              file=sys.stderr, flush=True)

    payload = {
        "ckpt": ckpt, "mask_frames": [t0, t1], "w": w,
        "window_frames": win, "eval_overlap_frames": 0,
        "results": results,
    }
    out = ARGS.get("out")
    if out:
        pathlib.Path(out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
