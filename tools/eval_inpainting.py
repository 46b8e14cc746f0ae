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

FREQUENCY-band masks (`fmask=m0,m1`, HTK mel bins — the reference's
`inpainting_f`, sampling.py:29-43, model/diffwave.py:649-654) are scored
the same way but the inside/outside split runs along the PITCH axis: a key
is "inside" iff its fundamental falls within the Hz span the masked mel
bins cover (filterbank edges, mel_to_hz(points[m0]) .. points[m1+1]).
Unlike a time mask, harmonics of inside-band notes remain visible in the
unmasked bins above the band, so inside-band recovery measures
fundamental-suppressed transcription, not pure generation.

    python tools/eval_inpainting.py ckpt=<dir> fmask=29,51 w=0.5 out=...
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
    fmask = ARGS.get("fmask")
    if fmask is not None:
        m0, m1 = (int(x) for x in fmask.split(","))
        t0 = t1 = None
    else:
        t0, t1 = (int(x) for x in ARGS.get("mask", "48,80").split(","))
        m0 = m1 = None
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
    if fmask is None:
        assert 0 <= t0 < t1 <= win, (t0, t1, win)
        inpaint_kw = dict(inpainting_t=(t0, t1), inpainting_f=None)
    else:
        n_mels = model.config.mel.n_mels
        assert 0 <= m0 < m1 <= n_mels, (m0, m1, n_mels)
        inpaint_kw = dict(inpainting_t=None, inpainting_f=(m0, m1))
        # pitch-axis inside/outside split: the masked mel bins cover a Hz
        # span (filterbank edges); a key is inside iff its fundamental
        # falls in that span
        from diffroll_tpu.dsp.mel import hz_to_mel_htk, mel_to_hz_htk
        pts = mel_to_hz_htk(np.linspace(
            hz_to_mel_htk(model.config.mel.f_min),
            hz_to_mel_htk(model.config.mel.f_max), n_mels + 2))
        hz_lo, hz_hi = float(pts[m0]), float(pts[m1 + 1])
        midi = 21 + np.arange(88)
        f0s = 440.0 * 2.0 ** ((midi - 69) / 12.0)
        inside = np.where((f0s >= hz_lo) & (f0s < hz_hi))[0]
        k0, k1 = int(inside[0]), int(inside[-1]) + 1
        print(f"[fmask] mel bins [{m0},{m1}) => {hz_lo:.0f}-{hz_hi:.0f} Hz "
              f"=> keys [{k0},{k1}) (midi {21+k0}-{21+k1-1})",
              file=sys.stderr, flush=True)

    conditions = {
        "transcription": cfg.task.replace(
            sampling_type="cfdg_ddpm_x0", w=w,
            inpainting_t=None, inpainting_f=None),
        "inpainting": cfg.task.replace(
            sampling_type="inpainting_ddpm_x0", w=w, **inpaint_kw),
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

        def score(p, lbl):
            return evaluate_rolls(
                p, lbl,
                frame_threshold=cfg.task.frame_threshold,
                hop_length=cfg.dataset.hop_length,
                sample_rate=cfg.dataset.sampling_rate)

        if fmask is None:
            inside_r = score(pred[:, t0:t1], label[:, t0:t1])
            outside_r = score(
                np.concatenate([pred[:, :t0], pred[:, t1:]], axis=1),
                np.concatenate([label[:, :t0], label[:, t1:]], axis=1))
        else:
            # pitch-axis split: note decoding is per-key-independent, so
            # slicing columns preserves note events; the key->Hz mapping
            # shifts identically for pred and label, leaving mir_eval's
            # pitch matching unaffected
            inside_r = score(pred[:, :, k0:k1], label[:, :, k0:k1])
            outside_r = score(
                np.concatenate([pred[:, :, :k0], pred[:, :, k1:]], axis=2),
                np.concatenate([label[:, :, :k0], label[:, :, k1:]], axis=2))
        results[name] = {
            "inside_mask": inside_r,
            "outside_mask": outside_r,
            "n_windows": int(pred.shape[0]),
        }
        print(f"[{name}] inside note_f1={results[name]['inside_mask']['note_f1']:.3f} "
              f"frame_f1={results[name]['inside_mask']['frame_f1']:.3f} | "
              f"outside note_f1={results[name]['outside_mask']['note_f1']:.3f} "
              f"frame_f1={results[name]['outside_mask']['frame_f1']:.3f}",
              file=sys.stderr, flush=True)

    payload = {
        "ckpt": ckpt, "w": w,
        "window_frames": win, "eval_overlap_frames": 0,
        "results": results,
    }
    if fmask is None:
        payload["mask_frames"] = [t0, t1]
    else:
        payload["mask_mel_bins"] = [m0, m1]
        payload["mask_hz"] = [round(hz_lo, 1), round(hz_hi, 1)]
        payload["mask_keys"] = [k0, k1]
    out = ARGS.get("out")
    if out:
        pathlib.Path(out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
