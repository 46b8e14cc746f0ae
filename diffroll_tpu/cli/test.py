"""Evaluation entry: full reverse diffusion over the test split + F1.

Mirrors `test.py` (reference :18-50) / `SpecRollDiffusion.test_step`
(reference task/diffusion.py:312-428): for each test batch, run the
complete T-step sampler (CFG by default, w=0.5), threshold, score frame
P/R/F1 and mir_eval note P/R/F1. Unlike the reference (batch-0-only note
F1, :412-427 indentation bug) every clip is scored.

    python -m diffroll_tpu test pretrained_path=<ckpt dir> dataset.root=/data \
        task.w=0.5 task.frame_threshold=0.5
"""

from __future__ import annotations

import json
import pathlib
import sys
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import from_argv
from ..eval.evaluate import evaluate_rolls
from . import _common


def _export_batch_artifacts(run_dir, cfg, pred, batch):
    """First-batch eval artifacts — the reference saves audio/MIDI/rolls for
    batch 0 of every test run (reference task/diffusion.py:320-378,
    412-426): predicted + label rolls (npz), decoded MIDI, and the input
    audio as wav."""
    import numpy as np

    from ..io.wav import write_audio
    from .sample import export_clip

    run_dir.mkdir(parents=True, exist_ok=True)
    pred = np.asarray(pred)
    np.savez_compressed(run_dir / "batch0_rolls.npz",
                        pred=pred, label=np.asarray(batch["frame"]))
    for j in range(min(2, pred.shape[0])):
        export_clip(run_dir, f"batch0_clip{j}", pred[j], cfg)
        # mp3 for reference parity when cfg.audio_format="mp3" (reference
        # task/diffusion.py:413-415); falls back to wav without an encoder
        write_audio(run_dir / f"batch0_audio{j}",
                    np.asarray(batch["audio"][j]), cfg.dataset.sampling_rate,
                    fmt=cfg.audio_format)


def run_test(cfg, model, task, state, artifacts_dir=None,
             thresholds=None) -> Dict[str, float]:
    """Full-eval over the test split. With `thresholds` (a list), the same
    sampled rolls are scored once per threshold and a {thr: metrics} dict
    is returned — thresholding is eval-only, so sampling runs once."""
    test_ds = _common.build_dataset(cfg.dataset, "test")
    loader = _common.build_loader(cfg, test_ds, "test")
    single = thresholds is None
    if single:
        thresholds = [_common.task_threshold(cfg)]

    key = jax.random.key(cfg.trainer.seed)
    mesh = _common.setup_mesh(cfg)
    # mesh routes the Pallas megakernel through shard_map for sharded
    # eval batches (tasks/diffusion.sample)
    sample = jax.jit(
        lambda params, x_T, key, waveform: task.sample(
            params, x_T, key, waveform=waveform, mesh=mesh)[0]
    )

    def shard(x):
        # eval clips are independent: shard them over the mesh data axis
        if mesh is not None and x.shape[0] % mesh.shape["data"] == 0:
            from ..parallel.mesh import batch_sharding

            return jax.device_put(x, batch_sharding(mesh))
        return x

    per_thr: Dict[float, List[Dict[str, float]]] = {t: [] for t in thresholds}
    n_clips = 0
    exported = False
    # per-recording reassembly (the reference eval protocol: `overlap: True`
    # splits enumerate consecutive windows covering each recording,
    # reference config/dataset/MAPS.yaml:29-44) — windows accumulate per
    # clip_idx and score as ONE full-recording roll once complete
    pending: Dict[int, Dict] = {}

    def score(pred_roll, label_roll, weight):
        nonlocal n_clips
        for thr in thresholds:
            m = evaluate_rolls(
                pred_roll, label_roll,
                frame_threshold=thr,
                hop_length=cfg.dataset.hop_length,
                sample_rate=cfg.dataset.sampling_rate,
            )
            m["_n"] = weight
            per_thr[thr].append(m)
        n_clips += weight

    # clamp to the dataset's effective geometry: PairedAudioMidi clamps the
    # overlap to win_frames-1 when placing window starts (data/amt.py:151),
    # so the stitch stride must shrink identically or short-sequence
    # configs (win_frames <= overlap) silently misalign before scoring
    win_cfg = max(int(cfg.dataset.sequence_length)
                  // int(cfg.dataset.hop_length), 1)
    eval_ov = min(max(int(getattr(cfg.dataset, "eval_overlap_frames", 0)), 0),
                  win_cfg - 1)

    def finalize(ent):
        starts = sorted(ent["pred"])
        n = ent["n_frames"]
        if eval_ov > 0 and len(starts) > 1:
            # context-overlapped windows: crossfade-stitch predictions
            # (tasks/transcribe.stitch_rolls); labels agree bit-exactly in
            # the overlaps, so plain overwrite assembly is exact for them
            from ..tasks.transcribe import stitch_rolls

            pred_full = stitch_rolls(
                np.stack([ent["pred"][s] for s in starts]), eval_ov, n)
            win = next(iter(ent["label"].values())).shape[0]
            label_full = np.zeros((starts[-1] + win, 88),
                                  next(iter(ent["label"].values())).dtype)
            for s in starts:
                label_full[s: s + win] = ent["label"][s]
        else:
            pred_full = np.concatenate([ent["pred"][s] for s in starts])
            label_full = np.concatenate([ent["label"][s] for s in starts])
        score(pred_full[None, :n], label_full[None, :n], 1)

    for batch in loader:
        frame = jnp.asarray(batch["frame"])
        audio = shard(jnp.asarray(batch["audio"]))
        key, noise_key, samp_key = jax.random.split(key, 3)
        x_T = shard(jax.random.normal(noise_key, frame.shape))
        pred = np.asarray(sample(state.params, x_T, samp_key, audio))
        if artifacts_dir is not None and not exported:
            _export_batch_artifacts(artifacts_dir, cfg, pred, batch)
            exported = True
        if "clip_idx" in batch:
            win_frames = pred.shape[1]
            labels = np.asarray(batch["frame"])
            for j in range(pred.shape[0]):
                ci = int(batch["clip_idx"][j])
                ent = pending.setdefault(
                    ci, {"pred": {}, "label": {},
                         "n_frames": int(batch["n_clip_frames"][j])})
                sf = int(batch["start_frame"][j])
                ent["pred"][sf] = pred[j]
                ent["label"][sf] = labels[j]
            for ci in sorted(pending):
                ent = pending[ci]
                if hasattr(test_ds, "n_windows"):
                    expected = test_ds.n_windows(ent["n_frames"])
                else:
                    expected = max(1, -(-ent["n_frames"] // win_frames))
                if len(ent["pred"]) >= expected:
                    finalize(pending.pop(ci))
        else:
            score(pred, np.asarray(batch["frame"]), int(frame.shape[0]))

    for ci in sorted(pending):  # safety net — shouldn't trigger
        finalize(pending.pop(ci))

    if n_clips == 0:
        raise FileNotFoundError("test split resolved to zero batches")

    def reduce(all_metrics):
        weights = np.array([m.pop("_n") for m in all_metrics], np.float64)
        weights /= weights.sum()
        out = {k: float(np.sum([m[k] * w for m, w in zip(all_metrics, weights)]))
               for k in all_metrics[0]}
        out["n_clips"] = n_clips
        # self-describing eval protocol: published tables must say which
        # window-stitch geometry produced them (r3 changed the default to
        # 32-frame overlap, worth +1.35 note F1 vs butted tiles)
        out["eval_overlap_frames"] = eval_ov
        return out

    results = {t: reduce(ms) for t, ms in per_thr.items()}
    return results[thresholds[0]] if single else results


def main(argv: Optional[List[str]] = None):
    cfg, _, overrides = from_argv(sys.argv[1:] if argv is None else argv, "test")
    cfg, model, task, state = _common.load_pretrained(cfg, overrides=overrides)

    # this entry keeps the reference's preset-override semantics (its test
    # yaml always pins the sampler, reference test.py:29-36 +
    # config/test.yaml:17-21) — but surface a mismatch with the
    # checkpoint's RECORDED sampler (e.g. a distilled student evaluated on
    # the wrong grid) so silent quality loss is visible
    from ..train import Checkpointer

    if pathlib.Path(cfg.pretrained_path).suffix == ".ckpt":
        stored_task = None  # Lightning file: recorded sampler already
        # adopted by _load_lightning_pretrained (CLI keys win)
    else:
        stored_task = Checkpointer(cfg.pretrained_path).peek_config().get(
            "task")
    if stored_task is not None:
        # w routinely changes between train and eval (the reference's own
        # flow), so compare only the sampler identity/grid
        eff = (cfg.task.sampling_type, cfg.task.sampling_steps)
        rec = (stored_task.sampling_type, stored_task.sampling_steps)
        pinned = {"task.sampling_type", "task.sampling_steps"} & set(overrides)
        if eff != rec and not pinned:
            print(f"note: evaluating with sampler {eff}; the checkpoint "
                  f"recorded {rec} (a distilled student must run its own "
                  f"grid) — pass task.sampling_type= / task.sampling_steps= "
                  f"to change", file=sys.stderr)

    run_dir = _common.make_run_dir(cfg, "test")
    metrics = run_test(cfg, model, task, state, artifacts_dir=run_dir)
    (run_dir / "test_metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
