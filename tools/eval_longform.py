"""Long-audio transcription QUALITY evaluation (VERDICT r4 item 6).

`tasks/transcribe.transcribe_long` (window sharding + crossfade stitching)
beats the reference's hard 20.48 s limit (reference README.md:126 "TODO:
add support for transcribing any music") and is unit-tested, but had never
been *scored* beyond one window. This tool synthesizes one multi-minute v2
piece with a known note list, transcribes it through the product CLI
(`cli/transcribe`) at both the stitched (overlap_frames=32) and butted
(overlap_frames=0) protocols, and scores note/frame F1 of the full-length
roll against the rasterized ground truth.

    python tools/eval_longform.py ckpt=<checkpoints dir> seconds=180 \
        w=0.5 out=/tmp/longform.json [platform=cpu] [seed=3000000]
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def main():
    import jax

    if ARGS.get("platform", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from synthetic_end_to_end import SR, render_notes_v2

    from diffroll_tpu.cli import transcribe as transcribe_cli
    from diffroll_tpu.data.rasterize import rasterize_arrays
    from diffroll_tpu.eval.evaluate import evaluate_rolls
    from diffroll_tpu.io import write_midi, write_wav
    from make_synthetic_tree import make_notes

    ckpt = ARGS["ckpt"]
    seconds = float(ARGS.get("seconds", "180"))
    seed = int(ARGS.get("seed", "3000000"))  # disjoint from corpus seeds
    w = float(ARGS.get("w", "0.5"))
    hop = 512

    notes = make_notes(seed, seconds)
    rng = np.random.RandomState(1_000_000 + seed)
    audio = render_notes_v2(notes, int(seconds * SR), rng)
    n_frames = len(audio) // hop
    label, _ = rasterize_arrays(
        np.array([n.onset for n in notes]),
        np.array([n.offset for n in notes]),
        np.array([n.pitch for n in notes]),
        n_frames, hop, SR, 21, 108,
    )

    td = tempfile.mkdtemp(prefix="longform_")
    folder = pathlib.Path(td) / "audio"
    folder.mkdir()
    write_wav(folder / "piece.wav", audio, SR)
    write_midi(str(folder / "piece_label.mid"),
               [n.pitch for n in notes],
               [(n.onset, n.offset) for n in notes])

    results = {}
    for overlap in (int(x) for x in ARGS.get("overlaps", "32,0").split(",")):
        t0 = time.perf_counter()
        run_dir = transcribe_cli.main([
            f"pretrained_path={ckpt}",
            f"dataset.audio_path={folder}", "dataset.audio_ext=wav",
            f"task.w={w}", f"overlap_frames={overlap}",
            "dataloader.num_workers=1",
            f"trainer.output_dir={td}/out_ov{overlap}",
        ])
        wall = time.perf_counter() - t0
        pred = np.load(sorted(run_dir.glob("*piece.npz"))[0])["roll"]
        assert pred.shape[0] >= n_frames, (pred.shape, n_frames)
        metrics = evaluate_rolls(
            pred[None, :n_frames], label[None],
            frame_threshold=0.5, hop_length=hop, sample_rate=SR)
        results[f"overlap_{overlap}"] = {**metrics, "wall_s": round(wall, 1)}
        print(f"[overlap={overlap}] note_f1={metrics['note_f1']:.4f} "
              f"frame_f1={metrics['frame_f1']:.4f} ({wall:.0f}s)",
              file=sys.stderr, flush=True)

    payload = {
        "ckpt": ckpt, "seconds": seconds, "seed": seed, "w": w,
        "n_notes": len(notes), "n_frames": int(n_frames),
        "results": results,
    }
    out = ARGS.get("out")
    if out:
        pathlib.Path(out).write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
