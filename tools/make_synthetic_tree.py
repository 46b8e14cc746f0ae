"""Render an on-disk MAPS-layout synthetic corpus (v2 audio).

Writes wav + midi pairs under <out>/MAPS/<subset>/MUS so the real CLI
pipeline (train / test / sweep, data/amt.MAPS) runs end-to-end without any
dataset download — the audio is the examples corpus v2 renderer (velocity,
onset jitter, inharmonic partials, hammer noise, reverb, pink floor).

    python tools/make_synthetic_tree.py out=/tmp/synth_tree n_train=96 \
        n_test=8 seconds=20.48 [seed=0]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)

from synthetic_end_to_end import SR, render_notes_v2  # noqa: E402
from diffroll_tpu.io import write_midi, write_wav  # noqa: E402
from diffroll_tpu.io.midi import MidiNote  # noqa: E402


def make_notes(seed, seconds):
    rng = np.random.RandomState(seed)
    notes, tpos = [], 0.1
    while tpos < seconds - 0.5:
        dur = rng.uniform(0.15, 0.9)
        for p in rng.choice(np.arange(30, 86), size=rng.randint(1, 5),
                            replace=False):
            notes.append(MidiNote(tpos, tpos + dur, int(p),
                                  int(rng.randint(40, 127))))
        tpos += rng.uniform(0.15, 0.6)
    return notes


def main():
    out = pathlib.Path(ARGS.get("out", "/tmp/synth_tree"))
    n_train = int(ARGS.get("n_train", 96))
    n_test = int(ARGS.get("n_test", 8))
    seconds = float(ARGS.get("seconds", 20.48))
    seed = int(ARGS.get("seed", 0))

    specs = [("AkPnBcht", n_train, 0), ("ENSTDkAm", n_test, 100_000)]
    for subset, n, base in specs:
        d = out / "MAPS" / subset / "MUS"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            s = seed + base + i
            notes = make_notes(s, seconds)
            rng = np.random.RandomState(1_000_000 + s)
            audio = render_notes_v2(notes, int(seconds * SR), rng)
            write_wav(d / f"clip{i}.wav", audio, SR)
            write_midi(str(d / f"clip{i}.mid"),
                       [n_.pitch for n_ in notes],
                       [(n_.onset, n_.offset) for n_ in notes],
                       velocities=[n_.velocity for n_ in notes])
        print(f"{subset}: {n} clips x {seconds:.2f}s -> {d}")


if __name__ == "__main__":
    main()
