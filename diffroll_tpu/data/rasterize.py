"""MIDI note events -> piano-roll labels.

Re-implements the rasterization contract of the external
`AudioLoader.music.amt` datasets the reference trains on (reference
requirements.txt:9; consumed via batch["frame"] (B, 640, 88) at
task/diffusion.py:652-653, config/dataset/MAPS.yaml): frame rolls at
`hop_length` samples per frame, MIDI pitches `min_midi..max_midi` mapped to
roll columns 0..87, following the standard Onsets-and-Frames convention:

  frame_roll[t, p] = 1  iff  note p sounds within frame t, where a note
  with onset/offset in seconds occupies frames
  [round(onset*sr/hop), round(offset*sr/hop)).

An onset roll (first frame of each note) is produced alongside for
decoders/datasets that want it.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

from ..io.midi import MidiNote


def rasterize_notes(
    notes: Iterable[MidiNote],
    n_frames: int,
    hop_length: int = 512,
    sample_rate: int = 16000,
    min_midi: int = 21,
    max_midi: int = 108,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (frame_roll, onset_roll), both (n_frames, max-min+1) float32."""
    notes = list(notes)
    from .. import native

    if notes and native.available():
        out = native.rasterize(
            np.array([n.onset for n in notes]),
            np.array([n.offset for n in notes]),
            np.array([n.pitch for n in notes]),
            n_frames, hop_length, sample_rate, min_midi, max_midi,
        )
        if out is not None:
            return out

    n_pitches = max_midi - min_midi + 1
    frame = np.zeros((n_frames, n_pitches), np.float32)
    onset = np.zeros((n_frames, n_pitches), np.float32)
    fps = sample_rate / hop_length
    for n in notes:
        if not (min_midi <= n.pitch <= max_midi):
            continue
        # half-UP rounding: Python's round() is half-to-even, which makes
        # rasterization inconsistent under integer frame shifts (a window's
        # roll would disagree with the matching slice of the full roll)
        f0 = int(np.floor(n.onset * fps + 0.5))
        f1 = int(np.floor(n.offset * fps + 0.5))
        f1 = max(f1, f0 + 1)  # a note always occupies >= 1 frame
        if f0 >= n_frames or f1 <= 0:
            continue
        p = n.pitch - min_midi
        frame[max(f0, 0) : min(f1, n_frames), p] = 1.0
        if 0 <= f0 < n_frames:
            onset[f0, p] = 1.0
    return frame, onset


def roll_to_notes(
    frame_roll: np.ndarray,
    hop_length: int = 512,
    sample_rate: int = 16000,
    min_midi: int = 21,
    threshold: float = 0.5,
):
    """Inverse for tests/tools: binarized roll -> MidiNote list."""
    from ..eval.notes import extract_notes

    pitches, intervals = extract_notes(frame_roll, frame_roll, threshold, threshold)
    scale = hop_length / sample_rate
    return [
        MidiNote(onset=i0 * scale, offset=i1 * scale, pitch=int(p) + min_midi,
                 velocity=100)
        for p, (i0, i1) in zip(pitches, intervals)
    ]
