"""Tests: note decoder vs the reference-loop oracle, note matching vs a
brute-force oracle, frame metrics vs sklearn, MIDI and WAV round-trips."""

import itertools

import numpy as np
import pytest

from diffroll_tpu.eval import (
    evaluate_rolls,
    extract_notes,
    frame_metrics,
    match_notes,
    note_metrics,
    notes_to_hz_seconds,
)
from diffroll_tpu.eval.notes import extract_notes_reference_loop, midi_to_hz
from diffroll_tpu.io import read_midi, read_wav, resample, write_midi, write_wav


# ----------------------------------------------------------------- decoder

@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("rule", ["rule1", "rule2"])
def test_extract_notes_matches_reference_loop(seed, rule):
    rng = np.random.RandomState(seed)
    roll = (rng.rand(120, 30) > 0.8).astype(np.float32)
    onset = (rng.rand(120, 30) > 0.85).astype(np.float32)
    p1, i1 = extract_notes(onset, roll, 0.5, 0.5, rule)
    p2, i2 = extract_notes_reference_loop(onset, roll, 0.5, 0.5, rule)
    # order may differ within (onset, pitch) ties only; sort both fully
    def norm(p, i):
        if len(p) == 0:
            return np.empty((0, 3), np.int64)
        a = np.column_stack([i[:, 0], p, i[:, 1]])
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
    np.testing.assert_array_equal(norm(p1, i1), norm(p2, i2))


def test_extract_notes_simple_case():
    roll = np.zeros((20, 5))
    roll[3:7, 2] = 1.0   # note: pitch 2, frames [3, 7)
    roll[10:11, 4] = 1.0  # 1-frame note
    p, i = extract_notes(roll, roll)
    assert list(p) == [2, 4]
    assert i.tolist() == [[3, 7], [10, 11]]


def test_extract_notes_empty():
    p, i = extract_notes(np.zeros((10, 5)), np.zeros((10, 5)))
    assert len(p) == 0 and i.shape == (0, 2)


def test_note_runs_to_clip_end():
    roll = np.zeros((10, 3))
    roll[6:, 1] = 1.0
    p, i = extract_notes(roll, roll)
    assert i.tolist() == [[6, 10]]


# ----------------------------------------------------------------- matching

def brute_force_max_matching(ok: np.ndarray) -> int:
    """Oracle: maximum bipartite matching size by exhaustive search."""
    n_ref, n_est = ok.shape
    best = 0
    ests = list(range(n_est))
    for k in range(min(n_ref, n_est), 0, -1):
        for refs in itertools.combinations(range(n_ref), k):
            for perm in itertools.permutations(ests, k):
                if all(ok[r, e] for r, e in zip(refs, perm)):
                    return k
    return best


@pytest.mark.parametrize("seed", range(10))
def test_match_notes_is_maximum(seed):
    rng = np.random.RandomState(seed)
    n_ref, n_est = rng.randint(1, 6), rng.randint(1, 6)
    ref_on = rng.rand(n_ref) * 0.5
    est_on = rng.rand(n_est) * 0.5
    ref_i = np.column_stack([ref_on, ref_on + 0.2])
    est_i = np.column_stack([est_on, est_on + 0.2])
    ref_p = midi_to_hz(rng.randint(60, 64, n_ref))
    est_p = midi_to_hz(rng.randint(60, 64, n_est))

    matches = match_notes(ref_i, ref_p, est_i, est_p, onset_tolerance=0.05)
    onset_ok = np.abs(ref_i[:, 0][:, None] - est_i[:, 0][None, :]) <= 0.05
    cents_ok = 1200 * np.abs(np.log2(est_p[None, :] / ref_p[:, None])) < 50
    ok = onset_ok & cents_ok
    assert len(matches) == brute_force_max_matching(ok)
    # validity + one-to-one
    rs = [r for r, _ in matches]
    es = [e for _, e in matches]
    assert len(set(rs)) == len(rs) and len(set(es)) == len(es)
    assert all(ok[r, e] for r, e in matches)


def test_note_metrics_perfect_and_miss():
    i = np.array([[0.0, 1.0], [2.0, 3.0]])
    p = midi_to_hz(np.array([60, 72]))
    m = note_metrics(i, p, i, p)
    assert m["f1"] == 1.0 and m["avg_overlap_ratio"] == 1.0
    m2 = note_metrics(i, p, i + 0.2, p)  # onsets 200ms off
    assert m2["f1"] == 0.0
    # offset_ratio mode: matched onsets but bad offsets fail
    i_bad_off = i.copy()
    i_bad_off[:, 1] += 5.0
    m3 = note_metrics(i, p, i_bad_off, p, offset_ratio=0.2)
    assert m3["f1"] == 0.0


def test_frame_metrics_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    pred = rng.rand(4, 50, 10)
    label = (rng.rand(4, 50, 10) > 0.7).astype(float)
    ours = frame_metrics(pred, label, 0.5)
    p, r, f, _ = sklearn.precision_recall_fscore_support(
        label.flatten() > 0.5, pred.flatten() > 0.5, average="binary"
    )
    assert ours["precision"] == pytest.approx(p)
    assert ours["recall"] == pytest.approx(r)
    assert ours["f1"] == pytest.approx(f)


def test_evaluate_rolls_self_is_perfect():
    rng = np.random.RandomState(1)
    label = (rng.rand(2, 100, 88) > 0.95).astype(np.float32)
    res = evaluate_rolls(label, label)
    assert res["frame_f1"] == 1.0 and res["note_f1"] == 1.0


# ----------------------------------------------------------------- MIDI I/O

def test_midi_roundtrip(tmp_path):
    path = str(tmp_path / "t.mid")
    pitches = [60, 64, 67, 60]
    intervals = [(0.0, 0.5), (0.25, 1.0), (1.0, 2.0), (1.5, 1.75)]
    vels = [100, 90, 80, 70]
    write_midi(path, pitches, intervals, vels)
    notes = read_midi(path)
    assert len(notes) == 4
    got = sorted((n.pitch, round(n.onset, 3), round(n.offset, 3)) for n in notes)
    want = sorted((p, round(a, 3), round(b, 3)) for p, (a, b) in zip(pitches, intervals))
    for (gp, ga, gb), (wp, wa, wb) in zip(got, want):
        assert gp == wp
        assert abs(ga - wa) < 2e-3 and abs(gb - wb) < 2e-3  # tick quantization
    assert sorted(n.velocity for n in notes) == sorted(vels)


def test_midi_sustain_pedal_extension(tmp_path):
    # hand-build a file with CC64: note off at 0.5s while pedal held to 1.0s
    import struct
    from diffroll_tpu.io.midi import _varlen

    tpb = 480
    tps = tpb * 2
    track = bytearray()
    track += _varlen(0) + bytes([0xB0, 64, 127])              # pedal down @0
    track += _varlen(0) + bytes([0x90, 60, 100])              # on @0
    track += _varlen(int(0.5 * tps)) + bytes([0x80, 60, 0])   # off @0.5
    track += _varlen(int(0.5 * tps)) + bytes([0xB0, 64, 0])   # pedal up @1.0
    track += b"\x00\xff\x2f\x00"
    path = tmp_path / "sus.mid"
    with open(path, "wb") as f:
        f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpb))
        f.write(b"MTrk" + struct.pack(">I", len(track)) + bytes(track))

    notes = read_midi(str(path), extend_sustain=True)
    assert len(notes) == 1 and notes[0].offset == pytest.approx(1.0, abs=2e-3)
    notes2 = read_midi(str(path), extend_sustain=False)
    assert notes2[0].offset == pytest.approx(0.5, abs=2e-3)


def test_midi_tempo_map(tmp_path):
    import struct
    from diffroll_tpu.io.midi import _varlen

    tpb = 480
    track = bytearray()
    # tempo 60 bpm (1e6 us/beat): 480 ticks == 1 s
    track += _varlen(0) + bytes([0xFF, 0x51, 0x03]) + (1000000).to_bytes(3, "big")
    track += _varlen(0) + bytes([0x90, 60, 100])
    track += _varlen(480) + bytes([0x80, 60, 0])  # 1 beat -> 1 s
    track += b"\x00\xff\x2f\x00"
    path = tmp_path / "tempo.mid"
    with open(path, "wb") as f:
        f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpb))
        f.write(b"MTrk" + struct.pack(">I", len(track)) + bytes(track))
    notes = read_midi(str(path))
    assert notes[0].offset == pytest.approx(1.0, abs=1e-6)


# ----------------------------------------------------------------- WAV I/O

def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "a.wav"
    write_wav(path, x, sr)
    y, sr2 = read_wav(path)
    assert sr2 == sr and y.shape == x.shape
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization


def test_wav_stereo_mono_mix(tmp_path):
    sr = 8000
    x = np.stack([np.ones(100, np.float32) * 0.5, np.zeros(100, np.float32)])
    path = tmp_path / "st.wav"
    write_wav(path, x, sr)
    y, _ = read_wav(path, mono=True)
    assert y.shape == (100,)
    assert np.abs(y - 0.25).max() < 1e-3


def test_resample_halves_length():
    x = np.sin(2 * np.pi * 5 * np.arange(32000) / 32000).astype(np.float32)
    y = resample(x, 32000, 16000)
    assert y.shape == (16000,)


# --------------------------------------------------------------- mp3 export

def test_write_audio_mp3_fallback_without_encoder(tmp_path, monkeypatch):
    """No ffmpeg/lame on PATH -> mp3 request degrades to wav, path returned."""
    from diffroll_tpu.io.wav import write_audio

    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    x = np.zeros(1000, np.float32)
    out = write_audio(tmp_path / "clip", x, 16000, fmt="mp3")
    assert out.suffix == ".wav" and out.exists()
    y, sr = read_wav(out)
    assert sr == 16000 and y.shape == (1000,)


def test_write_audio_mp3_uses_encoder_binary(tmp_path, monkeypatch):
    """With an `ffmpeg` binary present the mp3 path is produced through it
    (shim copies its input wav to the output arg — exercises the exact
    argv plumbing without a real codec)."""
    import os
    import stat
    import sys

    from diffroll_tpu.io.wav import write_audio

    bindir = tmp_path / "bin"
    bindir.mkdir()
    shim = bindir / "ffmpeg"
    shim.write_text(
        "#!%s\nimport shutil, sys\n"
        "args = sys.argv[1:]\n"
        "src = args[args.index('-i') + 1]\n"
        "shutil.copy(src, args[-1])\n" % sys.executable
    )
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", str(bindir) + os.pathsep + os.environ["PATH"])

    x = (0.1 * np.ones(500)).astype(np.float32)
    out = write_audio(tmp_path / "clip", x, 16000, fmt="mp3")
    assert out.suffix == ".mp3" and out.exists()
    # shim copied the intermediate wav verbatim
    y, sr = read_wav(out)
    assert sr == 16000 and np.abs(y - 0.1).max() < 1e-3


def test_write_audio_rejects_unknown_format(tmp_path):
    from diffroll_tpu.io.wav import write_audio

    with pytest.raises(ValueError):
        write_audio(tmp_path / "clip", np.zeros(10, np.float32), 16000,
                    fmt="ogg")


def _float32_wav_bytes(x, sr):
    """Minimal IEEE-float (format tag 3) WAV container."""
    import struct

    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_read_wav_bytes_matches_file(tmp_path):
    """In-memory decode (the serving hot path) matches the file parser for
    16-bit PCM, and the float32-WAV (format 3) payload takes the temp-file
    fallback and still decodes."""
    import numpy as np

    from diffroll_tpu.io.wav import read_wav, read_wav_bytes, write_wav

    rng = np.random.RandomState(0)
    x = (rng.randn(16000) * 0.1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000)
    a, sr_a = read_wav(p, mono=True)
    b, sr_b = read_wav_bytes(p.read_bytes(), mono=True)
    assert sr_a == sr_b == 16000
    np.testing.assert_array_equal(a, b)

    f, sr_f = read_wav_bytes(_float32_wav_bytes(x, 16000), mono=True)
    assert sr_f == 16000
    np.testing.assert_allclose(f, x, atol=1e-7)


def test_audio_format_defaults_to_mp3():
    """Reference parity: eval audio artifacts are mp3 by default (reference
    task/diffusion.py:413-415); write_audio degrades to wav encoder-less."""
    from diffroll_tpu.config import compose

    assert compose("test", {}).audio_format == "mp3"
