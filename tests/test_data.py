"""Data-layer tests on synthetic MAPS/MAESTRO trees."""

import json
import pathlib

import numpy as np
import pytest

from diffroll_tpu.data import (
    Custom,
    DataLoader,
    DoubleDataset,
    MAESTRO,
    MAPS,
    collate,
    rasterize_notes,
    roll_to_notes,
)
from diffroll_tpu.io import write_midi, write_wav
from diffroll_tpu.io.midi import MidiNote

SR, HOP = 16000, 512


def make_clip(path: pathlib.Path, seconds=4.0, notes=None):
    """Write a wav + midi pair; returns the notes."""
    n = int(seconds * SR)
    rng = np.random.RandomState(hash(str(path)) % (2**31))
    write_wav(path.with_suffix(".wav"), rng.randn(n).astype(np.float32) * 0.1, SR)
    if notes is None:
        notes = [
            (60, 0.5, 1.0), (64, 1.0, 2.0), (67, 2.5, 3.0),
        ]
    write_midi(str(path.with_suffix(".mid")),
               [p for p, _, _ in notes],
               [(a, b) for _, a, b in notes])
    return notes


@pytest.fixture()
def maps_tree(tmp_path):
    for subset in ("AkPnBcht", "ENSTDkAm"):
        d = tmp_path / "MAPS" / subset / "MUS"
        d.mkdir(parents=True)
        for i in range(2):
            make_clip(d / f"clip{i}")
    return tmp_path


@pytest.fixture()
def maestro_tree(tmp_path):
    d = tmp_path / "maestro-v3.0.0" / "2020"
    d.mkdir(parents=True)
    rows = {"split": {}, "audio_filename": {}, "midi_filename": {}}
    for i, split in enumerate(["train", "train", "validation", "test"]):
        make_clip(d / f"p{i}")
        rows["split"][str(i)] = split
        rows["audio_filename"][str(i)] = f"2020/p{i}.wav"
        rows["midi_filename"][str(i)] = f"2020/p{i}.mid"
    (tmp_path / "maestro-v3.0.0" / "maestro-v3.0.0.json").write_text(json.dumps(rows))
    return tmp_path


def test_rasterize_roundtrip():
    notes = [MidiNote(0.5, 1.0, 60, 100), MidiNote(1.0, 2.0, 72, 100)]
    frame, onset = rasterize_notes(notes, 100, HOP, SR)
    assert frame.shape == (100, 88)
    back = roll_to_notes(frame, HOP, SR)
    assert len(back) == 2
    assert back[0].pitch == 60 and back[1].pitch == 72
    assert abs(back[0].onset - 0.5) < HOP / SR + 1e-6
    # onset roll has exactly one frame per note
    assert onset.sum() == 2


def test_maps_split_and_item(maps_tree):
    train = MAPS(str(maps_tree), groups="train", sequence_length=SR * 2)
    test = MAPS(str(maps_tree), groups="test", sequence_length=SR * 2)
    # train samples one random window per clip; the eval split enumerates
    # consecutive windows covering each 4 s clip
    win_frames = SR * 2 // HOP
    per_clip = int(np.ceil(np.ceil(4.0 * SR / HOP) / win_frames))
    assert len(train) == 2 and len(test) == 2 * per_clip
    item = train[0]
    assert item["audio"].shape == (SR * 2,)
    assert item["frame"].shape == (SR * 2 // HOP, 88)
    assert item["frame"].max() <= 1.0
    # eval split is deterministic
    a, b = test[0], test[0]
    np.testing.assert_array_equal(a["audio"], b["audio"])


def test_eval_overlap_covers_full_recording(tmp_path):
    """The reference eval protocol (`overlap: True`, reference
    config/dataset/MAPS.yaml:29-44): eval windows must cover >95% of a
    long clip, reassembling to the original audio, with window metadata
    consistent."""
    d = tmp_path / "MAPS" / "ENSTDkAm" / "MUS"
    d.mkdir(parents=True)
    seconds = 13.3  # deliberately not a multiple of the window
    make_clip(d / "long", seconds=seconds)
    seq = 64 * HOP
    ds = MAPS(str(tmp_path), groups="test", sequence_length=seq)
    n_samples = int(seconds * SR)
    total_frames = int(np.ceil(n_samples / HOP))
    expected_windows = int(np.ceil(total_frames / (seq // HOP)))
    assert len(ds) == expected_windows

    items = [ds[i] for i in range(len(ds))]
    assert all(int(it["clip_idx"]) == 0 for it in items)
    starts = [int(it["start_frame"]) for it in items]
    assert starts == [i * seq // HOP for i in range(expected_windows)]
    covered = len(ds) * seq
    assert covered >= 0.95 * n_samples  # in fact >= 100%: full coverage
    # reassembled audio == the original clip (tail zero-padded)
    audio = np.concatenate([it["audio"] for it in items])
    from diffroll_tpu.io.wav import read_wav

    orig, _ = read_wav(d / "long.wav")
    np.testing.assert_allclose(audio[: len(orig)], orig, atol=1e-4)
    assert np.all(audio[len(orig):] == 0)
    assert int(items[0]["n_clip_frames"]) == int(np.ceil(n_samples / HOP))


def test_eval_overlap_window_rolls_match_full_rasterization(tmp_path):
    """Window labels concatenated == the full clip rasterized in one go."""
    from diffroll_tpu.io.midi import read_midi

    d = tmp_path / "MAPS" / "ENSTDkAm" / "MUS"
    d.mkdir(parents=True)
    notes = [(60, 0.5, 1.0), (64, 2.9, 4.2), (72, 5.5, 7.0), (50, 7.7, 7.9)]
    make_clip(d / "c", seconds=8.0, notes=notes)
    seq = SR * 2  # NOT a hop multiple: stride falls back to whole frames
    ds = MAPS(str(tmp_path), groups="test", sequence_length=seq)
    full_frames = int(np.ceil(8.0 * SR / HOP))
    got = np.concatenate([ds[i]["frame"] for i in range(len(ds))])[:full_frames]
    midi_notes = read_midi(str(d / "c.mid"))
    want, _ = rasterize_notes(midi_notes, full_frames, HOP, SR)
    np.testing.assert_array_equal(got, want)


def test_wav_info_header_matches_decode(tmp_path):
    from diffroll_tpu.io.wav import read_wav, resampled_length, wav_info

    p = tmp_path / "x.wav"
    x = np.random.RandomState(0).randn(44100 + 77).astype(np.float32) * 0.1
    write_wav(p, x, 44100)
    n, sr = wav_info(p)
    dec, dsr = read_wav(p)
    assert (n, sr) == (len(dec), dsr) == (44100 + 77, 44100)
    # resampled_length matches the actual resampler output
    from diffroll_tpu import native

    y = native.resample(dec, 44100, 16000)
    assert resampled_length(n, 44100, 16000) == len(y)


def test_maps_download_raises(maps_tree):
    with pytest.raises(RuntimeError):
        MAPS(str(maps_tree), download=True)


def test_segment_roll_alignment(tmp_path):
    """The roll of a random window must equal the matching slice of the
    full-clip roll (window starts are hop-aligned)."""
    d = tmp_path / "MAPS" / "AkPnBcht" / "MUS"
    d.mkdir(parents=True)
    notes = [(60, 0.1, 3.9), (72, 1.0, 1.5), (84, 2.0, 2.25)]
    make_clip(d / "clip0", seconds=4.0, notes=notes)
    ds = MAPS(str(tmp_path), groups="train", sequence_length=SR)  # 1 s windows

    full = MAPS(str(tmp_path), groups="train", sequence_length=None,
                deterministic=True)
    full_roll = full[0]["frame"]

    audio_full = full[0]["audio"]
    for _ in range(5):
        item = ds[0]
        # find window start by matching audio content
        w = item["audio"]
        # locate: windows are hop-aligned; search candidate starts
        found = None
        for start in range(0, len(audio_full) - len(w) + 1, HOP):
            if np.array_equal(audio_full[start : start + len(w)], w):
                found = start
                break
        assert found is not None
        f0 = found // HOP
        np.testing.assert_array_equal(
            item["frame"], full_roll[f0 : f0 + len(w) // HOP]
        )


def test_maestro_metadata_split(maestro_tree):
    train = MAESTRO(str(maestro_tree), groups="train", sequence_length=SR)
    val = MAESTRO(str(maestro_tree), groups="validation", sequence_length=SR)
    test = MAESTRO(str(maestro_tree), groups="test", sequence_length=SR)
    # eval splits enumerate full-coverage windows (1 clip each, 4 s at a
    # 31-frame window -> 5 windows)
    per_clip = int(np.ceil(np.ceil(4.0 * SR / HOP) / (SR // HOP)))
    assert (len(train), len(val), len(test)) == (2, per_clip, per_clip)
    item = val[0]
    assert item["frame"].shape == (SR // HOP, 88)


def test_custom_dataset(tmp_path):
    for i in range(3):
        write_wav(tmp_path / f"song{i}.wav",
                  np.random.RandomState(i).randn(SR).astype(np.float32) * 0.1, SR)
    ds = Custom(str(tmp_path), "wav", max_segment_samples=SR * 2, sample_rate=SR)
    assert len(ds) == 3
    item = ds[0]
    assert item["audio"].shape == (SR * 2,)  # padded
    assert item["file_name"] == "song0.wav"


def test_double_dataset(maps_tree):
    a = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    b = MAPS(str(maps_tree), groups="test", sequence_length=SR)
    dd = DoubleDataset(a, b)
    assert len(dd) == 2
    i1, i2 = dd[0]
    assert i1["audio"].shape == i2["audio"].shape


def test_dataloader_batching(maps_tree):
    ds = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["frame"].shape == (2, SR // HOP, 88)
    assert batches[0]["audio"].shape == (2, SR)


def test_dataloader_multihost_stripe(maps_tree):
    ds = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    d0 = DataLoader(ds, batch_size=1, process_index=0, process_count=2)
    d1 = DataLoader(ds, batch_size=1, process_index=1, process_count=2)
    assert len(list(d0)) == 1 and len(list(d1)) == 1


def test_collate_tuples():
    items = [({"x": np.ones(3)}, {"y": np.zeros(2)}) for _ in range(4)]
    out = collate(items)
    assert out[0]["x"].shape == (4, 3) and out[1]["y"].shape == (4, 2)


def test_device_prefetch_preserves_batches(maps_tree):
    import jax

    from diffroll_tpu.data.pipeline import device_prefetch

    # deterministic split: window sampling would advance the shared RNG
    ds = MAPS(str(maps_tree), groups="test", sequence_length=4096)
    loader = DataLoader(ds, 2, num_workers=1)
    host = [b["frame"].copy() for b in loader]
    loader2 = DataLoader(ds, 2, num_workers=1)
    dev = list(device_prefetch(iter(loader2)))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, np.asarray(d["frame"]))


def test_rasterize_arrays_matches_bruteforce_and_native():
    """The vectorized numpy fallback, the native C++ scan, and a direct
    per-note loop must agree — including negative-offset (shifted-window)
    notes, clipped ranges, and overlapping same-pitch notes."""
    from diffroll_tpu import native
    from diffroll_tpu.data.rasterize import rasterize_arrays

    rng = np.random.RandomState(3)
    n_frames, hop, sr = 50, 512, 16000
    onsets = rng.uniform(-1.0, 2.0, 200)
    offsets = onsets + rng.uniform(0.01, 1.5, 200)
    pitches = rng.randint(15, 115, 200)  # some out of the 21..108 range

    def brute():
        fps = sr / hop
        frame = np.zeros((n_frames, 88), np.float32)
        onset = np.zeros((n_frames, 88), np.float32)
        for o, f, p in zip(onsets, offsets, pitches):
            if not (21 <= p <= 108):
                continue
            f0 = int(np.floor(o * fps + 0.5))
            f1 = max(int(np.floor(f * fps + 0.5)), f0 + 1)
            if f0 >= n_frames or f1 <= 0:
                continue
            frame[max(f0, 0): min(f1, n_frames), p - 21] = 1.0
            if 0 <= f0 < n_frames:
                onset[f0, p - 21] = 1.0
        return frame, onset

    want_f, want_o = brute()
    for use_native in ([True, False] if native.available() else [False]):
        if use_native:
            got_f, got_o = rasterize_arrays(
                onsets, offsets, pitches, n_frames, hop, sr)
        else:
            native_fn = native.available
            try:
                native.available = lambda: False
                got_f, got_o = rasterize_arrays(
                    onsets, offsets, pitches, n_frames, hop, sr)
            finally:
                native.available = native_fn
        np.testing.assert_array_equal(got_f, want_f)
        np.testing.assert_array_equal(got_o, want_o)


def test_audio_cache_lru_eviction(tmp_path):
    """Bounded decoded-audio cache: stays under the byte budget, evicted
    clips re-decode to identical windows."""
    d = tmp_path / "MAPS" / "AkPnBcht" / "MUS"
    d.mkdir(parents=True)
    n = SR * 2
    for i in range(6):
        make_clip(d / f"c{i}", seconds=2.0, notes=[(60 + i, 0.2, 1.0)])
    ds = MAPS(str(tmp_path), groups="train", sequence_length=n,
              max_cache_bytes=2 * n * 4)
    ref = [ds[i]["audio"].copy() for i in range(6)]
    assert len(ds._audio_cache) <= 2
    assert ds._cache_bytes <= 2 * n * 4
    again = [ds[i]["audio"] for i in range(6)]
    for a, b in zip(ref, again):
        np.testing.assert_array_equal(a, b)


def test_window_roll_equals_full_roll_slice_all_starts(tmp_path):
    """EVERY hop-aligned window's roll is bit-identical to the matching
    slice of the full-clip roll — including .5-frame note boundaries
    (rasterize_arrays frame_offset: rounding on the absolute grid)."""
    from diffroll_tpu.data.rasterize import rasterize_arrays

    # onsets/offsets engineered to land exactly on x.5 frame boundaries
    notes = [(60, 0.1, 3.9), (72, 1.0, 1.5), (84, 2.0, 2.25),
             (65, 512 * 10.5 / SR, 512 * 20.5 / SR)]
    on = np.array([n[1] for n in notes])
    off = np.array([n[2] for n in notes])
    pit = np.array([n[0] for n in notes])
    total = 125
    full, _ = rasterize_arrays(on, off, pit, total, HOP, SR)
    n_frames = 31
    for f0 in range(0, total - n_frames):
        win, _ = rasterize_arrays(on, off, pit, n_frames, HOP, SR,
                                  frame_offset=f0)
        np.testing.assert_array_equal(win, full[f0:f0 + n_frames],
                                      err_msg=f"start frame {f0}")


def test_loader_deterministic_across_worker_counts(maps_tree):
    """Random train windows are reproducible regardless of worker count /
    thread interleaving (stateless per-(clip, draw) hashing, amt._draw)."""
    def batches(nw):
        ds = MAPS(str(maps_tree), groups="train", sequence_length=SR)
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                            num_workers=nw)
        return [b["frame"] for _ in range(2) for b in loader]

    a, b = batches(1), batches(4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_loader_abandoned_epoch_stays_deterministic(maps_tree):
    """Breaking out of an epoch cancels queued work and DRAINS running
    tasks before returning, so no stale fetch can race a later epoch's
    draw ordering: abandoned-then-resumed runs are repeatable."""
    def run():
        ds = MAPS(str(maps_tree), groups="train", sequence_length=SR)
        loader = DataLoader(ds, batch_size=2, num_workers=4, prefetch=2)
        for b in loader:
            break  # abandon mid-epoch
        try:
            for b in loader:  # abandon via consumer exception
                raise RuntimeError("consumer failure")
        except RuntimeError:
            pass
        return [b["frame"] for b in loader]  # full epoch after abandonment

    a, b = run(), run()
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_shared_dataset_concurrent_iterators_deterministic(maps_tree):
    """Two loaders sharing ONE dataset object, iterated concurrently from
    two threads, must each see the same windows as a loader over a fresh
    dataset: the loader passes the epoch explicitly (getitem_at), so
    window draws are a pure function of (seed, clip, epoch) — no shared
    counter assigned in thread-scheduling order."""
    import threading

    def reference_batches():
        ds = MAPS(str(maps_tree), groups="train", sequence_length=SR)
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                            num_workers=2)
        return [b["frame"] for b in loader]

    ref = reference_batches()

    shared = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    loaders = [DataLoader(shared, batch_size=2, shuffle=True, seed=7,
                          num_workers=2) for _ in range(2)]
    results = [None, None]

    def run(i):
        results[i] = [b["frame"] for b in loaders[i]]

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got in results:
        assert len(got) == len(ref)
        for x, y in zip(got, ref):
            np.testing.assert_array_equal(x, y)


def test_double_dataset_epoch_forwarding(maps_tree):
    """DoubleDataset forwards the loader epoch to both children, so the
    dual-dataset recipe keeps deterministic windows too."""
    ds1 = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    ds2 = MAPS(str(maps_tree), groups="train", sequence_length=SR)
    a1, a2 = ds1.getitem_at(0, epoch=3), ds2.getitem_at(0, epoch=3)
    both = DoubleDataset(
        MAPS(str(maps_tree), groups="train", sequence_length=SR),
        MAPS(str(maps_tree), groups="train", sequence_length=SR),
    ).getitem_at(0, epoch=3)
    np.testing.assert_array_equal(both[0]["frame"], a1["frame"])
    np.testing.assert_array_equal(both[1]["frame"], a2["frame"])
    # a different epoch draws a different window for a long enough clip
    b1 = ds1.getitem_at(0, epoch=4)
    assert not np.array_equal(a1["audio"], b1["audio"])


def test_eval_overlapped_windows_geometry(tmp_path):
    """With eval_overlap_frames, consecutive eval windows share exactly
    that many frames and still cover the full recording."""
    d = tmp_path / "MAPS" / "ENSTDkAm" / "MUS"
    d.mkdir(parents=True)
    seconds = 13.3
    make_clip(d / "long", seconds=seconds)
    seq, ov = 64 * HOP, 16
    ds = MAPS(str(tmp_path), groups="test", sequence_length=seq,
              eval_overlap_frames=ov)
    n_samples = int(seconds * SR)
    total_frames = int(np.ceil(n_samples / HOP))
    win = seq // HOP
    expected = 1 + int(np.ceil(max(total_frames - win, 0) / (win - ov)))
    assert len(ds) == expected == ds.n_windows(total_frames)
    starts = [int(ds[i]["start_frame"]) for i in range(len(ds))]
    assert starts == [i * (win - ov) for i in range(expected)]
    # coverage: last window reaches past the end of the recording
    assert starts[-1] + win >= total_frames
    # windows agree with the full rasterization at their own offsets
    from diffroll_tpu.io.midi import read_midi
    from diffroll_tpu.data import rasterize_notes

    midi_notes = read_midi(str(d / "long.mid"))
    full, _ = rasterize_notes(midi_notes, starts[-1] + win, HOP, SR)
    for i in range(len(ds)):
        it = ds[i]
        np.testing.assert_array_equal(it["frame"],
                                      full[starts[i]: starts[i] + win])


# ---------------------------------------------------- packed H2D transfer

def test_pack_unpack_roundtrip_bit_exact():
    """int16 audio packing must invert io/wav's PCM16 decode exactly
    (x = pcm/32768 -> round(x*32768) = pcm), and binary rolls survive
    uint8 round-trip untouched."""
    import jax.numpy as jnp

    from diffroll_tpu.data.pipeline import pack_batch, unpack_batch

    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32768, size=(2, 4096)).astype(np.int16)
    batch = {
        "audio": pcm.astype(np.float32) / 32768.0,   # the decode convention
        "frame": (rng.rand(2, 8, 88) > 0.9).astype(np.float32),
        "onset": (rng.rand(2, 8, 88) > 0.95).astype(np.float32),
        "clip_idx": np.arange(2, dtype=np.int32),
    }
    packed = pack_batch(batch)
    assert packed["audio"].dtype == np.int16
    np.testing.assert_array_equal(packed["audio"], pcm)
    assert packed["frame"].dtype == np.uint8
    assert packed["clip_idx"].dtype == np.int32  # untouched
    un = unpack_batch({k: jnp.asarray(v) for k, v in packed.items()})
    np.testing.assert_array_equal(np.asarray(un["audio"]), batch["audio"])
    np.testing.assert_array_equal(np.asarray(un["frame"]), batch["frame"])
    np.testing.assert_array_equal(np.asarray(un["onset"]), batch["onset"])
    # float32 batches pass through unchanged (no-op contract)
    same = unpack_batch({k: jnp.asarray(v) for k, v in batch.items()})
    np.testing.assert_array_equal(np.asarray(same["audio"]), batch["audio"])


def test_pack_batch_handles_dual_dataset_pairs():
    from diffroll_tpu.data.pipeline import pack_batch

    b = {"audio": np.zeros((1, 64), np.float32),
         "frame": np.zeros((1, 2, 88), np.float32)}
    packed = pack_batch((b, b))
    assert isinstance(packed, tuple) and len(packed) == 2
    assert packed[0]["audio"].dtype == np.int16


def test_loss_fn_identical_on_packed_batch():
    """Training on packed batches must be numerically identical to f32
    batches when the audio sits on the PCM16 grid (i.e. for real corpora):
    same loss, bit for bit."""
    import jax
    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.data.pipeline import pack_batch
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=16, timesteps=8)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=8))
    rng = np.random.RandomState(1)
    pcm = rng.randint(-3000, 3000, size=(2, 16 * 512)).astype(np.int16)
    batch = {
        "audio": pcm.astype(np.float32) / 32768.0,
        "frame": (rng.rand(2, 16, 88) > 0.9).astype(np.float32),
    }
    key = jax.random.key(7)
    loss_a, _ = task.loss_fn(params, jax.device_put(batch), key, True)
    loss_b, _ = task.loss_fn(params, jax.device_put(pack_batch(batch)),
                             key, True)
    assert float(loss_a) == float(loss_b), (float(loss_a), float(loss_b))
