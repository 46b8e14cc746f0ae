"""Real-corpus directory layouts, fabricated (VERDICT r4 item 8).

`data/amt.py`'s MAPS subset-split and MAESTRO v2/v3 metadata handling were
written blind (no egress = no real corpora), and every committed run
exercises only the flat-folder fallback. These tests fabricate the REAL
on-disk layouts — MAPS `<root>/MAPS/<subset>/MUS/MAPS_MUS-*.wav` with
tab-separated `.txt` labels, `maestro-v3.0.0/` with the full v3 json schema
(dict of column -> {index: value}), `maestro-v2.0.0/` with the v2 list-json
and csv — and drive the loaders and the CLI through the metadata paths, so
first contact with real data is not in anger.

Layout contracts: reference config/dataset/MAPS.yaml:2-15 (root/groups/
data_type ctor args), config/dataset/MAESTRO.yaml:2-13; MAPS txt label
format `OnsetTime\tOffsetTime\tMidiPitch`; MAESTRO metadata schemas per
the official v2.0.0/v3.0.0 releases.
"""

import json
import pathlib

import numpy as np
import pytest

from diffroll_tpu.data.amt import MAESTRO, MAPS
from diffroll_tpu.io.wav import write_wav

SR = 16000
SEQ = 8192  # 16 frames @ hop 512


def _write_clip(path: pathlib.Path, seconds: float = 1.0):
    n = int(seconds * SR)
    rng = np.random.RandomState(abs(hash(str(path))) % (2**31))
    write_wav(path, rng.randn(n).astype(np.float32) * 0.1, SR)


def _write_maps_txt(path: pathlib.Path, notes):
    lines = ["OnsetTime\tOffsetTime\tMidiPitch"]
    lines += [f"{on:.6f}\t{off:.6f}\t{pitch}" for on, off, pitch in notes]
    # real MAPS txt files end with a trailing newline
    path.write_text("\n".join(lines) + "\n")


@pytest.fixture()
def maps_real_tree(tmp_path):
    """MAPS with realistic names, .txt labels, several subsets, plus decoys:
    an ISOL data_type dir (must be ignored when data_type='MUS') and an
    unlabeled wav (must be skipped)."""
    notes = [(0.05, 0.4, 60), (0.3, 0.8, 64), (0.5, 0.9, 72)]
    layout = {
        "AkPnBcht": 3, "SptkBGAm": 2,          # train subsets
        "ENSTDkAm": 2, "ENSTDkCl": 1,          # Disklavier test subsets
    }
    for subset, n in layout.items():
        d = tmp_path / "MAPS" / subset / "MUS"
        d.mkdir(parents=True)
        for i in range(n):
            stem = d / f"MAPS_MUS-chp_op{i}_{subset}"
            _write_clip(stem.with_suffix(".wav"))
            _write_maps_txt(stem.with_suffix(".txt"), notes)
    # decoy 1: an ISOL recording (different data_type) in a train subset
    iso = tmp_path / "MAPS" / "AkPnBcht" / "ISOL" / "NO"
    iso.mkdir(parents=True)
    _write_clip(iso / "MAPS_ISOL_NO_P_S0_AkPnBcht.wav")
    _write_maps_txt(iso / "MAPS_ISOL_NO_P_S0_AkPnBcht.txt", notes)
    # decoy 2: an unlabeled wav in a train subset
    _write_clip(tmp_path / "MAPS" / "SptkBGAm" / "MUS" / "orphan.wav")
    return tmp_path


def test_maps_instrument_split_and_txt_labels(maps_real_tree):
    train = MAPS(str(maps_real_tree), groups="train", sequence_length=SEQ)
    test = MAPS(str(maps_real_tree), groups="test", sequence_length=SEQ)
    # 3 + 2 labeled MUS train clips; ISOL and the orphan wav excluded
    assert len(train.pairs) == 5
    assert all("MUS" in str(w) for w, _ in train.pairs)
    assert all(any(s in str(w) for s in ("AkPnBcht", "SptkBGAm"))
               for w, _ in train.pairs)
    # Disklavier subsets only in test; eval enumerates coverage windows
    assert all(any(s in str(w) for s in ("ENSTDkAm", "ENSTDkCl"))
               for w, _ in test.pairs)
    assert len(test.pairs) == 3
    assert all(lbl.suffix == ".txt" for _, lbl in train.pairs)

    # deterministic window (train windows are random; pin to the clip head
    # so the 0.05-0.4 s note is guaranteed in view)
    det = MAPS(str(maps_real_tree), groups="train", sequence_length=SEQ,
               deterministic=True)
    item = det[0]
    assert item["frame"].shape == (SEQ // 512, 88)
    assert item["audio"].shape == (SEQ,)
    # the .txt notes rasterized: pitch 60 sounds 0.05-0.4 s
    assert item["frame"][:, 60 - 21].max() == 1.0
    assert item["frame"].sum() > 0


def test_maps_txt_and_midi_labels_rasterize_identically(tmp_path):
    """A MAPS .txt label and a MIDI file with the same notes must produce
    the same roll (the .txt path bypasses sustain extension by design —
    MAPS txt already encodes sustain)."""
    from diffroll_tpu.io.midi import write_midi

    notes = [(0.05, 0.4, 60), (0.3, 0.8, 64)]
    d = tmp_path / "MAPS" / "AkPnBcht" / "MUS"
    d.mkdir(parents=True)
    _write_clip(d / "a.wav")
    _write_maps_txt(d / "a.txt", notes)
    d2 = tmp_path / "flat"
    d2.mkdir()
    _write_clip(d2 / "a.wav")
    write_midi(str(d2 / "a.mid"), [p for _, _, p in notes],
               [(on, off) for on, off, _ in notes])

    via_txt = MAPS(str(tmp_path), groups="train", sequence_length=SEQ,
                   deterministic=True)[0]
    via_midi = MAESTRO(str(d2), groups="train", sequence_length=SEQ,
                       deterministic=True)[0]
    np.testing.assert_array_equal(via_txt["frame"], via_midi["frame"])


def _maestro_clips(droot: pathlib.Path, years_splits):
    """Write clips + return (audio_filename, midi_filename, split) rows."""
    from diffroll_tpu.io.midi import write_midi

    rows = []
    for i, (year, split) in enumerate(years_splits):
        d = droot / str(year)
        d.mkdir(parents=True, exist_ok=True)
        stem = d / (f"MIDI-Unprocessed_{i:02d}_R1_2014_01-02_ORIG"
                    f"_MID--AUDIO_{i:02d}")
        _write_clip(stem.with_suffix(".wav"))
        write_midi(str(stem.with_suffix(".midi")), [60 + i],
                   [(0.1, 0.6)])
        rows.append((f"{year}/{stem.name}.wav", f"{year}/{stem.name}.midi",
                     split))
    return rows


def test_maestro_v3_full_json_schema(tmp_path):
    """The v3 metadata is a dict of column -> {string index: value} with
    the full column set; split membership must come from it, not globbing."""
    droot = tmp_path / "maestro-v3.0.0"
    rows = _maestro_clips(droot, [(2018, "train"), (2018, "train"),
                                  (2017, "validation"), (2015, "test")])
    cols = {
        "canonical_composer": {}, "canonical_title": {}, "split": {},
        "year": {}, "midi_filename": {}, "audio_filename": {},
        "duration": {},
    }
    for i, (wav, midi, split) in enumerate(rows):
        k = str(i)
        cols["canonical_composer"][k] = "Franz Schubert"
        cols["canonical_title"][k] = f"Piece {i}"
        cols["split"][k] = split
        cols["year"][k] = int(wav.split("/")[0])
        cols["midi_filename"][k] = midi
        cols["audio_filename"][k] = wav
        cols["duration"][k] = 1.0
    (droot / "maestro-v3.0.0.json").write_text(json.dumps(cols))

    train = MAESTRO(str(tmp_path), groups="train", sequence_length=SEQ)
    val = MAESTRO(str(tmp_path), groups="validation", sequence_length=SEQ)
    test = MAESTRO(str(tmp_path), groups="test", sequence_length=SEQ)
    assert (len(train.pairs), len(val.pairs), len(test.pairs)) == (2, 1, 1)
    assert all("2018" in str(w) for w, _ in train.pairs)
    item = train[0]
    assert item["frame"].shape == (SEQ // 512, 88)
    assert item["frame"].sum() > 0


def test_maestro_v3_missing_files_are_skipped(tmp_path):
    """Metadata rows whose audio/midi doesn't exist on disk (partial
    download) are skipped, not fatal."""
    droot = tmp_path / "maestro-v3.0.0"
    rows = _maestro_clips(droot, [(2018, "train")])
    cols = {"split": {}, "midi_filename": {}, "audio_filename": {}}
    for i, (wav, midi, split) in enumerate(rows):
        cols["split"][str(i)] = split
        cols["midi_filename"][str(i)] = midi
        cols["audio_filename"][str(i)] = wav
    # phantom row pointing at files that don't exist
    cols["split"]["99"] = "train"
    cols["midi_filename"]["99"] = "2018/missing.midi"
    cols["audio_filename"]["99"] = "2018/missing.wav"
    (droot / "maestro-v3.0.0.json").write_text(json.dumps(cols))
    assert len(MAESTRO(str(tmp_path), groups="train",
                       sequence_length=SEQ).pairs) == 1


def test_maestro_v2_list_json_schema(tmp_path):
    """The v2 metadata json is a LIST of row dicts."""
    droot = tmp_path / "maestro-v2.0.0"
    rows = _maestro_clips(droot, [(2014, "train"), (2014, "test")])
    entries = [
        {"canonical_composer": "c", "canonical_title": "t", "split": split,
         "year": 2014, "midi_filename": midi, "audio_filename": wav,
         "duration": 1.0}
        for wav, midi, split in rows
    ]
    (droot / "maestro-v2.0.0.json").write_text(json.dumps(entries))
    train = MAESTRO(str(tmp_path), groups="train", sequence_length=SEQ)
    test = MAESTRO(str(tmp_path), groups="test", sequence_length=SEQ)
    assert (len(train.pairs), len(test.pairs)) == (1, 1)
    assert train[0]["frame"].sum() > 0


def test_maestro_csv_metadata(tmp_path):
    """csv metadata is honored when no json exists (the v2 release ships
    both; some mirrors only the csv)."""
    droot = tmp_path / "maestro-v2.0.0"
    rows = _maestro_clips(droot, [(2014, "train"), (2014, "validation")])
    lines = ["canonical_composer,canonical_title,split,year,"
             "midi_filename,audio_filename,duration"]
    lines += [f"c,t,{split},2014,{midi},{wav},1.0"
              for wav, midi, split in rows]
    (droot / "maestro-v2.0.0.csv").write_text("\n".join(lines) + "\n")
    train = MAESTRO(str(tmp_path), groups="train", sequence_length=SEQ)
    assert len(train.pairs) == 1


def test_maestro_picks_latest_version_dir(tmp_path):
    """With both maestro-v2.0.0/ and maestro-v3.0.0/ under root, the
    latest sorts last and wins."""
    for ver, year in (("maestro-v2.0.0", 2014), ("maestro-v3.0.0", 2018)):
        droot = tmp_path / ver
        rows = _maestro_clips(droot, [(year, "train")])
        cols = {"split": {}, "midi_filename": {}, "audio_filename": {}}
        for i, (wav, midi, split) in enumerate(rows):
            cols["split"][str(i)] = split
            cols["midi_filename"][str(i)] = midi
            cols["audio_filename"][str(i)] = wav
        (droot / f"{ver}.json").write_text(json.dumps(cols))
    ds = MAESTRO(str(tmp_path), groups="train", sequence_length=SEQ)
    assert "maestro-v3.0.0" in str(ds.pairs[0][0])


def test_cli_train_test_on_maps_txt_layout(maps_real_tree, tmp_path):
    """End-to-end through the product CLI on the realistic MAPS tree
    (txt labels + instrument split + decoys): fit -> checkpoint -> scored
    eval on the Disklavier split (reference train_spec_roll.py:16-59)."""
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main([
        "spec_roll", f"dataset.root={maps_real_tree}",
        f"trainer.output_dir={out}",
        "model.residual_channels=16", "model.residual_layers=2",
        "model.frames=16", "task.timesteps=4",
        "dataloader.train_batch_size=2", "dataloader.test_batch_size=2",
        "dataloader.num_workers=1", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1", "trainer.log_every_n_steps=1",
        f"dataset.sequence_length={SEQ}",
    ])
    metrics_files = sorted(out.rglob("test_metrics.json"))
    assert metrics_files
    metrics = json.loads(metrics_files[0].read_text())
    assert 0.0 <= metrics["frame_f1"] <= 1.0
    assert metrics["n_clips"] == 3  # ENSTDkAm x2 + ENSTDkCl x1
