"""MIDI I/O and piano-roll round-trip tests (SURVEY.md §4: the reference's
empty tests/test_midi_conversion.py names this suite)."""
import os

import numpy as np
import pytest
from PIL import Image

from flocoder_tpu.data.midi_io import (MidiFile, MidiInstrument, MidiNote,
                                       read_midi, write_midi)
from flocoder_tpu.data.pianoroll import (
    piano_roll_to_midi, get_piano_rolls, midi_to_pr_img, img2midi_multi,
    img_file_2_midi_file, square_to_rect, rect_to_square, filter_redgreen,
    RandomBarCrop, stack_piano_rolls, calc_note_metrics, _roll_to_rgb)


def _toy_midi(tmp_path, name="PIANO"):
    inst = MidiInstrument(name=name, notes=[
        MidiNote(pitch=60, velocity=80, start=0.0, end=0.5),
        MidiNote(pitch=64, velocity=100, start=0.5, end=1.0),
        MidiNote(pitch=67, velocity=60, start=1.0, end=2.0),
    ])
    mf = MidiFile(instruments=[inst], tempos=[(0.0, 120.0)])
    path = os.path.join(tmp_path, "toy.mid")
    write_midi(path, mf)
    return path, mf


def test_midi_write_read_roundtrip(tmp_path):
    path, orig = _toy_midi(str(tmp_path))
    back = read_midi(path)
    assert len(back.instruments) == 1
    inst = back.instruments[0]
    assert inst.name == "PIANO"
    assert len(inst.notes) == 3
    for a, b in zip(orig.instruments[0].notes, inst.notes):
        assert a.pitch == b.pitch
        assert a.velocity == b.velocity
        assert abs(a.start - b.start) < 1e-3
        assert abs(a.end - b.end) < 1e-3


def test_tempo_map(tmp_path):
    path, _ = _toy_midi(str(tmp_path))
    mf = read_midi(path)
    times, tempi = mf.get_tempo_changes()
    assert abs(float(tempi[0]) - 120.0) < 1e-6
    assert abs(mf.get_end_time() - 2.0) < 1e-2


def test_get_piano_rolls_velocity_and_gap():
    inst = MidiInstrument(name="PIANO", notes=[
        MidiNote(pitch=60, velocity=90, start=0.0, end=1.0),
        MidiNote(pitch=60, velocity=70, start=1.0, end=1.5),
    ])
    mf = MidiFile(instruments=[inst])
    rolls = get_piano_rolls(mf, fs=8)
    pr = rolls["PIANO"]
    assert pr[60, 0] == 90
    # forced onset gap: frame just before 2nd note's start is zeroed
    assert pr[60, 7] == 0
    assert pr[60, 8] == 70
    assert np.array_equal(rolls["TOTAL"], rolls["PIANO"])


def test_roll_to_rgb_onset_start_style():
    pr = np.zeros((128, 16))
    pr[60, 4:8] = 100
    rgb = _roll_to_rgb(pr, add_onsets=True, onset_style="start")
    assert rgb[60, 4, 0] == 200 and rgb[60, 4, 1] == 0   # red onset px
    assert rgb[60, 5, 1] == 200 and rgb[60, 5, 0] == 0   # green sustain


def test_square_rect_roundtrip():
    rng = np.random.default_rng(0)
    arr = (rng.random((128, 512, 3)) * 255).astype(np.uint8)
    rect = Image.fromarray(arr)
    sq = rect_to_square(rect)
    assert sq.size == (256, 256)
    back = square_to_rect(sq)
    assert back.size == (512, 128)
    np.testing.assert_array_equal(np.array(back), arr)


def test_midi_to_image_to_midi_roundtrip(tmp_path):
    """Full pipeline: notes → image → notes with pitch/timing preserved."""
    path, orig = _toy_midi(str(tmp_path))
    out_dir = str(tmp_path / "imgs")
    files = midi_to_pr_img(path, out_dir)
    assert files, "no images produced"
    piano_img = [f for f in files if "PIANO" in f][0]
    midi_path = img_file_2_midi_file(piano_img, str(tmp_path))
    back = read_midi(midi_path)
    pitches = sorted({n.pitch for n in back.instruments[0].notes})
    assert set(pitches) >= {60, 64, 67}, pitches


def test_piano_roll_to_midi_events():
    pr = np.zeros((128, 32), int)
    pr[72, 4:12] = 88
    mf = piano_roll_to_midi(pr, fs=8)
    notes = mf.instruments[0].notes
    assert len(notes) == 1
    n = notes[0]
    assert n.pitch == 72 and n.velocity == 88
    assert abs(n.start - 0.5) < 1e-6 and abs(n.end - 1.5) < 1e-6


def test_filter_redgreen_requires_onsets():
    arr = np.zeros((16, 16, 3), np.uint8)
    arr[8, 4] = (200, 0, 0)      # onset
    arr[8, 5:8, 1] = 200         # sustain after onset → kept
    arr[10, 5:8, 1] = 200        # sustain with no onset → dropped
    img = filter_redgreen(Image.fromarray(arr), require_onsets=True)
    out = np.array(img)
    assert out[8, 5, 1] == 200
    assert out[10, 5:8].sum() == 0
    assert out[8, 4, 1] == 200  # 'start' style: red became green


def test_random_bar_crop_and_stack():
    img = Image.fromarray(np.zeros((128, 800, 3), np.uint8))
    crop = RandomBarCrop()(img, np.random.default_rng(0))
    assert crop.size == (512, 128)
    stacked = stack_piano_rolls(crop)
    assert stacked.size == (256, 256)


def test_calc_note_metrics_perfect_and_disjoint():
    img = np.zeros((2, 32, 32, 3), np.float32)
    img[:, 10, 5] = [1, 0, 0]
    img[:, 10, 6:10] = [0, 1, 0]
    m = calc_note_metrics(img, img)
    assert m["onset_f1"] > 0.99
    assert m["sustain_f1"] > 0.99
    m2 = calc_note_metrics(np.zeros_like(img), img)
    assert m2["onset_sensitivity"] < 1e-6


def test_midi_image_dataset_conversion(tmp_path):
    """Toy MIDI corpus → piano-roll PNGs → dataset → loader batches."""
    from flocoder_tpu.data.datasets import MIDIImageDataset, Loader
    corpus = tmp_path / "corpus"
    for song in ("001", "002", "010"):
        d = corpus / song
        d.mkdir(parents=True)
        inst = MidiInstrument(name="PIANO", notes=[
            MidiNote(pitch=60 + i, velocity=80, start=i * 0.25,
                     end=i * 0.25 + 0.2) for i in range(8)])
        write_midi(str(d / f"{song}.mid"),
                   MidiFile(instruments=[inst], tempos=[(0.0, 120.0)]))
    ds = MIDIImageDataset(str(corpus), image_dir=str(tmp_path / "imgs"),
                          split="train", val_mod=10)
    # song 010 (divisible by 10) goes to val; 001/002 train, 3 rolls each
    assert len(ds) == 6
    val = MIDIImageDataset(str(corpus), image_dir=str(tmp_path / "imgs"),
                           split="val", val_mod=10)
    assert len(val) == 3
    item, label = ds.get(0, np.random.default_rng(0))
    assert item.ndim == 3 and item.shape[-1] == 3
    loader = Loader(ds, batch_size=2, num_workers=1, seed=0)
    b = next(iter(loader))
    assert b["target"].shape[0] == 2


def test_midi_dataset_download_and_skip_versions(tmp_path):
    """The egress-gated POP909 fetch path (reference data.py:199,214-216)
    driven through a file:// URL: an empty midi_dir + download=True fetches
    and extracts the zip, and versions/ alternate takes are skipped
    (reference :219-220)."""
    import zipfile
    from flocoder_tpu.data.datasets import (MIDIImageDataset,
                                            maybe_download_pop909)
    inst = MidiInstrument(name="PIANO", notes=[
        MidiNote(pitch=60 + i, velocity=80, start=i * 0.25,
                 end=i * 0.25 + 0.2) for i in range(8)])
    src = tmp_path / "src"
    for rel in ("POP909/001/001.mid", "POP909/002/002.mid",
                "POP909/001/versions/alt.mid"):
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        write_midi(str(p), MidiFile(instruments=[inst],
                                    tempos=[(0.0, 120.0)]))
    zip_path = tmp_path / "POP909.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(src):
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, src))
    url = "file://" + str(zip_path)
    corpus = tmp_path / "corpus"
    got = maybe_download_pop909(str(corpus), url=url)
    assert got and os.path.isdir(got)
    # a second call is idempotent (already-extracted fast path)
    assert maybe_download_pop909(str(corpus), url=url) == got
    ds = MIDIImageDataset(str(tmp_path / "corpus2"),
                          image_dir=str(tmp_path / "imgs"),
                          split="train", val_mod=10, url=url)
    # 2 songs × 3 rolls each; the versions/ take is excluded
    assert len(ds) == 6
    assert not any("versions" in f for f in ds.files)
    tot = MIDIImageDataset(str(tmp_path / "corpus2"),
                           image_dir=str(tmp_path / "imgs"),
                           split="train", val_mod=10, url=url,
                           total_only=True)
    assert len(tot.files) == 2
    assert all("_TOTAL" in os.path.basename(f) for f in tot.files)
    # bad URL + no local corpus → clear FileNotFoundError (no egress here)
    with pytest.raises(FileNotFoundError):
        MIDIImageDataset(str(tmp_path / "nowhere"),
                         url="file:///nonexistent.zip")


def test_chord_color_bars(tmp_path):
    """Chord bars paint the CHORD_BORDER top/bottom rows with per-chord
    colors; blockout_topbottom_arr strips them (reference pianoroll.py:
    210-228 — broken there: its chords-module import is commented out)."""
    from flocoder_tpu.data.pianoroll import (CHORD_BORDER,
                                             blockout_topbottom_arr,
                                             chord_num_to_color,
                                             load_chord_annotations,
                                             midi_to_pr_img, simplify_chord)

    assert simplify_chord("C:maj7(b5)/3") == "C:maj"
    assert simplify_chord("N") == "N"
    assert simplify_chord("A:7") == "A"
    c0, c1 = chord_num_to_color(0, 25), chord_num_to_color(1, 25)
    assert c0 != c1 and all(0 <= v <= 255 for v in c0 + c1)

    path, _ = _toy_midi(str(tmp_path))
    # sibling chord annotation file, TSV seconds: two chords + one unknown
    with open(str(tmp_path / "toy_chords.txt"), "w") as f:
        f.write("0.0\t0.5\tC:maj\n0.5\t1.0\tG:min7\n1.0\t2.0\tX:odd\n")
    vocab = ["N", "C:maj", "G:min"]
    out = midi_to_pr_img(path, str(tmp_path / "imgs"), show_chords=True,
                         all_chords=vocab, simplify_chords=True)
    assert out
    arr = np.asarray(Image.open(out[0]))
    fs = 16.0  # 120 bpm → 2 bps → fs = 8·bps
    # C:maj bar color in the top border over its first frame
    assert tuple(arr[0, 0]) == chord_num_to_color(1, len(vocab))
    assert tuple(arr[-1, 0]) == chord_num_to_color(1, len(vocab))
    # G:min7 simplifies to G:min (vocab index 2)
    assert tuple(arr[0, int(0.5 * fs)]) == chord_num_to_color(2, len(vocab))
    # unknown chord paints gray
    assert tuple(arr[0, int(1.0 * fs) + 1]) == (128, 128, 128)
    # blockout strips the bars for the img→MIDI path
    stripped = blockout_topbottom_arr(arr)
    assert (stripped[:CHORD_BORDER] == 0).all()
    assert (stripped[-CHORD_BORDER:] == 0).all()

    chords = load_chord_annotations(str(tmp_path / "toy_chords.txt"), fs,
                                    vocab, simplify=True)
    assert [c["chord_num"] for c in chords] == [1, 2, -1]
    assert chords[0]["start"] == 0 and chords[0]["end"] == 8
