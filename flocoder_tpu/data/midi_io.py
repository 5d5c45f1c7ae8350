"""First-party Standard MIDI File (SMF) reader/writer.

The reference uses pretty_midi (flocoder/pianoroll.py:14); that package is not
installed here, so this module implements the small subset of MIDI the
piano-roll pipeline needs, dependency-free:

- ``read_midi``: parse format 0/1 files — header division, tempo map (meta
  0x51), track names (meta 0x03), program changes, note-on/off pairing with
  running status — into ``MidiFile``/``MidiInstrument``/``MidiNote`` objects
  with absolute times in SECONDS (tempo-map-correct conversion).
- ``write_midi``: emit a format-1 file at a fixed tempo.
- ``MidiFile.get_tempo_changes`` / ``get_end_time`` mirror the pretty_midi
  call sites used by the reference (pianoroll.py:118, 281).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Tuple

__all__ = ["MidiNote", "MidiInstrument", "MidiFile", "read_midi",
           "write_midi"]


@dataclass
class MidiNote:
    pitch: int
    velocity: int
    start: float  # seconds
    end: float    # seconds


@dataclass
class MidiInstrument:
    name: str = ""
    program: int = 0
    is_drum: bool = False
    notes: List[MidiNote] = field(default_factory=list)


@dataclass
class MidiFile:
    instruments: List[MidiInstrument] = field(default_factory=list)
    tempos: List[Tuple[float, float]] = field(default_factory=list)  # (time_s, bpm)

    def get_tempo_changes(self):
        """pretty_midi-compatible: (times array, bpm array)."""
        import numpy as np
        if not self.tempos:
            return np.array([0.0]), np.array([120.0])
        t, b = zip(*self.tempos)
        return np.asarray(t), np.asarray(b)

    def get_end_time(self) -> float:
        return max((n.end for i in self.instruments for n in i.notes),
                   default=0.0)

    def write(self, path: str, ticks_per_beat: int = 480):
        write_midi(path, self, ticks_per_beat=ticks_per_beat)


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    while True:
        b = data[pos]
        pos += 1
        value = (value << 7) | (b & 0x7F)
        if not b & 0x80:
            return value, pos


def _varint(value: int) -> bytes:
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def read_midi(path: str) -> MidiFile:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"MThd":
        raise ValueError(f"{path}: not a MIDI file")
    hlen = struct.unpack(">I", data[4:8])[0]
    fmt, ntrks, division = struct.unpack(">HHH", data[8:14])
    if division & 0x8000:
        raise ValueError("SMPTE time division not supported")
    tpb = division

    pos = 8 + hlen
    # Pass 1: collect tempo events (tick, us_per_beat) across all tracks.
    tracks_raw = []
    for _ in range(ntrks):
        if data[pos:pos + 4] != b"MTrk":
            raise ValueError("bad track chunk")
        tlen = struct.unpack(">I", data[pos + 4:pos + 8])[0]
        tracks_raw.append(data[pos + 8:pos + 8 + tlen])
        pos += 8 + tlen

    tempo_events: List[Tuple[int, int]] = []  # (tick, us_per_beat)

    def parse_track(raw: bytes, collect):
        p = 0
        tick = 0
        status = 0
        while p < len(raw):
            delta, p = _read_varint(raw, p)
            tick += delta
            b = raw[p]
            if b >= 0x80:
                status = b
                p += 1
            if status == 0xFF:  # meta
                mtype = raw[p]
                mlen, p2 = _read_varint(raw, p + 1)
                payload = raw[p2:p2 + mlen]
                p = p2 + mlen
                collect(tick, "meta", mtype, payload)
            elif status in (0xF0, 0xF7):  # sysex
                mlen, p2 = _read_varint(raw, p)
                p = p2 + mlen
            else:
                kind = status & 0xF0
                ch = status & 0x0F
                if kind in (0xC0, 0xD0):  # program change / channel pressure
                    collect(tick, "short", status, raw[p:p + 1])
                    p += 1
                else:
                    collect(tick, "event", status, raw[p:p + 2])
                    p += 2

    for raw in tracks_raw:
        def tempo_collect(tick, kind, a, payload):
            if kind == "meta" and a == 0x51 and len(payload) == 3:
                tempo_events.append(
                    (tick, int.from_bytes(payload, "big")))
        parse_track(raw, tempo_collect)
    tempo_events.sort()
    if not tempo_events or tempo_events[0][0] > 0:
        tempo_events.insert(0, (0, 500000))  # default 120 bpm

    # tick → seconds via the tempo map
    seg_start_tick = [t for t, _ in tempo_events]
    seg_uspb = [u for _, u in tempo_events]
    seg_start_sec = [0.0]
    for i in range(1, len(tempo_events)):
        dt = (seg_start_tick[i] - seg_start_tick[i - 1]) / tpb
        seg_start_sec.append(seg_start_sec[-1] + dt * seg_uspb[i - 1] / 1e6)

    def tick_to_sec(tick: int) -> float:
        import bisect
        i = bisect.bisect_right(seg_start_tick, tick) - 1
        return (seg_start_sec[i] +
                (tick - seg_start_tick[i]) / tpb * seg_uspb[i] / 1e6)

    mf = MidiFile(tempos=[(tick_to_sec(t), 6e7 / u)
                          for t, u in tempo_events])

    for raw in tracks_raw:
        inst = MidiInstrument()
        open_notes: dict = {}

        def collect(tick, kind, a, payload):
            if kind == "meta" and a == 0x03:
                inst.name = payload.decode("latin-1", errors="replace")
            elif kind == "short" and (a & 0xF0) == 0xC0:
                inst.program = payload[0]
            elif kind == "event":
                st = a & 0xF0
                ch = a & 0x0F
                if ch == 9:
                    inst.is_drum = True
                if st == 0x90 and payload[1] > 0:  # note on
                    open_notes.setdefault(payload[0], []).append(
                        (tick, payload[1]))
                elif st == 0x80 or (st == 0x90 and payload[1] == 0):
                    pitch = payload[0]
                    if open_notes.get(pitch):
                        t_on, vel = open_notes[pitch].pop(0)
                        inst.notes.append(MidiNote(
                            pitch=pitch, velocity=vel,
                            start=tick_to_sec(t_on), end=tick_to_sec(tick)))

        parse_track(raw, collect)
        if inst.notes:
            inst.notes.sort(key=lambda n: (n.start, n.pitch))
            mf.instruments.append(inst)
    return mf


def write_midi(path: str, mf: MidiFile, ticks_per_beat: int = 480,
               bpm: float = 120.0):
    uspb = int(round(6e7 / bpm))

    def sec_to_tick(s: float) -> int:
        return int(round(s * bpm / 60.0 * ticks_per_beat))

    chunks = []
    # tempo/conductor track
    t0 = b"".join([
        _varint(0), bytes([0xFF, 0x51, 0x03]), uspb.to_bytes(3, "big"),
        _varint(0), bytes([0xFF, 0x2F, 0x00]),
    ])
    chunks.append(t0)

    for ch, inst in enumerate(mf.instruments):
        channel = 9 if inst.is_drum else min(ch, 15)
        events: List[Tuple[int, int, bytes]] = []  # (tick, order, data)
        for n in inst.notes:
            on = sec_to_tick(n.start)
            off = sec_to_tick(max(n.end, n.start))
            vel = max(1, min(127, int(n.velocity)))
            events.append((on, 1, bytes([0x90 | channel, n.pitch & 0x7F, vel])))
            events.append((off, 0, bytes([0x80 | channel, n.pitch & 0x7F, 0])))
        events.sort()
        out = []
        if inst.name:
            name_b = inst.name.encode("latin-1", errors="replace")
            out += [_varint(0), bytes([0xFF, 0x03]), _varint(len(name_b)),
                    name_b]
        out += [_varint(0), bytes([0xC0 | channel, inst.program & 0x7F])]
        last = 0
        for tick, _, ev in events:
            out += [_varint(tick - last), ev]
            last = tick
        out += [_varint(0), bytes([0xFF, 0x2F, 0x00])]
        chunks.append(b"".join(out))

    with open(path, "wb") as f:
        f.write(b"MThd" + struct.pack(">IHHH", 6, 1, len(chunks),
                                      ticks_per_beat))
        for c in chunks:
            f.write(b"MTrk" + struct.pack(">I", len(c)) + c)
    return path
