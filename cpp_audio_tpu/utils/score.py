"""Score language: "do re mi fa sol la si" with accidentals and durations.

reference source/parse.music.cpp:1-167 + include/note.h:
  - note names (case-insensitive solfege), uppercase first letter = loud
  - suffix d/D/#/s = sharp, b/B/f = flat
  - '.' = extend the previous note by one unit, or a rest when no note is
    pending; '-' = extend (tie)
  - durations are counted in time units; NoteSpec{note|None, loud, duration}

`notespecs_to_notes` converts a parsed score into absolute-time Notes for the
voice-bank renderer (the reference converts to channel Requests via
`to_request`, note.h:10-40: sine at the well-tempered frequency, volume x2
when loud).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.events import Note as EvNote
from .midi import Midi, Note

_NOTE_NAMES = [("sol", Note.Sol), ("do", Note.Do), ("re", Note.Re),
               ("mi", Note.Mi), ("fa", Note.Fa), ("la", Note.La),
               ("si", Note.Si)]


@dataclass
class NoteSpec:
    note: Note | None  # None = silence
    loud: bool
    duration: int  # in time units


def _parse_note(token: str) -> Note | None:
    low = token.lower().replace("é", "e")
    for name, n in _NOTE_NAMES:
        if low.startswith(name):
            rest = low[len(name):]
            if not rest:
                return n
            if len(rest) > 1:
                return None
            if rest in ("d", "#", "s"):
                return Note((int(n) + 1) % 12)
            if rest in ("b", "f"):
                return Note((int(n) - 1) % 12)
            return None
    return None


def parse_music(score: str) -> list[NoteSpec]:
    """Parse a score string into NoteSpecs (reference parseMusic)."""
    specs: list[NoteSpec] = []
    cur_note: Note | None = None
    cur_loud = False
    cur_dur = 0

    def flush():
        nonlocal cur_note, cur_loud, cur_dur
        if cur_dur:
            specs.append(NoteSpec(cur_note, cur_loud, cur_dur))
        cur_note, cur_loud, cur_dur = None, False, 0

    pos = 0
    n = len(score)
    while pos < n:
        c = score[pos]
        if c == " ":
            pos += 1
        elif c == ".":
            if cur_note is not None:
                flush()
            cur_dur += 1
            pos += 1
        elif c == "-":
            cur_dur += 1
            pos += 1
        else:
            nxt = pos
            while nxt < n and score[nxt] not in " .-":
                nxt += 1
            flush()
            token = score[pos:nxt]
            pos = nxt
            note = _parse_note(token)
            if note is None:
                raise ValueError(f"unrecognized note: {token!r}")
            cur_note = note
            cur_loud = token[0].isupper()
            cur_dur = 1
    flush()
    return specs


def notespecs_to_notes(specs: list[NoteSpec], *, sample_rate: int = 44100,
                       time_unit_ms: float = 180.0, octave: int = 4,
                       velocity: float = 0.5, midi: Midi | None = None,
                       start_sample: int = 0) -> list[EvNote]:
    """Resolve a parsed score into absolute-time Notes.

    Frequency = well-tempered pitch of the note in `octave` (the reference
    plays the interval from La at the ref octave, note.h:28-32); loud notes
    get 2x velocity (note.h:33).
    """
    midi = midi or Midi()
    unit = int(0.5 + time_unit_ms * sample_rate / 1000.0)
    notes: list[EvNote] = []
    t = start_sample
    nid = 1
    for s in specs:
        dur = s.duration * unit
        if s.note is not None:
            interval = int(s.note) - int(Note.La) + 12 * (octave - 4)
            freq = float(midi.Ainterval_to_freq(interval))
            vel = velocity * (2.0 if s.loud else 1.0)
            notes.append(EvNote(nid, t, t + dur, freq, vel))
            nid += 1
        t += dur
    return notes


def notespecs_to_requests(specs: list[NoteSpec], *, sample_rate: int = 44100,
                          time_unit_ms: float = 180.0, octave: int = 4,
                          volume: float = 0.5, n_outs: int = 2,
                          midi: Midi | None = None):
    """Resolve a parsed score into channel `Request`s (reference `to_request`,
    note.h:10-40): a looping sine table at the note's well-tempered frequency
    (loud = 2x volume), or a silence request for rests, each lasting the
    spec's duration — ready to `Channels.play` with crossfade splices."""
    import numpy as np

    from ..core.channels import Request, silence

    midi = midi or Midi()
    unit = int(0.5 + time_unit_ms * sample_rate / 1000.0)
    reqs = []
    for s in specs:
        dur = max(1, s.duration * unit)
        if s.note is None:
            reqs.append(silence(dur))
            continue
        interval = int(s.note) - int(Note.La) + 12 * (octave - 4)
        freq = float(midi.Ainterval_to_freq(interval))
        # one-period sine table, like the reference's periodic soundBuffer
        period = max(2, int(0.5 + sample_rate / freq))
        t = np.arange(period)
        buf = np.sin(2.0 * np.pi * t / period)
        vol = volume * (2.0 if s.loud else 1.0)
        reqs.append(Request.make(buf, vol, dur, n_outs=n_outs))
    return reqs
