"""Note-level end-to-end comparison of two resynthesis runs.

VERDICT r4 weak #3: the raw sample-level end-to-end TPU-vs-host comparison is
dominated by noise-floor local-maxima churn that no implementation controls
(the reference itself churns identically across machines), so bench.py's
e2e row needs an AFFIRMATIVE metric that scores what the pipeline is FOR:
which notes sound, at what pitch, how loud. This module compares the two
runs' slot control tables (models/resynth_bank.py layout, the exact data the
renderer consumes) at note level:

  - notes are extracted per slot as maximal active runs, split on
    discontinuous frequency jumps (slot reuse);
  - notes match across runs by onset time and log-frequency proximity —
    slot numbering and draw pools never enter, so the metric is invariant
    to packing order;
  - scores: volume-weighted note F1 (does the audible note set match),
    matched-note frequency RMS in cents, and matched-note volume RMS in dB.

Stated bars (bench.py `note_e2e_pass`): weighted F1 >= 0.98, freq RMS <=
1.0 cent, volume RMS <= 0.25 dB. Loud notes dominate every score by
volume weighting, matching how the render's RMS is dominated.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# field order of models/resynth_bank.py slot tables
_F_INC, _F_VTGT, _F_VB = 0, 3, 4


@dataclass
class Note:
    f0: int                 # first active frame
    freqs: np.ndarray       # (len,) Hz per frame
    vols: np.ndarray        # (len,) volume target per frame

    @property
    def peak_vol(self) -> float:
        return float(self.vols.max(initial=0.0))

    @property
    def ref_freq(self) -> float:
        """Volume-weighted mean frequency."""
        w = self.vols + 1e-30
        return float((self.freqs * w).sum() / w.sum())


def extract_notes(table, sample_rate: float, *, vol_floor: float = 1e-7,
                  split_ratio: float = 1.06) -> list[Note]:
    """(frames, slots, >=5) table -> notes. A note is a maximal per-slot run
    of frames with volume above `vol_floor`, split where the frequency jumps
    by more than `split_ratio` between consecutive frames (slot reuse)."""
    t = np.asarray(table, np.float64)
    freqs = t[:, :, _F_INC] * (sample_rate / 2.0)
    vols = np.maximum(np.abs(t[:, :, _F_VTGT]), np.abs(t[:, :, _F_VB]))
    notes = []
    F, P = vols.shape
    for p in range(P):
        v = vols[:, p]
        f = freqs[:, p]
        active = v > vol_floor
        idx = np.flatnonzero(np.diff(np.concatenate(
            [[False], active, [False]]).astype(np.int8)))
        for a, b in zip(idx[::2], idx[1::2]):
            # split on freq discontinuities within the run
            start = a
            for i in range(a + 1, b):
                r = max(f[i], 1e-9) / max(f[i - 1], 1e-9)
                if r > split_ratio or r < 1.0 / split_ratio:
                    notes.append(Note(start, f[start:i].copy(),
                                      v[start:i].copy()))
                    start = i
            notes.append(Note(start, f[start:b].copy(), v[start:b].copy()))
    return notes


def match_notes(a: list[Note], b: list[Note], *, onset_tol: int = 2,
                freq_tol_ratio: float = 1.01):
    """Greedy volume-descending matching: a-note matches the nearest unused
    b-note with |onset difference| <= onset_tol frames and reference
    frequency within freq_tol_ratio. Returns list of (i, j) index pairs."""
    order = np.argsort([-n.peak_vol for n in a])
    used = np.zeros(len(b), bool)
    b_on = np.array([n.f0 for n in b]) if b else np.zeros(0)
    b_fr = np.array([n.ref_freq for n in b]) if b else np.zeros(0)
    pairs = []
    for i in order:
        n = a[i]
        if not len(b):
            break
        cand = np.flatnonzero(
            (~used) & (np.abs(b_on - n.f0) <= onset_tol)
            & (np.maximum(b_fr, 1e-9) / max(n.ref_freq, 1e-9)
               < freq_tol_ratio)
            & (max(n.ref_freq, 1e-9) / np.maximum(b_fr, 1e-9)
               < freq_tol_ratio))
        if len(cand) == 0:
            continue
        j = cand[np.argmin(np.abs(np.log(np.maximum(b_fr[cand], 1e-9))
                                  - np.log(max(n.ref_freq, 1e-9))))]
        used[j] = True
        pairs.append((int(i), int(j)))
    return pairs


def note_level_metrics(table_a, table_b, sample_rate: float, *,
                       vol_floor: float = 1e-7) -> dict:
    """Compare two runs' slot tables at note level (a = candidate, b = ref).

    Returns {n_notes_a, n_notes_b, f1, f1_weighted, freq_rms_cents,
    vol_rms_db, matched_frac_weighted}.
    """
    na = extract_notes(table_a, sample_rate, vol_floor=vol_floor)
    nb = extract_notes(table_b, sample_rate, vol_floor=vol_floor)
    pairs = match_notes(na, nb)
    wa = np.array([n.peak_vol for n in na]) if na else np.zeros(0)
    wb = np.array([n.peak_vol for n in nb]) if nb else np.zeros(0)
    m = len(pairs)
    prec = m / max(len(na), 1)
    rec = m / max(len(nb), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-30)
    wm_a = sum(wa[i] for i, _ in pairs)
    wm_b = sum(wb[j] for _, j in pairs)
    wprec = wm_a / max(wa.sum(), 1e-30)
    wrec = wm_b / max(wb.sum(), 1e-30)
    f1w = 2 * wprec * wrec / max(wprec + wrec, 1e-30)

    cents_sq, vol_sq, wsum = 0.0, 0.0, 0.0
    for i, j in pairs:
        x, y = na[i], nb[j]
        L = min(len(x.freqs), len(y.freqs))
        shift = x.f0 - y.f0
        # align on the common frame range
        xs = x.freqs[:L]
        ys = y.freqs[:L]
        xv = x.vols[:L]
        yv = y.vols[:L]
        w = np.maximum(xv, yv) + 1e-30
        cents = 1200.0 * np.log2(np.maximum(xs, 1e-9)
                                 / np.maximum(ys, 1e-9))
        voldb = 20.0 * np.log10(np.maximum(xv, 1e-12)
                                / np.maximum(yv, 1e-12))
        cents_sq += float((w * cents ** 2).sum())
        vol_sq += float((w * voldb ** 2).sum())
        wsum += float(w.sum())
        del shift
    return {
        "n_notes_a": len(na), "n_notes_b": len(nb), "n_matched": m,
        "f1": round(f1, 4), "f1_weighted": round(f1w, 5),
        "freq_rms_cents": round(float(np.sqrt(cents_sq / max(wsum, 1e-30))),
                                5),
        "vol_rms_db": round(float(np.sqrt(vol_sq / max(wsum, 1e-30))), 5),
    }
