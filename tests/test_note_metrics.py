"""Note-level e2e metric (tools/note_metrics.py) + the slot-table plumbing
behind bench.py's affirmative e2e row (VERDICT r4 weak #3)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import note_metrics  # noqa: E402

from cpp_audio_tpu.models import resynth_bank  # noqa: E402

SR = 44100


def _table(notes, n_frames, n_slots=8):
    """Build a minimal (frames, slots, 16) table: notes = list of
    (slot, f0, length, freq, vol)."""
    t = np.zeros((n_frames, n_slots, 16))
    for slot, f0, length, freq, vol in notes:
        t[f0:f0 + length, slot, 0] = 2.0 * freq / SR   # _F_INC
        t[f0:f0 + length, slot, 3] = vol               # _F_VTGT
    return t


class TestExtractNotes:
    def test_runs_and_slot_reuse_split(self):
        t = _table([(0, 2, 5, 440.0, 0.5), (0, 7, 4, 880.0, 0.3),
                    (1, 0, 3, 220.0, 0.2)], 16)
        notes = note_metrics.extract_notes(t, SR)
        assert len(notes) == 3
        by_onset = sorted(notes, key=lambda n: (n.f0, n.ref_freq))
        assert [n.f0 for n in by_onset] == [0, 2, 7]
        assert abs(by_onset[1].ref_freq - 440.0) < 1e-9
        # adjacent reuse without a gap splits on the freq jump
        t2 = _table([(0, 2, 5, 440.0, 0.5)], 16)
        t2[7:10, 0, 0] = 2.0 * 880.0 / SR
        t2[7:10, 0, 3] = 0.4
        notes2 = note_metrics.extract_notes(t2, SR)
        assert len(notes2) == 2
        assert {round(n.ref_freq) for n in notes2} == {440, 880}

    def test_glide_not_split(self):
        t = np.zeros((20, 2, 16))
        f = np.linspace(440.0, 460.0, 10)  # 0.5%/frame glide
        t[5:15, 0, 0] = 2.0 * f / SR
        t[5:15, 0, 3] = 0.5
        notes = note_metrics.extract_notes(t, SR)
        assert len(notes) == 1
        assert len(notes[0].freqs) == 10


class TestMetrics:
    def test_identical_tables_perfect_score(self):
        t = _table([(0, 2, 5, 440.0, 0.5), (1, 3, 6, 660.0, 0.4),
                    (2, 9, 4, 111.0, 0.01)], 20)
        m = note_metrics.note_level_metrics(t, t, SR)
        assert m["f1"] == 1.0 and m["f1_weighted"] == 1.0
        assert m["freq_rms_cents"] == 0.0 and m["vol_rms_db"] == 0.0

    def test_slot_permutation_invariant(self):
        a = _table([(0, 2, 5, 440.0, 0.5), (1, 3, 6, 660.0, 0.4)], 20)
        b = _table([(4, 2, 5, 440.0, 0.5), (2, 3, 6, 660.0, 0.4)], 20)
        m = note_metrics.note_level_metrics(a, b, SR)
        assert m["f1_weighted"] == 1.0

    def test_missing_weak_note_weighted_f1(self):
        ref = _table([(0, 2, 8, 440.0, 0.5), (1, 4, 6, 3333.0, 0.001)], 20)
        cand = _table([(0, 2, 8, 440.0, 0.5)], 20)
        m = note_metrics.note_level_metrics(cand, ref, SR)
        assert m["f1"] < 1.0                      # plain F1 sees the miss
        assert m["f1_weighted"] > 0.995           # weighted barely moves

    def test_detuned_match_scores_cents(self):
        ref = _table([(0, 2, 8, 440.0, 0.5)], 20)
        cand = _table([(3, 2, 8, 440.0 * 2 ** (0.5 / 1200), 0.5)], 20)
        m = note_metrics.note_level_metrics(cand, ref, SR)
        assert m["f1"] == 1.0
        assert abs(m["freq_rms_cents"] - 0.5) < 0.01

    def test_empty_tables(self):
        z = np.zeros((10, 4, 16))
        m = note_metrics.note_level_metrics(z, z, SR)
        assert m["n_notes_a"] == 0 and m["n_matched"] == 0


class TestTablePlumbing:
    def test_host_table_native_vs_python_trackers(self):
        """host_chain_table with the native C++ tracker vs the python
        tracker route: same workload -> note-identical slot tables under
        the metric (validates table extraction + metric integration; the
        df32 device table feeds the same comparison on TPU via bench.py's
        note_* rows — executing the df32 chain on XLA-CPU costs ~45 min of
        compile, see tests/test_bench_smoke.py)."""
        from cpp_audio_tpu import native as nat
        from cpp_audio_tpu.analysis import chain, resynth, vocoder
        from cpp_audio_tpu.core import events, voices
        from cpp_audio_tpu.models import sine_synth
        from cpp_audio_tpu.ops import envelopes

        if not nat.available():
            import pytest

            pytest.skip("native library unavailable")
        sr = SR
        n = sr
        rng = np.random.default_rng(3)
        notes = []
        for i in range(6):
            p0 = int(rng.uniform(0, n * 0.4))
            notes.append(events.Note(
                i, p0, p0 + int(rng.uniform(sr // 4, n // 2)),
                float(rng.uniform(110, 1760)), float(rng.uniform(0.3, 1.0)),
                float(rng.uniform(-1, 1))))
        sch = voices.schedule_from_notes(notes, pad_to=6)
        cfg = sine_synth.SineSynthConfig(
            sample_rate=sr,
            ahdsr=envelopes.AHDSR(attack=441, hold=100, decay=2000,
                                  release=8820, sustain=0.7),
            block_size=1 << 14, dtype="float32")
        bank = sine_synth.bank_from_schedule(sch, cfg)
        vparams = vocoder.VocoderParams(sample_rate=sr)
        carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))
        h64 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                    dtype="float64")
        t_native = chain.host_chain_table(bank, n, h64, vparams, carrier,
                                          block_size=cfg.block_size)
        # python tracker route (same peaks, prefer_native=False inside)
        h64b = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                     dtype="float64", draw_indexing="stable")
        t_python = chain.host_chain_table(bank, n, h64b, vparams, carrier,
                                          block_size=cfg.block_size)
        m = note_metrics.note_level_metrics(t_native, t_python, sr)
        assert m["n_matched"] > 0
        assert m["f1_weighted"] >= 0.98
        assert m["freq_rms_cents"] <= 1.0
        assert m["vol_rms_db"] <= 0.25
