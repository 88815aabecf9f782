"""Hand-computed golden cases for the trickiest ported semantics
(VERDICT round-1 item 5). Every case documents the reference lines it
hand-evaluates; the expected values are derived by reading the C++, not by
running this repo's code, so a shared misreading would trip them.

Provenance per section:
 - Envelope counters: AHDSREnvelopeBase::stepPressed increments ahdCounter
   BEFORE interpolating (include/audioelement.h:960-999: `stepAHD();
   ++ahdCounter;` then itp(ahdCounter/maxCounter)), so attack sample k
   (k=0-based) has value ease((k+1)/A); release sample k has
   top*(1-ease((k+1)/R)) with top = envelope value at release-1
   (audioelement.h:732-742,836-841); release at/before press skips the note
   (audioelement.h:774-777); no decay phase when sustain > 0.999999
   (setAHDSR, audioelement.h:928-945).
 - Channel xfade seams: equal-gain linear crossfade, increment
   1/(size_xfade-1) (include/channel.h:235-238), odd size >= 3
   (channel.h:50-60), so a size-5 seam walks gains 1, .75, .5, .25, 0
   against 0, .25, .5, .75, 1.
 - Tracker event policy: synthesize_sounds (source/rt.resynth.lib.cpp:
   265-382): note-offs for non-continued voices first, then changes/ons in
   PERCEIVED-LOUDNESS order (ISO-226 60-phon weights w = volume/spl,
   rt.resynth.lib.algo.cpp:375-411); ons beyond max_voices are dropped and
   counted (gen.crtp.h:625-628).
 - SoundEngine program fingerprints: all 27 programs of gen.voice.h:700-810
   pinned by 12-band spectral energies (deterministic seed).
"""

import numpy as np
import pytest

from cpp_audio_tpu.ops import envelopes
from cpp_audio_tpu.utils.interp import Itp


class TestEnvelopeCounterGoldens:
    """audioelement.h:960-999 counter semantics, hand-evaluated."""

    def _env(self, t, **kw):
        import jax.numpy as jnp

        params = envelopes.AHDSR(
            attack=kw.get("A", 4), hold=kw.get("H", 0),
            decay=kw.get("D", 4), release=kw.get("R", 5),
            sustain=kw.get("S", 0.5),
            attack_itp=int(Itp.LINEAR), decay_itp=int(Itp.LINEAR),
            release_itp=int(Itp.LINEAR))
        return np.asarray(envelopes.ahdsr_envelope(
            jnp.asarray(t, jnp.float64), params,
            press=kw.get("press", 0), release=kw.get("release", envelopes.NEVER),
            dtype=jnp.float64))

    def test_full_ahdsr_hand_computed(self):
        # A=4 H=2 D=4 S=.5 R=5, press=10, release=22 (in sustain).
        # attack samples 10..13: (k+1)/4; hold 14..15: 1; decay 16..19:
        # 1-.5*(k+1)/4; sustain 20..21: .5; release 22..26: .5*(1-(k+1)/5).
        t = np.arange(30)
        got = self._env(t, A=4, H=2, D=4, S=0.5, R=5, press=10, release=22)
        want = np.zeros(30)
        want[10:14] = [0.25, 0.5, 0.75, 1.0]
        want[14:16] = 1.0
        want[16:20] = [0.875, 0.75, 0.625, 0.5]
        want[20:22] = 0.5
        want[22:27] = [0.4, 0.3, 0.2, 0.1, 0.0]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_release_mid_attack_top(self):
        # release at press+2: top = value of attack sample 1 = 2/4 = 0.5
        # (audioelement.h:836-841: release interpolates from the envelope
        # value at the sample before the release)
        got = self._env(np.arange(12), A=4, S=1.0, R=5, press=0, release=2)
        want = np.zeros(12)
        want[0:2] = [0.25, 0.5]
        want[2:7] = 0.5 * (1.0 - (np.arange(5) + 1.0) / 5.0)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_release_at_press_skips_note(self):
        # audioelement.h:774-777: pressed and released in the same step ->
        # the note never sounds
        got = self._env(np.arange(10), press=3, release=3)
        np.testing.assert_allclose(got, 0.0)

    def test_sustain_one_skips_decay(self):
        # setAHDSR (audioelement.h:928-945): sustain > 0.999999 -> no decay
        # phase; envelope holds at 1 until release
        got = self._env(np.arange(20), A=4, D=4, S=1.0, press=0,
                        release=envelopes.NEVER)
        np.testing.assert_allclose(got[4:], 1.0, atol=1e-12)

    def test_zero_length_release_floors_to_one(self):
        # getReleaseTime floors R at >= 1 sample: a "0-length" release still
        # takes one step down, value top*(1-1/1)=0 at the release sample
        got = self._env(np.arange(10), A=1, S=1.0, R=0, press=0, release=5)
        assert got[4] == 1.0
        np.testing.assert_allclose(got[5:], 0.0, atol=1e-12)


class TestChannelXfadeGolden:
    """channel.h:235-238 xfade ladder: increment 1/(size-1)."""

    def test_size5_gain_ladder(self):
        from cpp_audio_tpu.ops.crossfade import xfade_weights

        w_new, w_old = xfade_weights(5, "linear", inclusive=True)
        np.testing.assert_allclose(w_old, [1.0, 0.75, 0.5, 0.25, 0.0])
        np.testing.assert_allclose(w_new, [0.0, 0.25, 0.5, 0.75, 1.0])

    def test_channel_seam_constant_requests(self):
        """Two constant-valued requests through a Channel: the seam must walk
        the hand-computed equal-gain ladder (channel.h:410-470 writers)."""
        from cpp_audio_tpu.core.channels import Channel, Request

        ch = Channel(n_outs=1, xfade_length=5)
        ch.play(Request.make(np.full(40, 1.0), length=40, n_outs=1),
                Request.make(np.full(40, -1.0), length=40, n_outs=1))
        out = np.concatenate([ch.step(20) for _ in range(4)], axis=0)[:, 0]
        # before the seam: 1; after: -1; the 5-sample seam mixes
        # 1*w_old + (-1)*w_new = [1, .5, 0, -.5, -1]
        seam = None
        for i in range(len(out) - 5):
            if out[i] == 1.0 and out[i + 4] == -1.0 and out[i + 2] == 0.0:
                seam = out[i : i + 5]
                break
        assert seam is not None, out[:45]
        np.testing.assert_allclose(seam, [1.0, 0.5, 0.0, -0.5, -1.0],
                                   atol=1e-9)


class TestTrackerEventPolicyGolden:
    """synthesize_sounds policy (rt.resynth.lib.cpp:265-382), hand-traced."""

    def _tracker(self, **kw):
        from cpp_audio_tpu.analysis.resynth import PitchTracker, ResynthConfig

        cfg = ResynthConfig(sample_rate=44100, min_volume=0.01,
                            analysis_volume=1.0, **kw)
        return PitchTracker(cfg)

    def test_on_change_off_sequence(self):
        tr = self._tracker()
        # frame 0: two clean tones -> 2 NoteOn
        st0 = tr.step([(440.0, -20.0), (660.0, -26.0)])
        assert (st0.note_on, st0.note_change, st0.note_off) == (2, 0, 0)
        # frame 1: 440 drifts to 445 (within max_track_pitches = 1 halftone
        # -> NoteChange), 660 vanishes (-> NoteOff), 880 appears (-> NoteOn)
        st1 = tr.step([(445.0, -20.0), (880.0, -23.0)])
        assert (st1.note_on, st1.note_change, st1.note_off) == (1, 1, 1)
        # frame 2: silence -> remaining 2 voices off
        st2 = tr.step([])
        assert (st2.note_on, st2.note_change, st2.note_off) == (0, 0, 2)

    def test_voice_cap_drops_quietest(self):
        """With max_voices=2 and three candidates, ons are granted in
        perceived-loudness order; the least loud is dropped and counted
        (rt.resynth.lib.cpp:328-339 + gen.crtp.h:625-628)."""
        tr = self._tracker(max_voices=2)
        st = tr.step([(300.0, -20.0), (500.0, -21.0), (700.0, -40.0)])
        assert st.note_on == 2
        assert st.dropped == 1
        assert tr.dropped_note_on == 1
        # the two loudest (300, 500) are playing
        freqs = sorted(round(n.cur_freq) for n in tr.played)
        assert freqs == [300, 500]

    def test_loudness_order_prefers_iso226_weight(self):
        """Equal linear volume at 60 Hz vs 1 kHz: the 1 kHz peak has the
        larger perceived weight w = vol/spl (ISO-226 60-phon,
        rt.resynth.lib.algo.cpp:375-411) and wins the single slot."""
        tr = self._tracker(max_voices=1)
        st = tr.step([(60.0, -20.0), (1000.0, -20.0)])
        assert st.note_on == 1 and st.dropped == 1
        assert round(tr.played[0].cur_freq) == 1000

    def test_change_tracks_nearest_within_limit(self):
        """track_pitches matches monotonically within max_track_pitches
        halftones (rt.resynth.lib.algo.cpp:256-305): a 2-halftone jump is a
        new note, not a change."""
        tr = self._tracker(max_track_pitches=1.0)
        tr.step([(440.0, -20.0)])
        st = tr.step([(495.0, -20.0)])  # ~+2 halftones
        assert (st.note_on, st.note_off) == (1, 1)
        assert st.note_change == 0


def band_fingerprint(mono: np.ndarray, sr: int = 44100, n_bands: int = 12):
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(len(mono), 1 / sr)
    edges = np.logspace(np.log10(40), np.log10(16000), n_bands + 1)
    out = []
    for i in range(n_bands):
        sel = (freqs >= edges[i]) & (freqs < edges[i + 1])
        out.append(10 * np.log10(max(spec[sel].sum(), 1e-20)))
    return np.array(out)


# 12-band dB fingerprints of every gen.voice.h:700-810 program (1 s render,
# seed 32, 440 Hz, pan 0). Regenerate by printing band_fingerprint after an
# INTENTIONAL semantic change. 'Small animal eating' is pinned through the
# app-path master limiter (its raw render is a deliberately unstable
# width-modulated compensated band-pass; the reference tames it with the
# master limiter+clamp, out.h:605-648).
FINGERPRINTS = {
    # (regenerated when the period-tracked loudness-volume smoothing landed —
    # render oracled at -95 dB vs the compiled reference engine,
    # tests/test_reference_oracle.py::TestSoundEngineWaveformOracle)
    ("birds", "Standard & Cute bird"): [-40.55, -39.05, -36.45, -33.29, -29.36, -21.61, 39.06, 56.86, -17.68, -36.60, -47.19, -54.36],
    ("birds", "Scat bird"): [-24.94, -21.55, -20.23, -15.92, -10.89, 4.72, 55.99, 57.29, -4.47, -23.21, -34.07, -41.49],
    ("birds", "Rhythmic bird"): [-21.05, -22.16, -17.48, -14.79, -8.07, 9.90, 49.43, 55.10, -1.39, -19.77, -30.25, -37.22],
    ("birds", "Slow bird"): [-41.94, -41.19, -38.24, -35.12, -31.86, -24.86, 8.94, 53.64, -19.99, -37.89, -47.20, -53.51],
    ("birds", "BiTone bird"): [-37.09, -34.56, -31.90, -28.20, -21.30, 2.93, 54.72, 56.86, -19.67, -36.29, -45.34, -51.56],
    ("birds", "Happy bird 1"): [-3.41, -1.12, 1.33, 4.41, 8.76, 17.33, 55.00, 56.57, 13.39, 10.27, 8.02, 6.49],
    ("birds", "Happy bird 2"): [-3.99, -1.80, 0.34, 2.61, 4.99, 8.19, 55.50, 53.40, 20.98, 4.51, -3.40, -9.68],
    ("birds", "Laughing bird"): [-0.77, 1.48, 3.63, 5.94, 8.51, 12.42, 54.72, 54.26, 16.30, 8.67, 4.91, 2.81],
    ("birds", "Talkative bird"): [-0.12, 2.09, 4.31, 6.75, 9.53, 13.18, 55.97, 55.82, 15.83, 10.21, 7.17, 5.36],
    ("robots", "R2D2"): [-8.12, -5.22, 5.35, 9.00, 54.22, 50.19, 4.85, -10.07, -18.39, -25.84, -32.17, -37.33],
    ("robots", "Communication"): [9.63, 12.07, 16.32, 22.37, 58.53, 56.51, 22.58, 17.68, 14.93, 12.63, 10.66, 9.22],
    ("sweep", "Sweep 1"): [84.29, 79.80, 68.17, 49.20, 43.67, 40.61, 38.13, 35.87, 33.70, 31.62, 29.72, 28.31],
    ("sweep", "Fullrange"): [44.04, 41.84, 39.60, 37.46, 35.28, 33.11, 30.94, 28.78, 26.65, 24.58, 22.69, 21.28],
("wind", "Medium wind in trees"): [50.92, 50.50, 55.22, 59.11, 60.75, 61.31, 60.44, 58.62, 55.21, 51.37, 47.44, 43.86],
("wind", "Steady wind"): [31.44, 41.63, 53.89, 60.36, 62.63, 61.00, 55.12, 45.42, 31.59, 15.89, 1.79, -3.72],
("wind", "Strong wind"): [63.61, 62.82, 66.14, 67.81, 68.04, 68.11, 67.90, 67.56, 66.15, 64.07, 61.23, 57.61],
("wind", "Vinyl cracks"): [-2.12, 0.76, 4.02, 7.47, 13.44, 28.72, 43.40, 50.92, 53.89, 54.30, 53.38, 51.13],
("wind", "Small animal eating"): [-1.05, -1.37, 1.02, 3.82, 4.69, 9.55, 18.38, 23.85, 31.94, 32.99, 31.43, 27.52],
("wind", "Heavy rain in a car"): [21.67, 22.17, 25.40, 28.45, 37.47, 51.76, 58.58, 62.05, 62.89, 62.99, 62.54, 61.51],
("wind", "Light rain in a car"): [8.05, 11.07, 13.76, 16.86, 20.03, 30.97, 44.66, 51.87, 54.36, 54.98, 54.31, 52.49],
("wind", "Heavy rain"): [25.96, 38.58, 55.02, 62.48, 65.70, 67.05, 67.50, 67.82, 67.49, 67.33, 67.22, 67.20],
("wind", "Light rain"): [21.25, 21.78, 25.55, 31.67, 46.27, 57.69, 62.83, 65.02, 65.42, 65.35, 64.88, 63.95],
("wind", "Bubbles"): [-34.36, -28.18, -8.85, 14.70, 22.07, 21.17, 17.59, 12.41, 3.74, -4.47, -16.72, -29.43],
("wind", "Earth rumbling"): [61.43, 57.62, 51.96, 38.56, 8.68, 1.43, -1.45, -3.88, -6.11, -8.21, -10.13, -11.53],
("wind", "Sine wind"): [-18.80, -16.59, -14.39, -11.91, -8.85, 33.10, 35.82, -4.06, -15.47, -23.04, -29.62, -35.26],
("wind", "Kettle whistle pure"): [-20.19, -18.37, -16.12, -11.28, -5.40, -0.87, 7.03, 36.17, 18.30, -11.13, -17.73, -20.14],
("wind", "Kettle whistle mixed"): [-13.69, -11.54, -9.25, -6.62, 3.69, 25.67, 40.90, 53.29, 49.93, 35.96, 19.04, 2.46],
}


@pytest.mark.parametrize("mode,name", sorted(FINGERPRINTS))
def test_program_fingerprint(mode, name):
    from cpp_audio_tpu.models import soundengine, voice_presets, wind

    if (mode, name) == ("wind", "Small animal eating"):
        from cpp_audio_tpu.apps import birds

        out = birds.render("wind", name, 1.0, seed=32)
        tol = 3.0
    elif mode == "wind":
        p = voice_presets.get_program(voice_presets.Mode.WIND, name)
        out = wind.render_program(p, 44100, 44100, seed=32)
        tol = 1.5
    else:
        p = voice_presets.get_program(voice_presets.Mode(mode), name)
        out = soundengine.render_program(p, 440.0, 44100, 44100, seed=32,
                                         pan=0.0, dtype="float64")
        tol = 1.5
    fp = band_fingerprint(np.asarray(out).sum(axis=1))
    np.testing.assert_allclose(fp, FINGERPRINTS[(mode, name)], atol=tol)


def test_all_27_programs_covered():
    from cpp_audio_tpu.models import voice_presets

    count = sum(len(v) for v in voice_presets.PROGRAMS.values())
    assert count == 27
    assert len(FINGERPRINTS) == count
