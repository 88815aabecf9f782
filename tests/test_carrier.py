"""MIDI-playable vocoder carrier synth (models/carrier.py) tests.

The scalar reference below hand-steps the reference element stack
(rt.resynth.lib.cpp:21-52): per sample, InterpolatedFreq advances the
increment (include/audioelement.h:2706-2817 closed exponential form), the
shared phase accumulates, each oscillator evaluates at that phase, the
UnityGainMix weights by the per-osc volumes, and the AHDSR envelope gates.
"""

import numpy as np
import pytest

from cpp_audio_tpu.core import events
from cpp_audio_tpu.models.carrier import (CarrierOscMix, CarrierSynth,
                                          CarrierSynthConfig)
from cpp_audio_tpu.ops import envelopes, noise as noise_ops
from cpp_audio_tpu.utils.interp import Itp, ease_np


def scalar_carrier_voice(n, *, sample_rate, press, release, velocity,
                         segments, osc: CarrierOscMix, ahdsr,
                         start_phase, noise_start, glide=100):
    """Per-sample scalar render of one carrier voice.

    segments: list of (t_change, freq) with the first at t=press (NoteOn) —
    each later entry starts a glide from the last EMITTED increment to the
    new one over `glide` samples. The glide is a direct per-sample port of
    InterpolatedFreq::step (include/audioelement.h:2746-2787): progress
    advances by C*f(cur+0.5) with the value LINEAR in progress, clamping
    when cur_sample+0.5 > duration.
    """
    sr = sample_rate
    table = noise_ops.white_noise_table(int(0.05 * sr))
    N = len(table)

    inc_of = lambda f: 2.0 * f / sr
    # envelope params with reference floors (1 ms + 2.5 periods)
    inc_final = inc_of(segments[0][1])
    mc = np.floor(0.5 + 2.5 * 2.0 / abs(inc_final))  # int(0.5 + 2.5*period)
    A = max(float(np.max(np.asarray(ahdsr.attack))), mc, 1.0)
    R = max(float(np.max(np.asarray(ahdsr.release))), mc, 1.0)
    sus = float(np.asarray(ahdsr.sustain))
    H = float(np.max(np.asarray(ahdsr.hold)))
    D = (max(float(np.max(np.asarray(ahdsr.decay))), mc, 1.0)
         if sus < 0.999999 else 0.0)

    def env_at(t):
        tp = t - press
        if tp < 0 or release <= press:
            return 0.0
        def pressed(x):
            if x < A:
                return ease_np(Itp.LINEAR, (x + 1.0) / A)
            if x < A + H:
                return 1.0
            if x < A + H + D:
                return 1.0 + (sus - 1.0) * ease_np(
                    Itp.LINEAR, (x - A - H + 1.0) / max(D, 1.0))
            return sus if D else 1.0
        if t < release:
            return pressed(tp)
        k = t - release + 1.0
        if k < R:
            return pressed(release - 1.0 - press) * (
                1.0 - ease_np(Itp.LINEAR, k / R))
        return 0.0

    high = 0.5 * (2.0 - osc.pulse_width)
    low = high - 1.0

    out = np.zeros(n)
    phase = start_phase % 2.0
    cur_inc = inc_of(segments[0][1])
    gfrom = gto = cur_inc
    cur_sample, C = 0.0, 0.0
    seg_i = 1
    for t in range(press, n):
        if seg_i < len(segments) and t == segments[seg_i][0]:
            gfrom = cur_inc                 # from = *f_result
            gto = inc_of(segments[seg_i][1])
            cur_sample = 0.0
            C = 1.0 if gto == gfrom else -np.log(gfrom / gto) / (gto - gfrom)
            seg_i += 1
        # InterpolatedFreq::step (audioelement.h:2765-2787)
        if cur_inc != gto:
            if cur_sample + 0.5 > glide:
                cur_sample = glide
            cur_inc = gfrom + (gto - gfrom) * cur_sample / glide
            if cur_sample < glide:
                f_mid = gfrom + (gto - gfrom) * (cur_sample + 0.5) / glide
                cur_sample += C * f_mid
        phase = (phase + cur_inc) % 2.0
        ph = phase
        w = (osc.sine * np.sin(np.pi * ph)
             + osc.saw * (ph if ph <= 1.0 else ph - 2.0)
             + osc.triangle * (2 * ph if ph < 0.5 else
                               (2 - 2 * ph if ph < 1.5 else -4 + 2 * ph))
             + osc.square * (-1.0 if 0.5 < ph < 1.5 else 1.0)
             + osc.pulse * (high if ph < osc.pulse_width else low)
             + osc.noise * table[(noise_start + (t - press)) % N])
        out[t] = velocity * env_at(t) * w
    return out


class TestCarrierKernel:
    def test_scalar_parity_steady(self):
        """Constant-frequency voice matches the per-sample scalar model."""
        sr = 44100
        osc = CarrierOscMix(noise=0.15, saw=0.3, triangle=0.2, square=0.1,
                            sine=0.25, pulse=0.2, pulse_width=0.3)
        cfg = CarrierSynthConfig(sample_rate=sr, osc=osc, seed=3,
                                 dtype="float64")
        s = CarrierSynth(cfg)
        s.on_event(events.Event(events.EventType.NOTE_ON, 50, 1, 440.0, 0.7))
        v = s._notes[1]
        n = 6000
        s.on_event(events.mk_note_off(4000, 1))
        got = s.compute(0, n)
        want = scalar_carrier_voice(
            n, sample_rate=sr, press=50, release=4000.0, velocity=0.7,
            segments=[(50, 440.0)], osc=osc, ahdsr=cfg.ahdsr,
            start_phase=v.phase_ref, noise_start=v.noise_start)
        assert np.abs(got - want).max() < 1e-8

    def test_scalar_parity_glide(self):
        """A NoteChange glides over 100 samples exactly like the scalar
        InterpolatedFreq closed form."""
        sr = 44100
        osc = CarrierOscMix(sine=1.0)
        cfg = CarrierSynthConfig(sample_rate=sr, osc=osc, dtype="float64")
        s = CarrierSynth(cfg)
        s.on_event(events.Event(events.EventType.NOTE_ON, 0, 1, 300.0, 1.0))
        v = s._notes[1]
        ph0, ns = v.phase_ref, v.noise_start
        a = s.compute(0, 2000)
        s.on_event(events.mk_note_change(2000, 1, 450.0, 1.0))
        b = s.compute(2000, 2000)
        got = np.concatenate([a, b])
        want = scalar_carrier_voice(
            4000, sample_rate=sr, press=0, release=float(2**62), velocity=1.0,
            segments=[(0, 300.0), (2000, 450.0)], osc=osc, ahdsr=cfg.ahdsr,
            start_phase=ph0, noise_start=ns)
        assert np.abs(got - want).max() < 1e-8

    def test_block_split_invariance(self):
        """Rendering in blocks of any size gives identical samples."""
        sr = 44100
        cfg = CarrierSynthConfig(
            sample_rate=sr, osc=CarrierOscMix(saw=0.5, noise=0.3), seed=1)
        s1 = CarrierSynth(cfg)
        s2 = CarrierSynth(cfg)
        for s in (s1, s2):
            s.on_event(events.Event(events.EventType.NOTE_ON, 10, 1, 220.0, 0.9))
            s.on_event(events.Event(events.EventType.NOTE_ON, 700, 2, 330.0, 0.4))
            s.on_event(events.mk_note_off(3000, 2))
        whole = s1.compute(0, 4096)
        parts = np.concatenate(
            [s2.compute(t, c) for t, c in ((0, 1000), (1000, 96), (1096, 3000))])
        np.testing.assert_allclose(whole, parts, atol=1e-6)

    def test_polyphony_limit_drops(self):
        """Reference channel-occupancy policy: 2*n_voices channels
        (gen.crtp.h:221-225), dropped only when every channel is occupied."""
        cfg = CarrierSynthConfig(n_voices=2)
        s = CarrierSynth(cfg)
        for i in range(6):
            s.on_event(events.Event(events.EventType.NOTE_ON, 0, i, 100.0 + i, 0.5))
        assert len(s._notes) == 4
        assert s.dropped_note_on == 2

    def test_release_ends_voice(self):
        sr = 44100
        cfg = CarrierSynthConfig(sample_rate=sr, osc=CarrierOscMix(sine=1.0))
        s = CarrierSynth(cfg)
        s.on_event(events.Event(events.EventType.NOTE_ON, 0, 1, 440.0, 1.0))
        s.on_event(events.mk_note_off(1000, 1))
        out = s.compute(0, 8000)
        # release floor is ~max(1ms, 2.5 periods); silent well after that
        assert np.abs(out[3000:]).max() == 0.0
        assert np.abs(out[:1000]).max() > 0.1


class TestMidiToCarrier:
    """MIDI wiring: utils/midi_input.MidiInput driving the carrier synth
    (reference rt.resynth.lib.cpp:1519-1570)."""

    def _mk(self):
        from cpp_audio_tpu.utils.midi_input import MidiInput

        cfg = CarrierSynthConfig(osc=CarrierOscMix(sine=1.0))
        s = CarrierSynth(cfg)
        mi = MidiInput(lambda: [], s, sample_rate=cfg.sample_rate)
        return s, mi

    def test_note_on_off(self):
        from cpp_audio_tpu.utils.midifile import MidiEvent

        s, mi = self._mk()
        mi.dispatch(MidiEvent(0, "note_on", key=69, velocity=127))
        assert len(s._notes) == 1
        v = next(iter(s._notes.values()))
        assert v.inc_to == pytest.approx(2 * 440.0 / 44100, rel=1e-6)
        mi.dispatch(MidiEvent(500, "note_off", key=69))
        assert len(s._notes) == 0 and len(s._finished) == 1

    def test_pitch_wheel_glides_live_notes(self):
        from cpp_audio_tpu.utils.midifile import MidiEvent

        s, mi = self._mk()
        mi.dispatch(MidiEvent(0, "note_on", key=69, velocity=100))
        v = next(iter(s._notes.values()))
        inc0 = v.inc_to
        # +2 semitones full wheel (MidiInput default pitch_wheel_semitones=2)
        mi.dispatch(MidiEvent(1000, "pitch_wheel", value=1.0))
        assert v.inc_to == pytest.approx(inc0 * 2 ** (2 / 12), rel=1e-6)
        assert v.t_ref == 1000  # glide restarted at the wheel event

    def test_all_notes_off(self):
        from cpp_audio_tpu.utils.midifile import MidiEvent

        s, mi = self._mk()
        for k in (60, 64, 67):
            mi.dispatch(MidiEvent(0, "note_on", key=k, velocity=100))
        mi.dispatch(MidiEvent(100, "all_notes_off"))
        assert len(s._notes) == 0
