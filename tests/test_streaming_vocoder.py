"""StreamingVocoder + live MIDI->carrier->vocoder wiring tests.

The streaming vocoder must reproduce the offline batch vocoder
(analysis/vocoder.vocode) sample-for-sample after its 2S-1 latency, and
LiveResynth with a CarrierSynth must render a vocoded carrier driven by MIDI
(the reference's live application loop, rt.resynth.lib.cpp:1397-1418).
"""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import vocoder as voc
from cpp_audio_tpu.analysis.resynth import ResynthConfig
from cpp_audio_tpu.analysis.streaming import LiveResynth, StreamingVocoder
from cpp_audio_tpu.core import events
from cpp_audio_tpu.models.carrier import (CarrierOscMix, CarrierSynth,
                                          CarrierSynthConfig)


class TestStreamingVocoder:
    def _signals(self, n, sr):
        rng = np.random.default_rng(0)
        t = np.arange(n) / sr
        mod = np.sin(2 * np.pi * 330 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        car = rng.standard_normal(n) * 0.3
        return mod, car

    @pytest.mark.parametrize("block", [512, 221, 1000])
    def test_matches_offline_after_latency(self, block):
        """streaming[t + 2S - 1] == offline[t] once both pipelines are warm
        (the reference emits the first crossfaded sample inside the window-
        completing feed itself — oracle-pinned, vocoder.cpp:509-527)."""
        sr = 44100
        p = voc.VocoderParams(sample_rate=sr)
        S, W = p.stride, p.modulator_window
        n = sr // 2
        mod, car = self._signals(n, sr)
        off = np.asarray(voc.vocode(mod, car, p, exact_modulator=True))
        sv = StreamingVocoder(p)
        stream = np.concatenate(
            [sv.process(mod[i : i + block], car[i : i + block])
             for i in range(0, n, block)])
        lag = 2 * S - 1
        warm = W + 2 * S  # first full modulator window + first carrier frame
        L = min(len(off), len(stream) - lag)
        err = np.abs(off[warm : L] - stream[warm + lag : L + lag]).max()
        assert err < 1e-5

    def test_volume_mix(self):
        """volume_modulator/carrier pass the raw streams through."""
        sr = 44100
        p = voc.VocoderParams(sample_rate=sr, volume_vocoded=0.0,
                              volume_modulator=0.25, volume_carrier=0.5)
        n = 4096
        mod, car = self._signals(n, sr)
        sv = StreamingVocoder(p)
        out = sv.process(mod, car)
        np.testing.assert_allclose(out, 0.25 * mod + 0.5 * car, atol=1e-12)

    def test_zero_modulator_silences_vocoded(self):
        sr = 44100
        p = voc.VocoderParams(sample_rate=sr)
        sv = StreamingVocoder(p)
        car = np.random.default_rng(1).standard_normal(sr // 4)
        out = sv.process(np.zeros(len(car)), car)
        assert np.abs(out).max() < 1e-12


class TestLiveMidiVocoder:
    def test_midi_carrier_vocoded(self):
        """MIDI notes on the carrier + a voiced input -> nonzero vocoded mix;
        silent input -> vocoded leg silent even while the carrier plays."""
        sr = 44100
        cfg = ResynthConfig(sample_rate=sr)
        carrier = CarrierSynth(CarrierSynthConfig(
            sample_rate=sr, osc=CarrierOscMix(saw=1.0)))
        vp = voc.VocoderParams(sample_rate=sr)
        live = LiveResynth(cfg, vocoder_params=vp, carrier_synth=carrier)
        carrier.on_event(events.Event(events.EventType.NOTE_ON, 0, 1, 110.0, 1.0))

        t = np.arange(sr // 2) / sr
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        outs = []
        for i in range(0, len(sig), 512):
            live.feed(sig[i : i + 512])
            outs.append(live.pull(min(512, len(sig) - i)))
        out = np.concatenate(outs, axis=0)
        assert out.shape[1] == 2
        assert np.abs(out).max() > 1e-3

        # silent input: modulator bands are zero -> vocoded leg silent
        carrier2 = CarrierSynth(CarrierSynthConfig(
            sample_rate=sr, osc=CarrierOscMix(saw=1.0)))
        live2 = LiveResynth(cfg, vocoder_params=vp, carrier_synth=carrier2)
        carrier2.on_event(events.Event(events.EventType.NOTE_ON, 0, 1, 110.0, 1.0))
        outs2 = []
        for i in range(0, len(sig), 512):
            live2.feed(np.zeros(512))
            outs2.append(live2.pull(512))
        assert np.abs(np.concatenate(outs2)).max() < 1e-9

    def test_carrier_volume_passthrough(self):
        """volume_carrier mixes the raw carrier into the output."""
        sr = 44100
        cfg = ResynthConfig(sample_rate=sr)
        carrier = CarrierSynth(CarrierSynthConfig(
            sample_rate=sr, osc=CarrierOscMix(sine=1.0)))
        vp = voc.VocoderParams(sample_rate=sr, volume_vocoded=0.0,
                               volume_carrier=1.0)
        live = LiveResynth(cfg, vocoder_params=vp, carrier_synth=carrier)
        carrier.on_event(events.Event(events.EventType.NOTE_ON, 0, 1, 220.0, 0.8))
        live.feed(np.zeros(4096))
        out = live.pull(4096)
        want = carrier.compute(0, 4096)  # closed-form: re-render is identical
        np.testing.assert_allclose(out[:, 0], want, atol=1e-6)


def test_resynth_cli_live_midi(tmp_path):
    """apps/resynth.py --live --midi renders the vocoded carrier (VERDICT
    round-1 item 1 'done' criterion)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_midifile import write_test_midi

    from cpp_audio_tpu.apps import resynth as app
    from cpp_audio_tpu.utils import wav as wavio

    sr = 44100
    t = np.arange(sr // 2) / sr
    sig = 0.6 * np.sin(2 * np.pi * 440 * t)
    wavio.write_wav(tmp_path / "in.wav", sig.astype(np.float32), sr)
    write_test_midi(tmp_path / "t.mid", [
        (0, bytes([0x90, 45, 100])),
        (480, bytes([0x80, 45, 0])),
    ])
    assert app.main([str(tmp_path / "in.wav"), str(tmp_path / "out.wav"),
                     "--live", "--midi", str(tmp_path / "t.mid"),
                     "--carrier", "saw=0.8,noise=0.2"]) == 0
    d, _ = wavio.read_wav(tmp_path / "out.wav")
    assert d.shape[1] == 2 and np.abs(d).max() > 1e-3
