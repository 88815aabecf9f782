"""SoundEngine (birds/robots/sweep) scheduler + renderer tests."""

import numpy as np
import pytest

from cpp_audio_tpu.models import soundengine as se
from cpp_audio_tpu.models import voice_presets as vp
from cpp_audio_tpu.utils.markov import MarkovChain, MarkovMove


class TestMarkov:
    def test_normalized_step_always_moves(self):
        mc = MarkovChain()
        a = mc.emplace(lambda m, me, o: None)
        b = mc.emplace(lambda m, me, o: None)
        mc.def_transition(a, b, 0.5)
        mc.def_transition(b, a, 0.5)
        mc.initialize(a)
        mc.step_normalized(0.3)
        assert mc.current == b

    def test_unnormalized_step_may_stay(self):
        mc = MarkovChain()
        a = mc.emplace(lambda m, me, o: None)
        b = mc.emplace(lambda m, me, o: None)
        mc.def_transition(a, b, 0.1)
        mc.initialize(a)
        mc.step(0.9)
        assert mc.current == a
        mc.step(0.05)
        assert mc.current == b

    def test_lambdas_fire_enter_and_leave(self):
        events = []
        mc = MarkovChain()
        a = mc.emplace(lambda m, me, o: events.append(("a", m)))
        b = mc.emplace(lambda m, me, o: events.append(("b", m)))
        mc.def_transition(a, b, 1.0)
        mc.initialize(a)
        mc.step_normalized(0.5)
        assert events == [("a", MarkovMove.LEAVE_NODE), ("b", MarkovMove.ENTER_NODE)]

    def test_execute_false_suppresses_lambdas(self):
        events = []
        mc = MarkovChain()
        a = mc.emplace(lambda m, me, o: events.append("a"))
        b = mc.emplace(lambda m, me, o: events.append("b"))
        mc.def_transition(a, b, 1.0)
        mc.initialize(a)
        mc.step_normalized(0.5, execute=False)
        assert events == [] and mc.current == b


class TestScheduler:
    def test_bird_specs_generated(self):
        p = vp.get_program(vp.Mode.BIRDS, "Standard & Cute bird")
        sched = se.SoundEngineScheduler(p, 44100, 440.0, seed=32)
        specs = sched.build_specs()
        assert 0 < len(specs) <= 30
        for s in specs:
            assert s.from_inc > 0 and s.to_inc > 0
            assert s.duration > 0

    def test_bird_deterministic_by_seed(self):
        p = vp.get_program(vp.Mode.BIRDS, "Scat bird")
        s1 = se.SoundEngineScheduler(p, 44100, 440.0, seed=4).build_specs()
        s2 = se.SoundEngineScheduler(p, 44100, 440.0, seed=4).build_specs()
        s3 = se.SoundEngineScheduler(p, 44100, 440.0, seed=5).build_specs()
        assert [(a.from_inc, a.duration) for a in s1] == [(a.from_inc, a.duration) for a in s2]
        assert [(a.from_inc, a.duration) for a in s1] != [(a.from_inc, a.duration) for a in s3]

    def test_bird_xfade_freq_inserts_transitions(self):
        p = vp.get_program(vp.Mode.BIRDS, "Rhythmic bird")  # FreqXfade::All
        sched = se.SoundEngineScheduler(p, 44100, 440.0, seed=19)
        specs = sched.build_specs()
        # transition specs have the freq_interpolation curve
        trans = [s for s in specs if s.itp == p.freq_interpolation
                 and abs(s.duration - sched.freq_xfade) < 1.5]
        if len(specs) > 1:
            assert trans, "expected frequency-transition specs with FreqXfade::All"

    def test_robot_emits_constant_freq_pairs(self):
        p = vp.get_program(vp.Mode.ROBOTS, "R2D2")
        sched = se.SoundEngineScheduler(p, 44100, 440.0, seed=2)
        specs = sched.build_specs()
        assert specs
        # robot specs are constant-frequency (from == to) except slides
        n_const = sum(1 for s in specs if s.from_inc == s.to_inc)
        assert n_const >= len(specs) - 2

    def test_sweep_single_spec(self):
        p = vp.get_program(vp.Mode.SWEEP, "Sweep 1")
        sched = se.SoundEngineScheduler(p, 44100, 440.0, seed=1)
        specs = sched.build_specs()
        assert len(specs) == 1
        s = specs[0]
        assert s.from_inc == pytest.approx(2 * 0.0009 / 44100)
        assert s.to_inc == pytest.approx(2 * 20000.0 / 44100)

    def test_timeline_sequential(self):
        p = vp.get_program(vp.Mode.BIRDS, "Standard & Cute bird")
        sched = se.SoundEngineScheduler(p, 44100, 440.0, seed=32)
        tl = sched.timeline(sched.build_specs())
        for i in range(1, len(tl)):
            assert tl[i][1] >= tl[i - 1][2]  # next press after previous release

    def test_preset_inventory(self):
        assert len(vp.BIRD_PROGRAMS) == 9
        assert len(vp.ROBOT_PROGRAMS) == 2
        assert len(vp.SWEEP_PROGRAMS) == 2
        assert len(vp.WIND_PROGRAMS) == 14


class TestRenderer:
    def test_bird_renders_sound(self):
        p = vp.get_program(vp.Mode.BIRDS, "Standard & Cute bird")
        out = se.render_program(p, 440.0, 44100, seed=32, dtype="float64")
        assert out.shape == (44100, 2)
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) > 1e-4

    def test_sweep_frequency_rises(self):
        p = vp.get_program(vp.Mode.SWEEP, "Sweep 1")
        out = se.render_program(p, 440.0, 6 * 44100, seed=1, pan=0.0, dtype="float64")
        mono = out.sum(axis=1)
        nz = np.nonzero(np.abs(mono) > 1e-6)[0]
        assert len(nz) > 20000

        def dom_freq(seg):
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            return np.argmax(spec) * 44100 / len(seg)

        a = nz[0] + 2000
        early = dom_freq(mono[a : a + 4096])
        late_start = nz[0] + int(0.7 * (nz[-1] - nz[0]))
        late = dom_freq(mono[late_start : late_start + 4096])
        assert late > early * 2  # exponential upward sweep

    def test_robot_renders(self):
        p = vp.get_program(vp.Mode.ROBOTS, "R2D2")
        out = se.render_program(p, 440.0, 44100, seed=7, dtype="float64")
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) > 1e-4

    def test_all_bird_presets_render(self):
        for p in vp.BIRD_PROGRAMS:
            seed = p.preferred_seeds[0] if p.preferred_seeds else 1
            out = se.render_program(p, 440.0, 22050, seed=seed)
            assert np.all(np.isfinite(out)), p.name

    def test_determinism(self):
        p = vp.get_program(vp.Mode.BIRDS, "Slow bird")
        o1 = se.render_program(p, 440.0, 22050, seed=63, pan=0.0, dtype="float64")
        o2 = se.render_program(p, 440.0, 22050, seed=63, pan=0.0, dtype="float64")
        np.testing.assert_array_equal(o1, o2)
