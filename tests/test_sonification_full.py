"""Full binary sonification machinery + partitioned streaming post
(VERDICT round-1 item 6)."""

import numpy as np
import pytest

from cpp_audio_tpu.utils import event_streams as es


class TestSkipRanges:
    def test_runs_over_limit_are_skipped(self):
        # run of 15 'A's with max 11: bytes 11..14 of the run are skipped
        # (cur_consecutive > 11 from the 12th on)
        arr = np.frombuffer(b"x" * 3 + b"A" * 15 + b"y" * 2, np.uint8)
        ranges = es.compute_skip_ranges(arr, 11)
        assert ranges == [es.ByteRange(3 + 11, 3 + 15)]

    def test_no_skip_below_limit(self):
        arr = np.frombuffer(b"A" * 11 + b"B" * 11, np.uint8)
        assert es.compute_skip_ranges(arr, 11) == []

    def test_multiple_runs(self):
        arr = np.frombuffer(b"A" * 5 + b"B" * 5 + b"A" * 5, np.uint8)
        assert es.compute_skip_ranges(arr, 3) == [
            es.ByteRange(3, 5), es.ByteRange(8, 10), es.ByteRange(13, 15)]


class TestBatchStats:
    def test_batches_partition_kept_bytes(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 2500, dtype=np.uint8).tobytes()
        batches, skips = es.stats_from_binary(data, batch_size=1000,
                                              max_consecutive=11)
        total = sum(r.end - r.begin for rs in batches.values()
                    for b in rs for r in b)
        skipped = sum(r.end - r.begin for r in skips)
        assert total == 2500 - skipped
        assert len([b for rs in batches.values() for b in rs]) == 3

    def test_boring_batches_filtered(self):
        # batch of one repeated byte (max freq = batch size) is boring;
        # a uniform-random batch is not
        rng = np.random.default_rng(1)
        boring = (b"ABCDEFGHIJK" * 100)[:1000]  # 11-periodic: no skips,
        # every byte ~90 times > 0.03*1000
        interesting = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        batches, _ = es.stats_from_binary(boring + interesting,
                                          batch_size=1000)
        sel = es.select_interesting_ranges(batches, batch_size=1000)
        sel_bytes = sum(r.end - r.begin for r in sel)
        assert 0 < sel_bytes <= 1000  # only the interesting batch survives


class TestMidiPitchStream:
    def test_cyclic_byte_mapping(self):
        # same byte repeated: the cyclic iterator walks 0,1,2,... so equal
        # bytes yield RISING pitches (main.tune.cpp:544-566)
        data = bytes([65] * 5)
        s = es.MidiPitchStreamFromBinary(
            data, [es.ByteRange(0, 5)], pitch_min=60.0, pitch_max=72.0)
        got = [s(0) for _ in range(5)]
        assert got == [60.0, 61.0, 62.0, 63.0, 64.0]

    def test_pitch_range_wraps_cycle(self):
        data = bytes([7] * 4)
        s = es.MidiPitchStreamFromBinary(
            data, [es.ByteRange(0, 4)], pitch_min=60.0, pitch_max=62.0)
        assert [s(0) for _ in range(4)] == [60.0, 61.0, 62.0, 60.0]

    def test_staggered_initialization(self):
        # uniform_cycle_initialization=False: byte value i starts i steps in
        data = bytes([0, 1, 2])
        s = es.MidiPitchStreamFromBinary(
            data, [es.ByteRange(0, 3)], pitch_min=60.0, pitch_max=80.0,
            uniform_cycle_initialization=False)
        assert [s(0) for _ in range(3)] == [60.0, 61.0, 62.0]

    def test_exhaustion_returns_none(self):
        s = es.MidiPitchStreamFromBinary(b"ab", [es.ByteRange(0, 2)])
        assert s(0) is not None and s(0) is not None
        assert s(0) is None

    def test_polyphonic_voices_share_stream(self):
        # scoreFromStream round-robins voices over the SAME byte cursor
        data = bytes([65, 65, 65, 65])
        s = es.MidiPitchStreamFromBinary(
            data, [es.ByteRange(0, 4)], pitch_min=60.0, pitch_max=70.0,
            n_voices=2)
        voices = es.score_from_stream(s)
        # each voice consumed 2 bytes; each voice's cycle advanced per OWN use
        assert voices == [[60.0, 61.0], [60.0, 61.0]]


class TestFullSonification:
    def test_notes_timing_and_volume(self):
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
        notes = es.binary_sonification_notes_full(data, polyphony=2,
                                                  batch_size=1000)
        assert notes
        assert all(abs(n.velocity - 0.5) < 1e-9 for n in notes)  # 1/voices
        t = es.EventsTiming()
        d = notes[0].release - notes[0].press
        assert d == int(t.wait_after_note_on * 44100)

    def test_loop_from_binary(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 1500, dtype=np.uint8).tobytes()
        once = es.binary_sonification_notes_full(data, max_notes=50)
        looped = es.loop_from_binary(data, n_iterations=3, max_notes=50)
        assert len(looped) == 3 * len(once)

    def test_modulo_pitch_folds_range(self):
        from cpp_audio_tpu.utils.midi import A_PITCH

        rng = np.random.default_rng(4)
        data = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
        notes = es.binary_sonification_notes_full(data, max_notes=100)
        folded = es.modulo_pitch_notes(notes)
        for n in folded:
            p = A_PITCH + 12 * np.log2(n.frequency / 440.0)
            assert 50.0 - 1e-6 <= p <= 80.0 + 1e-6

    def test_tune_cli_sonify_full(self, tmp_path):
        from cpp_audio_tpu.apps import tune
        from cpp_audio_tpu.utils import wav as wavio

        rng = np.random.default_rng(5)
        blob = tmp_path / "x.bin"
        blob.write_bytes(rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
        out = tmp_path / "s.wav"
        assert tune.main(["--sonify", str(blob), str(out), "--sonify-full",
                          "--polyphony", "2", "--modulo-pitch"]) == 0
        d, _ = wavio.read_wav(out)
        assert np.abs(d).max() > 1e-4


class TestPartitionedConvolver:
    @pytest.mark.parametrize("pattern", ["tiny", "big", "ragged"])
    def test_matches_full_convolution(self, pattern):
        from cpp_audio_tpu.core.engine import StreamingConvolver

        rng = np.random.default_rng(0)
        n = 30000
        x = rng.standard_normal((n, 2)) * 0.3
        ir = rng.standard_normal(9000) * np.exp(-np.arange(9000) / 2000)
        want = np.stack([np.convolve(x[:, c], ir)[:n] for c in range(2)],
                        axis=1)
        blocks = {"tiny": [256] * 200, "big": [20000, 20000],
                  "ragged": [1, 700, 12000, 333, 30000]}[pattern]
        sc = StreamingConvolver(ir, wet=1.0, dry=0.0, partition=1024)
        outs, pos = [], 0
        for b in blocks:
            if pos >= n:
                break
            b = min(b, n - pos)
            outs.append(sc(x[pos : pos + b]))
            pos += b
        got = np.concatenate(outs, axis=0)
        assert np.abs(got - want).max() < 1e-10

    def test_bounded_per_block_cost(self):
        """Per-block work is O((n+P)logP + K*P): doubling the IR length must
        not change the per-block FFT size, only the delay-line depth."""
        from cpp_audio_tpu.core.engine import StreamingConvolver

        sc1 = StreamingConvolver(np.ones(8192), partition=1024)
        sc2 = StreamingConvolver(np.ones(65536), partition=1024)
        assert sc1.partition == sc2.partition == 1024
        assert sc2.n_parts == 8 * sc1.n_parts

    def test_wet_dry_mix(self):
        from cpp_audio_tpu.core.engine import StreamingConvolver

        x = np.random.default_rng(1).standard_normal((4096, 1))
        sc = StreamingConvolver(np.asarray([1.0]), wet=0.25)
        out = sc(x)
        np.testing.assert_allclose(out, 0.25 * x + 0.75 * x, atol=1e-12)


class TestStreamingLimiterScan:
    def test_matches_scalar_recurrence(self):
        from cpp_audio_tpu.core.engine import StreamingLimiter

        rng = np.random.default_rng(7)
        sig = rng.standard_normal((20000, 2)) * 1.5
        lim = StreamingLimiter(ceiling=0.5, release_ms=30.0)
        got = np.concatenate([lim(sig[i : i + 777])
                              for i in range(0, 20000, 777)])
        r = lim.r
        prev = 0.0
        p = np.empty(20000)
        xa = np.abs(sig).max(axis=1)
        for i, v in enumerate(xa):
            prev = max(v, r * prev)
            p[i] = prev
        want = sig * np.minimum(1.0, 0.5 / np.maximum(p, 1e-12))[:, None]
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert np.abs(got).max() <= 0.5 + 1e-9
