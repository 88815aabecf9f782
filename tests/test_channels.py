"""Channel/Request playback queues (reference channel.h / channels.h /
channels_aggregate.h / request.h semantics).

The Channel state machine itself is validated frame-exactly against the
compiled reference in tests/test_reference_oracle.py (TestChannelOracle);
these tests pin the oracle-derived semantics in plain numpy so they run
without the reference tree:

- request durations span mid-seam to mid-seam: a queue of durations D with
  xfade size S renders sum(D) + S - 1 frames, the first request fading in
  from zero and the last fading out (channel.h:318-329,766-785);
- addRequest rejects durations < 2*S under UseXfade (channel.h:244-246);
- SkipXfade splices raw with exact durations (channel.h:296-310).
"""

import numpy as np
import pytest

from cpp_audio_tpu.core.channels import (
    Channel,
    Channels,
    ChannelsAggregate,
    ClosingPolicy,
    Request,
    XfadePolicy,
    silence,
)


def const_req(value, length, n_outs=2, volumes=1.0):
    return Request.make(np.full(8, float(value)), volumes, length, n_outs=n_outs)


class TestRequest:
    def test_buffer_loops(self):
        r = Request.make(np.arange(4.0), 1.0, length=10)
        seg = r.read(0, 10, 1)[:, 0]
        np.testing.assert_allclose(seg, np.arange(10) % 4)

    def test_mono_broadcasts_to_stereo_with_volumes(self):
        r = Request.make(np.ones(4), [0.25, 0.5], length=4)
        seg = r.read(0, 4, 2)
        np.testing.assert_allclose(seg[:, 0], 0.25)
        np.testing.assert_allclose(seg[:, 1], 0.5)

    def test_silence(self):
        s = silence(16)
        np.testing.assert_allclose(s.read(0, 16, 2), 0.0)


class TestChannelXfade:
    def test_equal_gain_sums_to_one_for_equal_sources(self):
        # two identical constant requests: the seam must be inaudible — only
        # the fade-in/fade-out ladders at the ends break the constant
        ch = Channel(n_outs=1, xfade_length=31)
        ch.play(const_req(1.0, 100, n_outs=1), const_req(1.0, 100, n_outs=1))
        out = ch.step(100 + 100 + 31)[:, 0]
        np.testing.assert_allclose(out[30:200 - 15], 1.0, atol=1e-12)
        # fade-in ladder 0..1 over the first 31 frames
        np.testing.assert_allclose(out[:31], np.arange(31) / 30.0, atol=1e-12)
        # silence after sum(D) + xfade - 1 frames
        np.testing.assert_allclose(out[200 + 30:], 0.0, atol=1e-12)
        assert ch.done

    def test_xfade_monotone_transition(self):
        half = 10
        ch = Channel(n_outs=1, xfade_length=21)
        ch.play(const_req(0.0, 64, n_outs=1), const_req(1.0, 64, n_outs=1))
        out = ch.step(64 + 64 + 21)[:, 0]
        # request A is zero-valued; the A->B seam is centered at
        # t_B = half + 64, spanning 21 frames
        t_b = half + 64
        assert np.all(out[: t_b - half] == 0.0)
        np.testing.assert_allclose(out[t_b + half : 64 + 64 - half], 1.0,
                                   atol=1e-12)
        fade = out[t_b - half : t_b + half + 1]
        assert np.all(np.diff(fade) > 0)
        np.testing.assert_allclose(fade, np.arange(21) / 20.0, atol=1e-12)

    def test_block_split_matches_single_step(self):
        # the same queue rendered in one step vs tiny blocks must agree
        rng = np.random.default_rng(0)
        reqs = [Request.make(rng.standard_normal(37), 1.0, length=90)
                for _ in range(3)]
        total = 90 * 3 + 15

        ch1 = Channel(n_outs=1, xfade_length=15)
        ch1.play(*[Request(r.buffer, r.volumes, r.length) for r in reqs])
        whole = ch1.step(total)

        ch2 = Channel(n_outs=1, xfade_length=15)
        ch2.play(*[Request(r.buffer, r.volumes, r.length) for r in reqs])
        parts = np.concatenate([ch2.step(7) for _ in range(total // 7 + 1)])
        np.testing.assert_allclose(parts[:total], whole, atol=1e-12)

    def test_short_request_rejected(self):
        # channel.h:244-246: duration < 2*size_xfade is refused
        ch = Channel(n_outs=1, xfade_length=21)
        assert not ch.add_request(const_req(1.0, 41, n_outs=1))
        assert ch.add_request(const_req(1.0, 42, n_outs=1))

    def test_skip_xfade_concatenates(self):
        ch = Channel(n_outs=1, xfade_length=9,
                     xfade_policy=XfadePolicy.SKIP_XFADE)
        ch.play(const_req(2.0, 10, n_outs=1), const_req(3.0, 10, n_outs=1))
        out = ch.step(20)[:, 0]
        np.testing.assert_allclose(out[:10], 2.0)
        np.testing.assert_allclose(out[10:], 3.0)

    def test_even_xfade_rounded_to_odd(self):
        ch = Channel(xfade_length=10)
        assert ch.xfade_length == 11

    def test_volume_ramp(self):
        ch = Channel(n_outs=1, xfade_policy=XfadePolicy.SKIP_XFADE, volume=0.0)
        ch.play(const_req(1.0, 100, n_outs=1))
        ch.set_volume(1.0, 10)
        out = ch.step(100)[:, 0]
        np.testing.assert_allclose(out[:10], (np.arange(10) + 1) / 10.0)
        np.testing.assert_allclose(out[10:], 1.0)

    def test_buffer_sync_at_seam(self):
        """onBeginToZero (channel.h:716-739): the incoming soundBuffer's read
        index starts at (size-1-half) mod size, so index 0 lands one frame
        past mid-seam."""
        half = 2
        buf = np.array([10.0, 20.0, 30.0, 40.0])
        ch = Channel(n_outs=1, xfade_length=5)
        ch.play(Request.make(np.zeros(4), 1.0, 12, n_outs=1),
                Request.make(buf, 1.0, 12, n_outs=1))
        out = ch.step(29)[:, 0]
        t_b = half + 12  # seam center
        # one frame past mid-seam: buffer[0] at weight 0.75
        assert out[t_b + 1] == pytest.approx(0.75 * 10.0)
        # first full-weight frame: buffer[1]
        assert out[t_b + 2] == pytest.approx(20.0)

    def test_xfade_now(self):
        """channel.h:107-124: the seam to the next request starts on the very
        next frame."""
        ch = Channel(n_outs=1, xfade_length=5)
        ch.play(const_req(1.0, 20, n_outs=1), const_req(2.0, 20, n_outs=1))
        pre = ch.step(7)[:, 0]
        assert pre[-1] == 1.0
        ch.xfade_now()
        post = ch.step(5)[:, 0]
        np.testing.assert_allclose(post, [1.0, 1.25, 1.5, 1.75, 2.0])

    def test_stop_playing_by_xfade_to_zero(self):
        """channel.h:260-268: a linear volume ramp to zero, stepping 1/n per
        frame before the multiply, then the channel resets."""
        ch = Channel(n_outs=1, xfade_length=5)
        ch.play(const_req(1.0, 20, n_outs=1))
        ch.step(7)
        ch.stop_playing_by_xfade_to_zero(4)
        out = ch.step(6)[:, 0]
        np.testing.assert_allclose(out, [0.75, 0.5, 0.25, 0.0, 0.0, 0.0])
        assert ch.done


class TestChannelsPool:
    def test_open_play_sum(self):
        cs = Channels(n_outs=2, xfade_policy=XfadePolicy.SKIP_XFADE)
        a = cs.open_channel()
        b = cs.open_channel()
        cs.play(a, const_req(1.0, 50))
        cs.play(b, const_req(0.5, 50))
        out = cs.render(50)
        np.testing.assert_allclose(out, 1.5)
        assert cs.done

    def test_autoclose_reuse(self):
        cs = Channels(n_outs=1, n_channels=1,
                      xfade_policy=XfadePolicy.SKIP_XFADE)
        a = cs.open_channel(closing_policy=ClosingPolicy.AUTO_CLOSE)
        cs.play(a, const_req(1.0, 10, n_outs=1))
        cs.render(10)
        # pool is size 1, but the finished auto-close channel is reusable
        b = cs.open_channel()
        assert b == a

    def test_pool_exhaustion(self):
        cs = Channels(n_channels=1, xfade_policy=XfadePolicy.SKIP_XFADE)
        cs.play(cs.open_channel(closing_policy=ClosingPolicy.EXPLICIT_CLOSE),
                const_req(1.0, 10))
        with pytest.raises(RuntimeError):
            cs.open_channel()

    def test_close_with_fadeout(self):
        # reference AudioOutContext xfade_on_close (audio_context.h:73)
        cs = Channels(n_outs=1, xfade_policy=XfadePolicy.SKIP_XFADE)
        cid = cs.open_channel()
        cs.play(cid, const_req(1.0, 10000, n_outs=1))
        cs.close_with_fadeout(cid, 100)
        out = cs.render(200)[:, 0]
        assert out[0] > 0.9  # starts hot
        np.testing.assert_allclose(out[100:], 0.0, atol=1e-12)  # silent after fade
        assert np.all(np.diff(out[:100]) < 0)  # monotone fade
        assert cs.channel(cid).done  # ramp finished -> channel resets

    def test_explicit_close_frees(self):
        cs = Channels(n_channels=1)
        cid = cs.open_channel(closing_policy=ClosingPolicy.EXPLICIT_CLOSE)
        cs.close(cid)
        cs.open_channel()  # does not raise


class TestAggregate:
    def test_three_flavors_sum(self):
        agg = ChannelsAggregate(n_outs=1)
        # the xfade flavor uses a 401-frame ladder: a constant request longer
        # than 2*401 fades in over 401 frames, so probe past the ladder
        agg.xfade.play(agg.xfade.open_channel(), const_req(1.0, 2000, n_outs=1))
        agg.no_xfade.play(agg.no_xfade.open_channel(),
                          const_req(2.0, 2000, n_outs=1))
        out = np.concatenate([agg.step(500) for _ in range(2)])
        np.testing.assert_allclose(out[401:1000, 0], 3.0)
        # mid fade-in: the xfade channel contributes its half-ladder
        assert out[200, 0] == pytest.approx(2.0 + 0.5)


class TestScoreToRequests:
    def test_score_plays_through_channel(self):
        # reference to_request (note.h:10-40): sine or silence requests
        from cpp_audio_tpu.utils.score import notespecs_to_requests, parse_music

        reqs = notespecs_to_requests(parse_music("do . Mi"), volume=0.25)
        assert len(reqs) == 3
        assert reqs[1].volumes.max() == 0.0          # the rest is silent
        assert reqs[2].volumes.max() == pytest.approx(0.5)  # loud = 2x
        cs = Channels(n_outs=2, xfade_length=101)
        cid = cs.open_channel()
        cs.play(cid, *reqs)
        out = cs.render(sum(r.length for r in reqs) + 101)
        assert np.abs(out).max() > 0.2
        # mid-rest (shifted by the half-seam offset 50) is silent
        mid = out[50 + reqs[0].length + reqs[1].length // 2]
        np.testing.assert_allclose(mid, 0.0, atol=1e-9)
