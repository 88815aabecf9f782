"""Sample-stream queues with drop accounting (metaqueue/pubsub analogs)."""

import numpy as np

from cpp_audio_tpu.core.queues import (
    AudioBufferAggregator,
    AudioBufferPubSub,
    DroppedFrames,
    MetaQueue,
    ReadQueuedSampleSource,
)


class TestMetaQueue:
    def test_push_pop_roundtrip(self):
        q = MetaQueue(16)
        assert q.try_push(np.arange(4.0))
        assert q.try_push(np.arange(4.0, 8.0))
        assert [q.pop() for _ in range(8)] == [float(i) for i in range(8)]
        assert q.pop() is None

    def test_overflow_is_per_sample_with_inband_token(self):
        # metaqueue.cpp:10-50: only the REMAINDER of a buffer is dropped
        q = MetaQueue(4)
        assert q.try_push(np.ones(2))
        assert not q.try_push(np.arange(4.0))  # samples 0,1 fit; 2,3 drop
        assert q.total_dropped == 2
        assert [q.pop() for _ in range(4)] == [1.0, 1.0, 0.0, 1.0]
        assert q.try_push(np.full(2, 7.0))  # drop token precedes
        tok = q.pop()
        assert isinstance(tok, DroppedFrames) and tok.count == 2
        assert q.pop() == 7.0

    def test_full_queue_drops_token_and_buffer(self):
        # the pending token itself may not fit (metaqueue.cpp:19-27)
        q = MetaQueue(2)
        assert q.try_push(np.ones(2))
        assert not q.try_push(np.ones(3))   # all 3 dropped
        assert not q.try_push(np.ones(2))   # token push fails: 2 more
        assert q.total_dropped == 5

    def test_fill_ratio_gauge(self):
        q = MetaQueue(10)
        q.try_push(np.zeros(5))
        assert q.fill_ratio == 0.5

    def test_drain_until_smaller_is_silent(self):
        # drain_queue_until_size_smaller (metaqueue.cpp:54-67): plain pops,
        # no token, no accounting — it balances latency, not loss
        q = MetaQueue(100)
        for i in range(5):
            q.try_push(np.full(10, float(i)))
        assert q.drain_until_size_smaller(25) == 25
        assert q.total_dropped == 0
        assert q.pop() == 2.0  # oldest surviving sample (item index 25)


class TestReadQueuedSampleSource:
    def test_waits_for_half_full(self):
        q = MetaQueue(8)
        src = ReadQueuedSampleSource(q)
        q.try_push(np.ones(2))
        np.testing.assert_allclose(src.read(2), 0.0)  # pre-roll: silent
        assert not src.started
        q.try_push(np.ones(2))  # now half full
        np.testing.assert_allclose(src.read(2), 1.0)
        assert src.started

    def test_underrun_marks_discontinuity(self):
        q = MetaQueue(4)
        src = ReadQueuedSampleSource(q)
        q.try_push(np.ones(2))
        out = src.read(4)  # only 2 available
        np.testing.assert_allclose(out, [1, 1, 0, 0])
        assert src.underruns == 2  # one per missing sample
        assert not src.continuity.contiguous

    def test_start_drains_to_half_full(self):
        # metaqueue.cpp:103-110: the first read drops the excess above
        # capacity/2 to balance latency against starvation
        q = MetaQueue(8)
        q.try_push(np.arange(8.0))
        src = ReadQueuedSampleSource(q)
        np.testing.assert_allclose(src.read(4), [4, 5, 6, 7])
        assert src.continuity.contiguous  # the drain is silent

    def test_drop_token_breaks_continuity_and_rebalances(self):
        q = MetaQueue(8)
        q.try_push(np.ones(4))
        src = ReadQueuedSampleSource(q)
        src.read(4)
        assert src.continuity.contiguous
        q.try_push(np.ones(9))           # 8 fit, 1 dropped -> pending token
        q.pop(); q.pop()                 # make room so token + sample land
        assert q.try_push(np.full(1, 2.0))
        # reading hits the token: drain to capacity/2 then continue
        out = src.read(7)
        assert not src.continuity.contiguous
        assert out[-1] == 2.0


class TestAggregatorAndPubSub:
    def test_aggregator_sums(self):
        q1, q2 = MetaQueue(8), MetaQueue(8)
        q1.try_push(np.ones(4)); q1.try_push(np.ones(4))
        q2.try_push(np.full(4, 0.5)); q2.try_push(np.full(4, 0.5))
        agg = AudioBufferAggregator(ReadQueuedSampleSource(q1),
                                    ReadQueuedSampleSource(q2))
        np.testing.assert_allclose(agg.read(4), 1.5)

    def test_pubsub_fanout_with_lagging_listener(self):
        ps = AudioBufferPubSub()
        fast = ps.add_listener(capacity=64)
        slow = ps.add_listener(capacity=4)
        for _ in range(3):
            ps.try_publish_buffer(np.ones(4))
        assert len(fast) == 12
        assert len(slow) == 4          # kept the first block only
        assert slow.total_dropped == 8
        ps.remove_listener(slow)
        ps.try_publish_buffer(np.ones(4))
        assert len(fast) == 16 and len(slow) == 4
