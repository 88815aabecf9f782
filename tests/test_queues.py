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
        np.testing.assert_allclose(q.pop(), [0, 1, 2, 3])
        np.testing.assert_allclose(q.pop(), [4, 5, 6, 7])
        assert q.pop() is None

    def test_overflow_emits_inband_drop_token(self):
        q = MetaQueue(4)
        assert q.try_push(np.ones(4))
        assert not q.try_push(np.ones(3))  # overflows
        np.testing.assert_allclose(q.pop(), 1.0)  # the accepted block
        assert q.try_push(np.ones(2))  # room again -> drop token precedes
        tok = q.pop()
        assert isinstance(tok, DroppedFrames) and tok.count == 3
        assert q.total_dropped == 3

    def test_fill_ratio_gauge(self):
        q = MetaQueue(10)
        q.try_push(np.zeros(5))
        assert q.fill_ratio == 0.5

    def test_drain_until_smaller(self):
        q = MetaQueue(100)
        for i in range(5):
            q.try_push(np.full(10, float(i)))
        dropped = q.drain_until_size_smaller(25)
        assert dropped == 30
        tok = q.pop()
        assert isinstance(tok, DroppedFrames) and tok.count == 30
        np.testing.assert_allclose(q.pop(), 3.0)  # oldest surviving block


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
        assert src.underruns == 1
        assert not src.continuity.contiguous

    def test_drop_token_breaks_continuity(self):
        q = MetaQueue(4)
        q.try_push(np.ones(4))
        q.try_push(np.ones(2))  # dropped
        src = ReadQueuedSampleSource(q)
        src.read(4)
        assert src.continuity.contiguous
        q.try_push(np.full(2, 2.0))  # drop token enters here
        np.testing.assert_allclose(src.read(2), 2.0)
        assert not src.continuity.contiguous


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
