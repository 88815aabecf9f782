"""Observability utilities tests."""

import time

import numpy as np

from cpp_audio_tpu.utils import profiling


def test_stage_durations():
    d = profiling.StageDurations()
    with d.stage("fft"):
        time.sleep(0.01)
    with d.stage("fft"):
        time.sleep(0.01)
    assert d.last("fft") >= 0.009
    assert d.mean("fft") >= 0.009
    assert d.summary()["fft"]["count"] == 2


def test_async_logger_collects():
    got = []
    lg = profiling.AsyncLogger(sink=got.append, capacity=16)
    for i in range(10):
        lg.log(i)
    lg.close()
    assert got == list(range(10))
    assert lg.dropped == 0


def test_async_logger_drops_when_full():
    import threading

    gate = threading.Event()
    lg = profiling.AsyncLogger(sink=lambda m: gate.wait(1.0), capacity=4)
    for i in range(50):
        lg.log(i)
    assert lg.dropped > 0
    gate.set()
    lg.close()


def test_string_plot():
    s = profiling.string_plot(np.sin(np.linspace(0, 6.28, 64)), height=8)
    lines = s.splitlines()
    assert len(lines) == 8
    assert any("*" in ln for ln in lines)


def test_string_plot_width_reduce():
    s = profiling.string_plot(np.arange(1000), height=4, width=40)
    assert all(len(ln) == 40 for ln in s.splitlines())
