"""ProgressEmitter session-stream lifecycle.

Mirrors reference `Tests/.../ASR/Parakeet/ProgressEmitterTests.swift`:
initial 0.0 yield, finish yields trailing 1.0, clamping, report without a
session is ignored, fail propagates the error to the consumer.
"""

import threading

import pytest

from fluidaudio_tpu.utils.timing import ProgressEmitter


def collect(session, n=None):
    out = []
    for v in session:
        out.append(v)
        if n is not None and len(out) >= n:
            break
    return out


def test_ensure_session_yields_initial_zero():
    emitter = ProgressEmitter()
    session = emitter.ensure_session()
    assert collect(session, n=1) == [0.0]


def test_finish_session_yields_one_last():
    emitter = ProgressEmitter()
    session = emitter.ensure_session()
    emitter.report(0.5)
    emitter.finish_session()
    values = collect(session)
    assert 1.0 in values
    assert values[-1] == 1.0
    assert values[0] == 0.0


def test_report_clamps_to_zero_one():
    emitter = ProgressEmitter()
    session = emitter.ensure_session()
    emitter.report(-0.5)
    emitter.report(1.5)
    emitter.finish_session()
    values = collect(session)
    assert all(0.0 <= v <= 1.0 for v in values)
    assert values == [0.0, 0.0, 1.0, 1.0]


def test_report_without_session_does_not_crash():
    ProgressEmitter().report(0.5)


def test_fail_session_raises_in_consumer():
    emitter = ProgressEmitter()
    session = emitter.ensure_session()

    class Boom(RuntimeError):
        pass

    emitter.fail_session(Boom("model died"))
    with pytest.raises(Boom):
        collect(session)


def test_cross_thread_producer():
    emitter = ProgressEmitter()
    session = emitter.ensure_session()

    def produce():
        for i in range(1, 4):
            emitter.report(i / 4)
        emitter.finish_session()

    t = threading.Thread(target=produce)
    t.start()
    values = collect(session)
    t.join()
    assert values == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_subscribe_callbacks_still_fan_out():
    emitter = ProgressEmitter()
    seen = []
    emitter.subscribe(seen.append)
    emitter.emit(0.3)
    emitter.emit(2.0)
    assert seen == [0.3, 1.0]
