"""Direct unit tests for the ordered parallel output pipeline.

The OutputPipeline (sketchtpu/dist/opipe.py) sits on every dense distance
output path; the goldens exercise it only end-to-end where a 1-core host
degenerates it to near-serial. These tests drive its ordering, error, and
backpressure contracts directly with many workers and jittered task
durations, matching the serial Display semantics of the reference
(/root/reference/src/distances/distance_matrix.rs:175-209).
"""

import io
import random
import threading
import time

import pytest

from sketchtpu.dist.opipe import OutputPipeline


class _TextOut:
    """A text sink WITHOUT .buffer (str write fallback path)."""

    def __init__(self):
        self.parts = []

    def write(self, s):
        assert isinstance(s, str)
        self.parts.append(s)

    def value(self) -> bytes:
        return "".join(self.parts).encode()


class _BufferedOut:
    """A text sink WITH .buffer (bytes fast path), optionally slow."""

    def __init__(self, delay=0.0):
        self.buffer = self
        self._delay = delay
        self.parts = []
        self.flushed = False

    def write(self, b):
        assert isinstance(b, bytes)
        if self._delay:
            time.sleep(self._delay)
        self.parts.append(b)

    def flush(self):
        self.flushed = True

    def value(self) -> bytes:
        return b"".join(self.parts)


def _jittered(i: int) -> bytes:
    # jitter so completion order differs from submission order
    time.sleep(random.Random(i).random() * 0.004)
    return b"chunk-%06d\n" % i


@pytest.mark.parametrize("sink_cls", [_TextOut, _BufferedOut])
def test_ordered_output_many_workers(sink_cls):
    """Bytes come out in submission order regardless of task completion
    order, on both the .buffer and the str-write sink paths."""
    out = sink_cls()
    n = 200
    with OutputPipeline(out, workers=8) as pipe:
        for i in range(n):
            pipe.submit(_jittered, i)
    want = b"".join(b"chunk-%06d\n" % i for i in range(n))
    assert out.value() == want


def test_slow_sink_preserves_order_and_flushes():
    """A slow writer (sink slower than the pool) still yields exact order,
    and close() flushes the buffered sink."""
    out = _BufferedOut(delay=0.002)
    n = 50
    with OutputPipeline(out, workers=8) as pipe:
        for i in range(n):
            pipe.submit(_jittered, i)
    assert out.value() == b"".join(b"chunk-%06d\n" % i for i in range(n))
    assert out.flushed


def test_empty_chunks_skipped():
    out = _BufferedOut()
    with OutputPipeline(out, workers=4) as pipe:
        for i in range(10):
            pipe.submit(lambda i=i: b"" if i % 2 else b"%d." % i)
    assert out.value() == b"0.2.4.6.8."


def test_task_error_reraised_at_close_and_writer_stops():
    """A raising task propagates through _drain -> close(), and no chunk
    submitted after the failing one reaches the sink."""
    out = _BufferedOut()

    def task(i):
        if i == 3:
            raise ValueError("boom at 3")
        time.sleep(0.001)
        return b"%d\n" % i

    pipe = OutputPipeline(out, workers=4)
    # the error surfaces exactly once: either submit() observes it early
    # (it calls close(), which re-raises and consumes it) or the final
    # close() re-raises it
    with pytest.raises(ValueError, match="boom at 3"):
        for i in range(20):
            pipe.submit(task, i)
        pipe.close()
    pipe.close()  # idempotent; error already consumed
    # chunks before the failure were written in order; nothing after it
    assert out.value() == b"".join(b"%d\n" % i for i in range(len(out.parts)))
    assert len(out.parts) <= 3


def test_close_idempotent_after_error():
    pipe = OutputPipeline(_BufferedOut(), workers=2)
    pipe.submit(lambda: (_ for _ in ()).throw(RuntimeError("once")))
    with pytest.raises(RuntimeError, match="once"):
        pipe.close()
    pipe.close()  # second close: error already consumed, no raise


def test_submit_after_close_raises():
    pipe = OutputPipeline(_BufferedOut(), workers=1)
    pipe.close()
    with pytest.raises(RuntimeError, match="closed"):
        pipe.submit(lambda: b"x")


def test_backpressure_bounds_in_flight():
    """With max_pending=P, at most P tasks are in flight at once: a stalled
    writer blocks the producer at exactly P outstanding submissions."""
    gate = threading.Event()
    started = []
    lock = threading.Lock()

    def task(i):
        with lock:
            started.append(i)
        gate.wait(5.0)
        return b"%d\n" % i

    out = _BufferedOut()
    max_pending = 4
    pipe = OutputPipeline(out, workers=2, max_pending=max_pending)
    submitted = []

    def producer():
        for i in range(12):
            pipe.submit(task, i)
            submitted.append(i)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    time.sleep(0.3)
    # producer must be blocked at the semaphore: exactly max_pending in flight
    assert len(submitted) == max_pending
    gate.set()
    t.join(5.0)
    assert not t.is_alive()
    pipe.close()
    assert out.value() == b"".join(b"%d\n" % i for i in range(12))


def test_context_manager_does_not_mask_body_exception():
    """An exception raised in the with-body wins even if a task also
    failed; the writer is still stopped."""
    out = _BufferedOut()
    with pytest.raises(KeyError, match="body"):
        with OutputPipeline(out, workers=2) as pipe:
            pipe.submit(lambda: (_ for _ in ()).throw(ValueError("task")))
            time.sleep(0.05)
            raise KeyError("body")


def test_single_worker_degenerates_to_serial():
    out = _TextOut()
    with OutputPipeline(out, workers=1, max_pending=1) as pipe:
        for i in range(25):
            pipe.submit(lambda i=i: b"%d;" % i)
    assert out.value() == b"".join(b"%d;" % i for i in range(25))
