"""Background prefetch pipeline (data_io/prefetch.py)."""

import threading
import time

import pytest

from fgvc_tpu.data_io.prefetch import prefetch_iter


def test_order_preserved():
    assert list(prefetch_iter(iter(range(20)), depth=3)) == list(range(20))


def test_runs_on_worker_thread():
    main = threading.get_ident()
    seen = []

    def gen():
        for i in range(5):
            seen.append(threading.get_ident() == main)
            yield i

    assert list(prefetch_iter(gen())) == list(range(5))
    assert seen == [False] * 5


def test_exception_propagates():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_iter(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_abandoned_consumer_stops_worker():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch_iter(gen(), depth=1)
    assert next(it) == 0
    it.close()  # consumer walks away
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # worker stopped producing
    assert n < 100  # ... and long before exhausting the iterator


def test_depth_validation():
    with pytest.raises(ValueError):
        next(prefetch_iter([], depth=0))
