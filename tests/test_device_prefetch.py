"""device_prefetch: ordering, read-ahead, error propagation, cleanup."""

import threading
import time

import pytest

from gava_clip_tpu.data.device_prefetch import prefetch_to_device


def test_order_and_values():
    out = list(prefetch_to_device(iter(range(20)), lambda x: x * 2, size=3))
    assert out == [x * 2 for x in range(20)]


def test_reads_ahead_of_consumer():
    """With size=2 the worker should be ~2 items ahead of a slow consumer."""
    produced = []

    def transfer(x):
        produced.append(x)
        return x

    it = prefetch_to_device(iter(range(10)), transfer, size=2)
    first = next(it)
    assert first == 0
    deadline = time.time() + 5.0
    # after one consume, the worker can hold: queue full (2) + 1 in-hand
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 3
    assert list(it) == list(range(1, 10))


def test_transfer_error_propagates():
    def transfer(x):
        if x == 3:
            raise RuntimeError("relay fell over")
        return x

    it = prefetch_to_device(iter(range(10)), transfer, size=2)
    got = []
    with pytest.raises(RuntimeError, match="relay fell over"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]


def test_source_error_propagates():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = prefetch_to_device(gen(), lambda x: x, size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_early_close_joins_worker():
    n_threads_before = threading.active_count()
    it = prefetch_to_device(iter(range(1000)), lambda x: x, size=2)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > n_threads_before and \
            time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_threads_before


def test_size_must_be_positive():
    with pytest.raises(ValueError):
        next(prefetch_to_device(iter([1]), lambda x: x, size=0))
