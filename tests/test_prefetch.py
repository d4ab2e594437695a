"""Prefetcher semantics: ordering, transform thread, error propagation,
early-exit thread shutdown."""

import threading
import time

import pytest

from medmoe_tpu.data.prefetch import prefetch


class TestPrefetch:
    def test_preserves_order_and_exhausts(self):
        assert list(prefetch(range(17), depth=3)) == list(range(17))

    def test_depth_zero_is_synchronous_passthrough(self):
        assert list(prefetch(range(5), depth=0, transform=lambda x: x * 2)) \
            == [0, 2, 4, 6, 8]

    def test_transform_runs_on_worker_thread(self):
        main = threading.get_ident()
        seen = []

        def transform(x):
            seen.append(threading.get_ident())
            return x + 1

        assert list(prefetch(range(4), depth=2, transform=transform)) \
            == [1, 2, 3, 4]
        assert all(t != main for t in seen)

    def test_source_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("decode failed")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)

    def test_iter_exception_propagates(self):
        """An iterable whose __iter__ itself raises (e.g. shard files opened
        there) must surface to the consumer, not silently kill the worker
        thread and deadlock q.get()."""
        class BadIterable:
            def __iter__(self):
                raise FileNotFoundError("shard missing")

        with pytest.raises(FileNotFoundError, match="shard missing"):
            list(prefetch(BadIterable(), depth=2))

    def test_early_exit_stops_worker(self):
        produced = []

        def gen():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=2)
        for i, x in enumerate(it):
            if i == 3:
                break
        it.close()      # GeneratorExit → finally → stop event
        n_after_close = len(produced)
        time.sleep(0.3)
        # the worker may finish the in-flight item but must not keep going
        assert len(produced) <= n_after_close + 2

    def test_overlaps_producer_and_consumer(self):
        """With prefetch, total wall time approaches max(produce, consume)
        instead of their sum."""
        n, delay = 8, 0.02

        def slow_gen():
            for i in range(n):
                time.sleep(delay)
                yield i

        t0 = time.perf_counter()
        for _ in prefetch(slow_gen(), depth=2):
            time.sleep(delay)       # consumer work
        overlapped = time.perf_counter() - t0
        # serial would be ~2·n·delay; require at least ~25% savings
        assert overlapped < 2 * n * delay * 0.85
