"""Native C++ runtime tests: blocking queue, task-DAG pool, ordered
multi-queue engine — behavior must match the Python reference
implementations (reference: blocking_queue_test.cc, task_test.cc,
thread_pool, ordered_multi_queue_test.cc)."""

import threading
import time

import pytest

from cartographer_tpu import runtime
from cartographer_tpu.sensor.collator import OrderedMultiQueue, QueueKey

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime could not be built")


class TestNativeBlockingQueue:
    def test_fifo(self):
        q = runtime.NativeBlockingQueue()
        for i in range(5):
            q.push(f"item{i}")
        assert len(q) == 5
        assert [q.pop() for _ in range(5)] == [f"item{i}" for i in range(5)]

    def test_pop_timeout(self):
        q = runtime.NativeBlockingQueue()
        with pytest.raises(TimeoutError):
            q.pop(timeout_ms=50)

    def test_cross_thread(self):
        q = runtime.NativeBlockingQueue(capacity=2)
        results = []

        def consumer():
            for _ in range(10):
                results.append(q.pop())

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(10):
            q.push(i)
        t.join(timeout=5)
        assert results == list(range(10))


class TestNativeThreadPool:
    def test_runs_tasks(self):
        pool = runtime.NativeThreadPool(2)
        done = []
        lock = threading.Lock()
        ids = []
        for i in range(8):
            tid = pool.create_task(lambda i=i: (time.sleep(0.01), done.append(i)))
            ids.append(tid)
        for tid in ids:
            pool.schedule(tid)
        pool.wait_idle()
        assert sorted(done) == list(range(8))
        pool.shutdown()

    def test_dependencies_order(self):
        pool = runtime.NativeThreadPool(3)
        order = []
        lock = threading.Lock()

        def record(name):
            with lock:
                order.append(name)

        a = pool.create_task(lambda: (time.sleep(0.05), record("a")))
        b = pool.create_task(lambda: record("b"))
        pool.add_dependency(b, a)  # b waits for a
        pool.schedule(b)
        pool.schedule(a)
        pool.wait_idle()
        assert order == ["a", "b"]
        pool.shutdown()

    def test_diamond_dag(self):
        pool = runtime.NativeThreadPool(4)
        order = []
        lock = threading.Lock()

        def rec(x):
            with lock:
                order.append(x)

        root = pool.create_task(lambda: rec("root"))
        mid1 = pool.create_task(lambda: rec("m1"))
        mid2 = pool.create_task(lambda: rec("m2"))
        leaf = pool.create_task(lambda: rec("leaf"))
        pool.add_dependency(mid1, root)
        pool.add_dependency(mid2, root)
        pool.add_dependency(leaf, mid1)
        pool.add_dependency(leaf, mid2)
        for t in (leaf, mid2, mid1, root):
            pool.schedule(t)
        pool.wait_idle()
        assert order[0] == "root" and order[-1] == "leaf"
        pool.shutdown()


class TestNativeOrderedMultiQueue:
    def test_matches_python_reference(self):
        """Drive native and Python implementations identically; the dispatch
        sequences must be equal."""
        script = [
            ("add", "a", 1, "a1"), ("add", "a", 3, "a3"),
            ("add", "b", 2, "b2"), ("add", "b", 4, "b4"),
            ("add", "a", 5, "a5"), ("finish", "b"), ("finish", "a"),
        ]
        results = {}
        for impl_name, q in [
            ("native", runtime.NativeOrderedMultiQueue()),
            ("python", OrderedMultiQueue()),
        ]:
            out = []
            for name in ["a", "b"]:
                key = QueueKey(0, name)
                q.add_queue(key, lambda t, d: out.append((t, d)))
            for op in script:
                if op[0] == "add":
                    q.add(QueueKey(0, op[1]), op[2], op[3])
                else:
                    q.mark_queue_as_finished(QueueKey(0, op[1]))
            results[impl_name] = out
        assert results["native"] == results["python"]
        assert [t for t, _ in results["native"]] == sorted(
            t for t, _ in results["native"])

    def test_blocker(self):
        q = runtime.NativeOrderedMultiQueue()
        q.add_queue(QueueKey(0, "a"), lambda t, d: None)
        q.add_queue(QueueKey(0, "b"), lambda t, d: None)
        q.add(QueueKey(0, "a"), 1, "x")
        assert q.blocker == QueueKey(0, "b")

    def test_unknown_queue_dropped(self):
        q = runtime.NativeOrderedMultiQueue()
        q.add(QueueKey(0, "nope"), 1, "x")  # no error
