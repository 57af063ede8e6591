"""RWLock (utils/locks.py): the vocab-layout gate's primitive."""

import threading
import time

from cadence_rag_tpu.utils.locks import RWLock


class TestRWLock:
    def test_concurrent_readers(self):
        lock = RWLock()
        inside = []
        barrier = threading.Barrier(3, timeout=5)

        def reader():
            with lock.read():
                barrier.wait()  # all three must be inside simultaneously
                inside.append(1)

        threads = [threading.Thread(target=reader) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=5)
        assert len(inside) == 3

    def test_writer_excludes_readers(self):
        lock = RWLock()
        order = []

        def writer():
            with lock.write():
                order.append("w_in")
                time.sleep(0.05)
                order.append("w_out")

        def reader():
            with lock.read():
                order.append("r")

        w = threading.Thread(target=writer)
        w.start()
        time.sleep(0.01)  # writer holds the lock
        r = threading.Thread(target=reader)
        r.start()
        w.join(timeout=5)
        r.join(timeout=5)
        assert order == ["w_in", "w_out", "r"]

    def test_waiting_writer_blocks_new_readers(self):
        """Writer preference: a reader arriving while a writer waits must
        queue behind the writer (no writer starvation)."""
        lock = RWLock()
        order = []
        first_reader_in = threading.Event()
        release_first_reader = threading.Event()

        def first_reader():
            with lock.read():
                first_reader_in.set()
                release_first_reader.wait(timeout=5)
            order.append("r1_out")

        def writer():
            with lock.write():
                order.append("w")

        def second_reader():
            with lock.read():
                order.append("r2")

        r1 = threading.Thread(target=first_reader)
        r1.start()
        first_reader_in.wait(timeout=5)
        w = threading.Thread(target=writer)
        w.start()
        time.sleep(0.02)  # writer is now waiting on r1
        r2 = threading.Thread(target=second_reader)
        r2.start()
        time.sleep(0.02)
        release_first_reader.set()
        for t in (r1, w, r2):
            t.join(timeout=5)
        assert order == ["r1_out", "w", "r2"]
