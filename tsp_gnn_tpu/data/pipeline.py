"""Host-side input pipeline: background batch assembly + prefetch.

SURVEY §2.2 / §5 mandate host-parallel generation and HBM prefetch (the
reference's loop was fully synchronous Python).  The device step is the
bottleneck in steady state; this keeps batch assembly (numpy block/pad work
and the optional on-the-fly C++ labeling) off the critical path with a
bounded background queue.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class Prefetcher:
    """Wrap an iterator; a daemon thread keeps `depth` items ready.

    Exceptions in the producer propagate to the consumer on next().
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _run(self, it):
        try:
            for item in it:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    return Prefetcher(it, depth)
