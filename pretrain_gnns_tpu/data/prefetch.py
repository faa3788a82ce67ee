"""Background-thread input pipeline: overlap host packing with device steps.

The reference overlaps collation with GPU compute via torch DataLoader
worker processes (chem/pretrain_masking.py:124). Here the packers release
the GIL for their hot loops (numpy slicing / the C++ packer), so a single
daemon thread pulling the loader ahead of the training loop gives the same
overlap without process forking: while the device runs step N, the thread
packs batches N+1..N+depth into a bounded queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator


class _End:
    pass


class _Err:
    def __init__(self, e: BaseException):
        self.e = e


def prefetch(iterable: Iterable[Any], depth: int = 3) -> Iterator[Any]:
    """Iterate ``iterable`` on a daemon thread, ``depth`` items ahead.
    Exceptions raised by the producer re-raise at the consuming site."""
    q: "queue.Queue[Any]" = queue.Queue(maxsize=max(depth, 1))

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surfaced to the consumer
            q.put(_Err(e))
            return
        q.put(_End())

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, _End):
            return
        if isinstance(item, _Err):
            raise item.e
        yield item


def chunked(iterator: Iterator[Any], k: int) -> Iterator[list]:
    """Group consecutive items into lists of exactly ``k``; a final short
    group (< k) is yielded as-is — callers route it to the single-step
    path to keep compiled shapes fixed."""
    buf: list = []
    for item in iterator:
        buf.append(item)
        if len(buf) == k:
            yield buf
            buf = []
    if buf:
        yield buf
