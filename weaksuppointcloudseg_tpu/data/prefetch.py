"""Host-side batch prefetching: overlap batch assembly with device compute.

The reference's loop is fully serial — numpy batch assembly, feed_dict H2D,
sess.run, fetch (ShapeNet_DGCNN_trainer.py:235-314). Here a background
thread runs the (numpy-heavy) batch generator and a bounded queue keeps up
to ``depth`` batches ready; combined with JAX's async dispatch this double-
buffers H2D against the previous step's compute (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

_SENTINEL = object()


def prefetch(
    iterable: Iterable[Any],
    depth: int = 2,
    transform: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    ``transform`` (e.g. device_put / shard_batch) runs on the background
    thread too, so H2D transfer of batch t+1 overlaps step t.

    Exceptions from the producer are re-raised at the consuming site.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def producer() -> None:
        try:
            for item in iterable:
                q.put(transform(item) if transform else item)
        except BaseException as e:  # re-raise on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
