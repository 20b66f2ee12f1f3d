"""Host-side loading helpers shared by the train and eval loops."""
from __future__ import annotations

import queue
import threading


def prefetch(iterator, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue so
    host-side loading/collation overlaps device steps (the role of the
    reference's DataLoader worker processes, SURVEY.md §3.1). The C++
    data ops (uni3detr_tpu/native) release the GIL, so the worker thread
    overlaps the main thread for the pipeline's hot loops too."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    END = object()
    err: list = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surface loader errors to the consumer
            err.append(e)
        finally:
            q.put(END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            if err:
                raise err[0]
            return
        yield item
