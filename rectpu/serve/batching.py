"""Request micro-batching for the prediction server.

The reference delegates online serving to ML Engine, which batches
concurrent prediction requests server-side before running the SavedModel
(/root/reference/scripts/mle_deploy.sh + distributed.md). Our equivalent:
a `MicroBatcher` that coalesces concurrent `/predict` requests into one
device call. This matters doubly on TPU: each dispatch pays the host->device
launch latency (~30 ms over a tunnel), and a single [sum(n_i)]-row apply
keeps the MXU busier than k tiny applies.

Mechanics: request threads encode their features (pure-CPU, parallel), then
enqueue `(encoded_batch, event)` and block. A single dispatcher thread takes
the first waiting request, keeps draining the queue until `max_batch` rows
are gathered or `max_delay_ms` has elapsed since that first request, then
concatenates, runs ONE `apply_encoded`, splits the outputs by row offsets,
and wakes every waiter. Errors in the device call propagate to all requests
in the batch; encode errors stay per-request (raised before enqueue).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import numpy as np

from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class _Pending:
    batch: dict
    n: int
    done: threading.Event = field(default_factory=threading.Event)
    result: dict | None = None
    error: BaseException | None = None


class MicroBatcher:
    """Coalesces concurrent predict() calls into single device dispatches.

    Drop-in for ``ServingModel.predict``: ``MicroBatcher(served).predict(...)``
    returns exactly what ``served.predict(...)`` would. Stats counters
    (``requests_served``, ``batches_dispatched``, ``rows_dispatched``) let
    callers observe coalescing.
    """

    def __init__(self, served, max_batch: int | None = None,
                 max_delay_ms: float = 2.0, start: bool = True):
        self.served = served
        self.max_batch = max_batch if max_batch is not None else served.max_batch
        self.max_delay_s = max_delay_ms / 1e3
        self._lock = threading.Condition()
        self._queue: list[_Pending] = []
        self._closed = False
        self.requests_served = 0
        self.batches_dispatched = 0
        self.rows_dispatched = 0
        self._thread: threading.Thread | None = None
        if start:
            self._thread = threading.Thread(
                target=self._run, name="microbatcher", daemon=True
            )
            self._thread.start()

    # -- request side ------------------------------------------------------

    def predict(self, features: dict) -> dict:
        batch = self.served.encode_request(features)  # raises per-request
        item = _Pending(batch, batch["cat_ids"].shape[0])
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append(item)
            self._lock.notify()
        item.done.wait()
        if item.error is not None:
            raise item.error
        return item.result

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- dispatcher side ---------------------------------------------------

    def _take_batch(self) -> list[_Pending]:
        """Block until work exists, then drain until max_batch rows or the
        delay window (measured from the first request taken) closes."""
        with self._lock:
            while not self._queue and not self._closed:
                self._lock.wait()
            if self._closed and not self._queue:
                return []
            items = [self._queue.pop(0)]
        rows = items[0].n
        deadline = time.monotonic() + self.max_delay_s
        while rows < self.max_batch:
            with self._lock:
                while self._queue and rows < self.max_batch:
                    items.append(self._queue.pop(0))
                    rows += items[-1].n
            remaining = deadline - time.monotonic()
            if remaining <= 0 or rows >= self.max_batch:
                break
            with self._lock:
                if not self._queue and not self._closed:
                    self._lock.wait(timeout=remaining)
                if self._closed and not self._queue:
                    break
        return items

    def _dispatch(self, items: list[_Pending]) -> None:
        try:
            if len(items) == 1:
                b, n = items[0].batch, items[0].n
            else:
                keys = items[0].batch.keys()
                b = {k: np.concatenate([it.batch[k] for it in items]) for k in keys}
                n = sum(it.n for it in items)
            out = self.served.apply_encoded(b, n)
            off = 0
            for it in items:
                it.result = {k: v[off:off + it.n] for k, v in out.items()}
                off += it.n
        except BaseException as e:  # propagate to every waiter in the batch
            for it in items:
                it.error = e
        finally:
            self.batches_dispatched += 1
            self.rows_dispatched += sum(it.n for it in items)
            self.requests_served += len(items)
            for it in items:
                it.done.set()

    def _run(self) -> None:
        while True:
            items = self._take_batch()
            if not items:
                return
            self._dispatch(items)
