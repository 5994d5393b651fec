"""Request coalescer: the windowed batcher that feeds the device.

Reference S4 (``server/query_service.h:130-167``, ``query_service.cpp:
587-636``): wait up to ``window`` or until ``max_batch`` requests, drain,
run one batched operation. Crucially, the reference's Search never feeds its
queue (SURVEY.md §2.6) — every RPC runs its own per-query device round trip.
Here coalescing IS the hot path: concurrent Search RPCs for the same index
merge into one fixed-shape device batch (padded to the bucket sizes in
``utils/batching.py``), which is what keeps the MXU fed and compile caches
warm.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import threading
import time
from typing import Any, Callable


@dataclasses.dataclass
class _Pending:
    payload: Any
    future: concurrent.futures.Future
    enqueued_at: float


class RequestCoalescer:
    """Generic windowed batcher.

    ``batch_fn(payloads) -> results`` is called with the drained batch on a
    worker thread; result i resolves future i. Exceptions fail the whole
    drained batch (callers see the error, as with the reference's promise
    scatter, ``query_service.cpp:380-401``).
    """

    def __init__(
        self,
        batch_fn: Callable[[list], list],
        window_s: float = 0.002,
        max_batch: int = 64,
        name: str = "coalescer",
    ):
        self.batch_fn = batch_fn
        self.window_s = window_s
        self.max_batch = max_batch
        self._queue: list[_Pending] = []
        self._lock = threading.Lock()
        self._kick = threading.Condition(self._lock)
        self._stop = False
        self._worker = threading.Thread(
            target=self._loop, name=name, daemon=True
        )
        self._batches = 0
        self._items = 0
        self._worker.start()

    # ------------------------------------------------------------------ #

    def submit(self, payload) -> concurrent.futures.Future:
        fut: concurrent.futures.Future = concurrent.futures.Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("coalescer stopped")
            self._queue.append(_Pending(payload, fut, time.monotonic()))
            self._kick.notify()
        return fut

    def stats(self) -> dict:
        with self._lock:
            return {
                "batches": self._batches,
                "items": self._items,
                "avg_batch": self._items / max(self._batches, 1),
                "queued": len(self._queue),
            }

    def stop(self) -> None:
        with self._lock:
            self._stop = True
            self._kick.notify_all()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------ #

    def _loop(self) -> None:
        while True:
            with self._lock:
                while not self._queue and not self._stop:
                    self._kick.wait()
                if self._stop and not self._queue:
                    return
                # Window: wait for more work until window expiry or full
                # batch (reference loop, ``query_service.cpp:587-636``).
                deadline = self._queue[0].enqueued_at + self.window_s
                while (
                    len(self._queue) < self.max_batch
                    and not self._stop
                ):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._kick.wait(timeout=remaining)
                batch = self._queue[: self.max_batch]
                self._queue = self._queue[self.max_batch:]
                self._batches += 1
                self._items += len(batch)
            try:
                results = self.batch_fn([p.payload for p in batch])
                for p, r in zip(batch, results):
                    p.future.set_result(r)
            except Exception as e:  # noqa: BLE001 — fail the whole batch
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
