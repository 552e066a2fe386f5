"""Host input pipeline: remap + prefetch off the device's critical path.

The tiered engine wants ids translated to frequency-ordered rows
(:mod:`cuembed_tpu.utils.frequency`), and measurement shows a
device-side remap gather costs about as much as the lookup itself
(docs/PERF_NOTES.md). The production placement is the input pipeline:
a background thread pulls raw batches from a source, applies the remap
with the native C++ kernel when built (:mod:`cuembed_tpu.native`),
uploads to the device, and keeps ``depth`` batches in flight so the
accelerator never waits on the host. The analog of the host side the
reference leaves to its callers (its benchmark pre-stages everything,
``manual_benchmark.cu:190-197``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Union

import numpy as np

from cuembed_tpu import native

Batch = Union[np.ndarray, Dict[str, np.ndarray]]


class InputPipeline:
    """Background prefetcher with id->row remapping.

    Args:
      source: callable returning the next raw batch — either one index
        array or a dict of named arrays (multi-table). Called from the
        worker thread.
      remap: optional remap vector, or dict of per-name remap vectors
        (names missing from the dict pass through).
      depth: number of prepared batches to keep in flight.
      device_put: optional callable applied to each prepared batch from
        the worker thread (e.g. ``jax.device_put`` or a sharding put);
        None leaves batches as numpy.
    """

    def __init__(
        self,
        source: Callable[[], Batch],
        *,
        remap: Optional[Union[np.ndarray, Dict[str, np.ndarray]]] = None,
        depth: int = 2,
        device_put: Optional[Callable] = None,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._source = source
        self._remap = remap
        self._device_put = device_put
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _apply_remap(self, batch: Batch) -> Batch:
        if self._remap is None:
            return batch
        if isinstance(batch, dict):
            rm = self._remap if isinstance(self._remap, dict) else None
            out = {}
            for name, arr in batch.items():
                r = rm.get(name) if rm is not None else self._remap
                out[name] = (
                    native.remap_indices(arr, r) if r is not None else arr
                )
            return out
        return native.remap_indices(batch, self._remap)

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._apply_remap(self._source())
                if self._device_put is not None:
                    batch = self._device_put(batch)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next get()
            self._error = e

    def get(self, timeout: Optional[float] = 30.0) -> Batch:
        """Next prepared batch (blocks until the worker has one).

        Already-prepared batches are drained before a worker error (or a
        source ``StopIteration``) is surfaced.
        """
        while True:
            try:
                return self._queue.get_nowait()
            except queue.Empty:
                pass
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=0.1)
            except queue.Empty:
                if timeout is not None:
                    timeout -= 0.1
                    if timeout <= 0:
                        raise TimeoutError("input pipeline starved")

    def __iter__(self) -> Iterator[Batch]:
        while True:
            try:
                yield self.get()
            except StopIteration:
                return

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False
