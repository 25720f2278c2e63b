"""Workload-aware GNN serving: size-predictive routing + hybrid workers.

Rebuild of the reference serving stack (srcs/python/quiver/serving.py):

  RequestBatcher   (serving.py:10-99)  — routes each request by its
      predicted sampled-subgraph size (``np.take(neighbour_num, item)
      .sum() > threshold`` serving.py:90): big requests to the device
      queue, small ones to the CPU queue.
  HybridSampler    (serving.py:101-147) — pool of CPU sampler workers
      feeding pre-sampled results.
  InferenceServer  (serving.py:150-360) — device loop: sample (or take
      pre-sampled) -> feature gather -> model forward; ``ServerMetrics``
      is the InferenceServer_Debug accounting (avg/p99 latency,
      throughput, serving.py:307-323).

Process model: the reference spawns one process per GPU with
mp.Manager queues + CUDA IPC; on TPU one process drives every local
chip, so the stack is thread + queue.Queue based — device dispatch is
async (the TPU works while Python batches), and CPU sampler workers
release the GIL inside numpy.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

_STOP = object()


@dataclass
class ServerMetrics:
    """Latency/throughput accounting (reference serving.py:307-323)."""
    latencies_ms: List[float] = field(default_factory=list)
    batch_sizes: List[int] = field(default_factory=list)
    started: float = field(default_factory=time.time)

    def record(self, t_enqueue: float, n: int):
        self.latencies_ms.append((time.time() - t_enqueue) * 1e3)
        self.batch_sizes.append(n)

    def summary(self) -> dict:
        lat = np.asarray(self.latencies_ms) if self.latencies_ms else np.zeros(1)
        dur = max(time.time() - self.started, 1e-9)
        return {
            "requests": len(self.latencies_ms),
            "avg_ms": float(lat.mean()),
            "p50_ms": float(np.percentile(lat, 50)),
            "p99_ms": float(np.percentile(lat, 99)),
            "throughput_rps": len(self.latencies_ms) / dur,
            "seeds_per_s": float(np.sum(self.batch_sizes) / dur),
        }


class RequestBatcher:
    """Route requests to the device or CPU queue by predicted cost.

    Args:
      stream_queue: input queue of (request_id, seed_array).
      neighbour_num: per-node predicted subgraph size table
        (``generate_neighbour_num``); None disables auto routing.
      threshold: total predicted size above which a request goes to the
        device path (reference auto_despatch serving.py:72-95).
      mode: 'auto' | 'device' | 'cpu' (reference Auto/GPU/CPU).
    """

    def __init__(self, stream_queue: queue.Queue, neighbour_num=None,
                 threshold: float = 0.0, mode: str = "auto"):
        self.stream_queue = stream_queue
        self.neighbour_num = (None if neighbour_num is None
                              else np.asarray(neighbour_num))
        self.threshold = threshold
        self.mode = mode
        self.device_queue: queue.Queue = queue.Queue()
        self.cpu_queue: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    def _route(self, seeds) -> queue.Queue:
        if self.mode == "device":
            return self.device_queue
        if self.mode == "cpu":
            return self.cpu_queue
        if self.neighbour_num is None:
            return self.device_queue
        cost = float(np.take(self.neighbour_num, seeds, mode="clip").sum())
        return self.device_queue if cost > self.threshold else self.cpu_queue

    def _dispatch(self):
        while True:
            item = self.stream_queue.get()
            if item is _STOP:
                self.device_queue.put(_STOP)
                self.cpu_queue.put(_STOP)
                return
            req_id, seeds, t_enq = item
            self._route(np.asarray(seeds)).put((req_id, np.asarray(seeds),
                                                t_enq))

    def stop(self):
        self.stream_queue.put(_STOP)


class HybridSampler:
    """CPU sampler worker pool feeding pre-sampled batches
    (reference HybridSampler serving.py:101-147)."""

    def __init__(self, cpu_queue: queue.Queue, sampler_factory: Callable,
                 num_workers: int = 2):
        self.cpu_queue = cpu_queue
        self.sampled_queue: queue.Queue = queue.Queue()
        self._workers = []
        for w in range(num_workers):
            t = threading.Thread(target=self._loop,
                                 args=(sampler_factory(),), daemon=True)
            t.start()
            self._workers.append(t)

    def _loop(self, sampler):
        while True:
            item = self.cpu_queue.get()
            if item is _STOP:
                self.cpu_queue.put(_STOP)   # let sibling workers see it too
                self.sampled_queue.put(_STOP)
                return
            req_id, seeds, t_enq = item
            batch = sampler.sample(seeds)
            self.sampled_queue.put((req_id, seeds, batch, t_enq))


class InferenceServer:
    """Device inference loop consuming both routed queues
    (reference InferenceServer serving.py:150-360).

    ``infer_fn(seeds, presampled_batch_or_None) -> outputs`` owns the
    device work: sample on device when given raw seeds, else use the
    CPU-sampled batch; then feature-gather + model forward.

    All device work runs on ONE thread: a single device executes
    serially anyway, and JAX dispatch from concurrent threads is not
    supported on every backend. The thread drains the device queue with
    priority and falls back to CPU-presampled batches (the reference
    instead dedicates processes per GPU, serving.py:186-230).

    ``coalesce_max_seeds > 0`` enables continuous batching: waiting
    device-queue requests are merged into one padded inference up to
    that many seeds, then split back per request — amortizing dispatch
    and compile-bucket costs across small requests.
    """

    def __init__(self, device_queue: queue.Queue,
                 sampled_queue: Optional[queue.Queue],
                 infer_fn: Callable, result_queue: Optional[queue.Queue] = None,
                 coalesce_max_seeds: int = 0):
        self.device_queue = device_queue
        self.sampled_queue = sampled_queue
        self.infer_fn = infer_fn
        self.result_queue = result_queue or queue.Queue()
        self.coalesce_max_seeds = coalesce_max_seeds
        self.metrics = ServerMetrics()
        self._threads = [threading.Thread(target=self._loop, daemon=True)]
        for t in self._threads:
            t.start()

    def _serve_device_items(self, items):
        if len(items) == 1 or not self.coalesce_max_seeds:
            for req_id, seeds, t_enq in items:
                out = self.infer_fn(seeds, None)
                self.metrics.record(t_enq, len(seeds))
                self.result_queue.put((req_id, out))
            return
        merged = np.concatenate([s for _, s, _ in items])
        outs = self.infer_fn(merged, None)
        off = 0
        for req_id, seeds, t_enq in items:
            self.metrics.record(t_enq, len(seeds))
            self.result_queue.put((req_id, outs[off: off + len(seeds)]))
            off += len(seeds)

    def _loop(self):
        stopped = False
        while True:
            item = None
            try:
                if self.sampled_queue is None:
                    # no fallback queue to poll: block instead of spinning
                    item = self.device_queue.get(timeout=0.05)
                else:
                    item = self.device_queue.get_nowait()
            except queue.Empty:
                pass
            if item is None and self.sampled_queue is not None:
                try:
                    got = self.sampled_queue.get(timeout=0.002)
                    if got is _STOP:
                        if stopped:      # both queues drained + stopped
                            self.result_queue.put(_STOP)
                            return
                        got = None
                    if got is not None:
                        req_id, seeds, batch, t_enq = got
                        out = self.infer_fn(seeds, batch)
                        self.metrics.record(t_enq, len(seeds))
                        self.result_queue.put((req_id, out))
                        continue
                except queue.Empty:
                    pass
            if item is None:
                if stopped and self.sampled_queue is None:
                    self.result_queue.put(_STOP)
                    return
                continue
            if item is _STOP:
                if self.sampled_queue is None:
                    self.result_queue.put(_STOP)
                    return
                stopped = True
                continue
            items = [item]
            total = len(item[1])
            while self.coalesce_max_seeds and total < self.coalesce_max_seeds:
                try:
                    nxt = self.device_queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is _STOP:
                    self.device_queue.put(_STOP)  # reprocess next round
                    break
                items.append(nxt)
                total += len(nxt[1])
            self._serve_device_items(items)

    def join(self, timeout=None):
        for t in self._threads:
            t.join(timeout)
