"""Hybrid CPU+TPU training sampler with adaptive work splitting.

Rebuild of the reference's ``MixedGraphSageSampler`` + ``SampleJob``
(srcs/python/quiver/pyg/sage_sampler.py:180-376): user code hands over an
indexable, shuffleable job; CPU workers and the device sampler pull
tasks concurrently, and the split adapts to their measured per-batch
times (``decide_task_num`` sage_sampler.py:272-288). The reference
spawns processes with mp.Queue; here CPU workers are threads driving
the native (C++) sampler — numpy/native code releases the GIL — and the
device path is the jitted sampler, so the TPU keeps sampling while CPU
workers fill their queue.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Sequence

import numpy as np

from .sampler import NeighborSampler


class SampleJob:
    """Job contract (reference sage_sampler.py:180-195): subclass or wrap
    any indexable batch source with ``shuffle()`` support."""

    def __init__(self, seeds, batch_size: int, seed: int = 0):
        self.seeds = np.asarray(seeds)
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.seeds) + self.batch_size - 1) // self.batch_size

    def __getitem__(self, i):
        return self.seeds[i * self.batch_size:(i + 1) * self.batch_size]

    def shuffle(self):
        self.rng.shuffle(self.seeds)


class MixedSampler:
    """Iterate sampled batches from TPU and CPU samplers concurrently.

    Modes (reference sage_sampler.py:229): ``TPU_CPU_MIXED`` (default),
    ``TPU_ONLY``, ``CPU_ONLY``. Each epoch iteration yields
    ``(batch, source)`` pairs; the CPU/TPU task split adapts to the
    measured average sample times, like the reference's
    ``decide_task_num``.
    """

    # Reference mode strings (sage_sampler.py:229) accepted as migration
    # aliases: on TPU both the UVA (host-pinned graph) and GPU (HBM graph)
    # device modes collapse onto the HBM-resident TPU sampler.
    _MODE_ALIASES = {
        "UVA_CPU_MIXED": "TPU_CPU_MIXED",
        "GPU_CPU_MIXED": "TPU_CPU_MIXED",
        "UVA_ONLY": "TPU_ONLY",
        "GPU_ONLY": "TPU_ONLY",
    }

    def __init__(self, csr_topo, sizes: Sequence[int], job: SampleJob,
                 mode: str = "TPU_CPU_MIXED", num_cpu_workers: int = 2,
                 seed: int = 0, reshuffle_each_epoch: bool = True,
                 **sampler_kw):
        mode = self._MODE_ALIASES.get(mode, mode)
        if mode not in ("TPU_CPU_MIXED", "TPU_ONLY", "CPU_ONLY"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.job = job
        self.reshuffle_each_epoch = reshuffle_each_epoch
        self._epoch = 0
        self.num_cpu_workers = num_cpu_workers if "CPU" in mode else 0
        self.tpu_sampler = (NeighborSampler(csr_topo, sizes, mode="TPU",
                                            seed=seed, **sampler_kw)
                            if mode != "CPU_ONLY" else None)
        self.cpu_samplers = [
            NeighborSampler(csr_topo, sizes, mode="CPU", seed=seed + 1 + w,
                            **sampler_kw)
            for w in range(self.num_cpu_workers)]
        self.avg_tpu_ms = None
        self.avg_cpu_ms = None

    def __iter__(self):
        self.job.shuffle()
        # refresh the window family between epochs so window-sampling
        # marginals stay uniform over shuffles (kernels.py window docs)
        if (self.reshuffle_each_epoch and self._epoch > 0
                and self.tpu_sampler is not None):
            self.tpu_sampler.reshuffle()
        self._epoch += 1
        n_tasks = len(self.job)
        if self.mode == "TPU_ONLY" or not self.cpu_samplers:
            for i in range(n_tasks):
                t0 = time.perf_counter()
                b = self.tpu_sampler.sample(self.job[i])
                self._obs("tpu", t0)
                yield b, "tpu"
            return
        if self.mode == "CPU_ONLY":
            yield from self._cpu_only(n_tasks)
            return

        # mixed: CPU workers pull from the back, device from the front.
        task_q = queue.Queue()
        out_q = queue.Queue()
        cpu_share = self._cpu_share()
        n_cpu = int(n_tasks * cpu_share)
        for i in range(n_tasks - n_cpu, n_tasks):
            task_q.put(i)

        def worker(s):
            while True:
                try:
                    i = task_q.get_nowait()
                except queue.Empty:
                    return
                t0 = time.perf_counter()
                b = s.sample(self.job[i])
                self._obs("cpu", t0)
                out_q.put((b, "cpu"))

        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in self.cpu_samplers]
        for t in threads:
            t.start()

        emitted = 0
        for i in range(n_tasks - n_cpu):
            t0 = time.perf_counter()
            b = self.tpu_sampler.sample(self.job[i])
            self._obs("tpu", t0)
            yield b, "tpu"
            emitted += 1
            while not out_q.empty():
                yield out_q.get()
                emitted += 1
        for t in threads:
            t.join()
        while emitted < n_tasks:
            yield out_q.get()
            emitted += 1

    def _cpu_only(self, n_tasks):
        task_q = queue.Queue()
        out_q = queue.Queue()
        for i in range(n_tasks):
            task_q.put(i)

        def worker(s):
            while True:
                try:
                    i = task_q.get_nowait()
                except queue.Empty:
                    return
                t0 = time.perf_counter()
                out_q.put((s.sample(self.job[i]), "cpu"))
                self._obs("cpu", t0)

        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in self.cpu_samplers]
        for t in threads:
            t.start()
        for _ in range(n_tasks):
            yield out_q.get()
        for t in threads:
            t.join()

    def _obs(self, kind, t0):
        dt = (time.perf_counter() - t0) * 1e3
        attr = f"avg_{kind}_ms"
        prev = getattr(self, attr)
        setattr(self, attr, dt if prev is None else 0.8 * prev + 0.2 * dt)

    def _cpu_share(self) -> float:
        """Adaptive split (reference decide_task_num sage_sampler.py:272):
        give the CPU pool work proportional to its measured speed."""
        if self.avg_tpu_ms is None or self.avg_cpu_ms is None:
            return min(0.25, self.num_cpu_workers * 0.1)
        cpu_rate = self.num_cpu_workers / max(self.avg_cpu_ms, 1e-6)
        tpu_rate = 1.0 / max(self.avg_tpu_ms, 1e-6)
        return float(cpu_rate / (cpu_rate + tpu_rate))
