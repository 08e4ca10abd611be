"""Double-buffered host->device input pipeline.

Replaces the reference's DataLoader worker processes
(tools/train.py:42-57, num_workers=4): a background thread assembles the
next batch and starts its host->device transfer while the device executes
the current step, so host time (voxelize/collate, the CPU hot loop of
SURVEY §3.1) and device time overlap instead of adding. JAX dispatch is
async, so the consumer's step k runs on-device while the worker builds
k+1..k+depth.

Multi-host: FusionDataset.batches() splits the (identically shuffled)
epoch order by jax.process_index()/process_count(), so each host streams
a disjoint shard — data parallelism across hosts is code, not prose.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


def prefetch(
    batches: Iterable,
    transform: Callable | None = None,
    depth: int = 2,
) -> Iterator:
    """Iterate ``batches`` with a ``depth``-deep background pipeline.

    transform (e.g. ``lambda b: shard(to_device(b))``) runs in the worker
    thread, so the transfer of batch k+1 overlaps the device's step k.
    Worker exceptions re-raise at the consumer. The worker is a daemon:
    abandoning the iterator early leaks at most ``depth`` buffered
    batches, not a thread (it exits once the queue drains or the process
    ends).
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    errors: list[BaseException] = []

    def worker():
        try:
            for b in batches:
                q.put(transform(b) if transform is not None else b)
        except BaseException as e:  # re-raised on the consumer side
            errors.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if errors:
                raise errors[0]
            return
        yield item


def process_shard(n: int):
    """(start, stop) slice bounds of this host's equal-length shard of n
    samples (remainder dropped so every host runs the same step count)."""
    import jax

    idx, count = jax.process_index(), jax.process_count()
    per = n // count
    return idx * per, (idx + 1) * per
