"""Host->device prefetch: overlap H2D transfer with device compute.

The train loop's natural serialization is
    cv2 decode (host) -> device_put (relay/PCIe) -> train step (device),
and with everything issued from one thread the three phases add up:
the r5 e2e training-driver capture measured 1571 ms/step sustained at the
flagship shape against a 261 ms device step, with 650 ms/batch host decode
and 954 ms/batch H2D (queued_bench_r05/e2e_train.json).  Decode already
overlaps via the loader's worker threads (loader.py); this module moves
the *transfer* off the critical path too: a background thread pulls host
batches and dispatches device_put ahead of the consumer, so the H2D of
batch N+1 rides the wire while the device executes step N.  Steady-state
step time then tends to max(decode, H2D, step) instead of their sum.

Role parity: the reference overlaps transfer with compute through CUDA
pinned-memory + `non_blocking=True` copies issued ahead by the iteration
loop (torch DataLoader semantics, /root/reference/training/train.py's
`.cuda(non_blocking=True)` idiom); a TPU/JAX program gets the same effect
by dispatching device_put early from a prefetch thread — JAX transfers
are async once dispatched, so a queue depth of 2 suffices.

Thread-safety: jax.device_put / jnp.asarray dispatch is thread-safe, and
the underlying copy releases the GIL, so on a single-core host the
transfer overlaps the loader's cv2 work as well.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


def prefetch_to_device(iterator: Iterable[T],
                       transfer: Callable[[T], U],
                       size: int = 2) -> Iterator[U]:
    """Yield transfer(item) for each item, transferring ahead of the consumer.

    `transfer` runs on a background thread and should DISPATCH work
    (device_put / jnp.asarray / shard_batch) without blocking on results —
    the returned arrays are futures the consumer's jitted step will chain
    onto.  `size` bounds the read-ahead (device batches held in flight);
    2 is enough to hide one full transfer behind one step.

    Exceptions raised by `transfer` or the source iterator are re-raised
    at the consumer's next `next()`.  If the consumer abandons the
    generator early (preemption exit, test teardown), closing it unblocks
    and joins the worker thread.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def _worker():
        try:
            for item in iterator:
                out = transfer(item)
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — relay errors must surface
            try:
                q.put(e, timeout=1.0)
            except queue.Full:
                pass

    t = threading.Thread(target=_worker, daemon=True,
                         name="device-prefetch")
    t.start()
    try:
        while True:
            out = q.get()
            if out is _SENTINEL:
                break
            if isinstance(out, BaseException):
                raise out
            yield out
    finally:
        stop.set()
        # drain one slot so a blocked put() wakes and sees stop
        try:
            q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)
