"""Host<->device transfer discipline for the remote-TPU (tunneled) path.

On a tunneled PJRT backend every synchronous per-leaf device->host copy is a
full RPC round trip, and fetching an array whose computation settled long ago
can take *seconds* (the runtime falls off the execution-reply fast path).
`jax.device_get` on a pytree walks leaves sequentially, paying that cost per
leaf.

`fetch` fixes both: it starts a non-blocking `copy_to_host_async` on every
leaf first (all transfers ride one round trip, issued while the arrays are
still hot), then materializes. Measured on the tunnel: 12-leaf fetch
275 s -> 0.03 s.

Use `fetch` for every readback cluster; never call `np.asarray` /
`jax.device_get` directly on multiple device arrays in host control flow.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

import jax

__all__ = ["fetch", "prefetch", "fetch_future"]


def prefetch(tree) -> None:
    """Start non-blocking device->host copies for every leaf.

    Call right after dispatching a program whose results are consumed a
    frame later: the transfers ride the execution completion, so the later
    `fetch` returns in ~0 instead of a full round trip."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass


def fetch(tree):
    """device_get with all leaf transfers started asynchronously first."""
    prefetch(tree)
    return jax.device_get(tree)


# Several IO threads: each per-frame readback pays the tunnel's ~28 ms RPC
# round trip, and a single worker serializes those round trips — capping
# the whole pipeline at ~36 fps no matter how fast the device runs
# (measured round 3: fused_fetch median 64 ms behind one worker at a 46%
# keyframe cadence). Round trips for different frames are independent
# (PJRT clients are thread-safe for concurrent transfers) and device_get
# releases the GIL while blocked, so 4 workers overlap them cleanly even
# on the 1-core host. Completion order doesn't matter: every in-flight
# frame record holds its own Future.
_FETCH_WORKERS = 4
_fetch_pool: ThreadPoolExecutor | None = None


def fetch_future(tree) -> Future:
    """Start a `fetch` on a background IO thread and return its Future.

    On the tunneled backend even a prefetched, long-settled readback pays a
    full RPC round trip (~25-30 ms measured) when `device_get` is called
    synchronously — `copy_to_host_async` alone does not deliver the bytes
    to the host. Issuing the blocking `device_get` from a side thread right
    after dispatch overlaps that round trip with the next frames' host
    work; by the time the pipeline consumes the result (two frames later)
    the RPC has long completed and `.result()` returns immediately.

    The worker only *reads* settled device arrays, so it is safe alongside
    the main thread's dispatches (PJRT clients are thread-safe for
    concurrent execute + transfer).

    NO completion-ordering guarantee: with several pool workers, futures
    submitted later may complete first. Callers must hold the Future for
    each readback they need (as the per-frame records do) — do not assume
    FIFO completion across calls."""
    global _fetch_pool
    if _fetch_pool is None:
        _fetch_pool = ThreadPoolExecutor(
            max_workers=_FETCH_WORKERS, thread_name_prefix="sos-fetch")
    prefetch(tree)
    return _fetch_pool.submit(jax.device_get, tree)
