"""Worker-local broadcast cache for map_batches TASK closures.

Actor pools (``map_batches(Cls, concurrency=N)``) pay a dedicated-process
spin-up per stage (~2s x pools per run) and are only worth it for heavy
state (models, indexes). Our stages' state is a ``ray.put`` broadcast
(texts of the dup set, hot-key arrays, cluster maps) — cheap to fetch but
wasteful to re-deserialize per batch. So stages run as plain task
closures on Ray's shared, warm worker processes, and this module memoizes
the deserialized broadcast per worker:

    obj = get_broadcast(ref)          # ray.get + cache by ref id
    thing = worker_memo(key, factory)  # arbitrary per-worker singleton
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

import ray

_CAP = 16
_CACHE: OrderedDict[str, Any] = OrderedDict()


def worker_memo(key: str, factory: Callable[[], Any]) -> Any:
    """Per-worker-process memo with a small LRU bound."""
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = factory()
    _CACHE[key] = val
    if len(_CACHE) > _CAP:
        _CACHE.popitem(last=False)
    return val


def get_broadcast(ref):
    """ray.get with per-worker deserialization caching; passes through
    non-refs (handy for tests calling stages without Ray)."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    return worker_memo("bcast:" + ref.hex(), lambda: ray.get(ref))
