"""Stage-state caching for task-based map_batches.

Ray Data actor pools re-spawn actors per dataset execution, putting actor
startup + state construction on the critical path of every run and capping
the stage at the pool size. For stages whose state is cheap to build but
worth reusing (compiled regexes, permutation tables, small broadcast
indexes), a plain task-based ``map_batches`` with the callable cached per
worker PROCESS gives the same build-once-reuse-per-batch semantics at full
cluster width. Keep real actor pools for expensive state (models, large
indexes) or state that must not be shared across stages.
"""
from __future__ import annotations

_CACHE: dict = {}


def cached_callable(cls, **kwargs):
    """A pickleable function for map_batches that constructs ``cls(**kwargs)``
    once per worker process and applies it per batch.  Only the NEWEST
    state per class is kept (per-run ObjectRef kwargs would otherwise
    accumulate one entry per pipeline run in long-lived workers)."""
    kind = (cls.__module__, cls.__qualname__)
    key = (kind, tuple(sorted((k, repr(v)) for k, v in kwargs.items())))

    def fn(batch):
        obj = _CACHE.get(key)
        if obj is None:
            for k in [k for k in _CACHE if k[0] == kind]:
                del _CACHE[k]
            obj = _CACHE[key] = cls(**kwargs)
        return obj(batch)

    return fn
