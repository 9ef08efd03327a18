"""Lease-scoped internal persists.

An operator that persists an intermediate its plan references more than
once (triangles' oriented edges, kmeans' training input, dedup's shingle
sets) must not leave that cache registered for the SESSION lifetime:
Spark's CacheManager holds persisted plans until ``unpersist`` is called
explicitly, so in a long-lived session (an application server, a
90-query bench pass) un-released internal persists accumulate and crowd
the storage pool — measured r11: eight dedup/similarity queries left ten
session-lifetime cached RDDs behind.

(``localCheckpoint`` residue is a different, bounded class: the iterative
operators' per-round checkpoints register a handful of RDDs per
invocation that Spark's ContextCleaner reclaims from JVM weak references
— they do not accumulate per call the way un-released ``persist`` plans
do, and this module deliberately leaves them to the cleaner.)

The lease pattern (introduced for triangles in r10, generalized here)
scopes each internal persist to the lifetime of the frame the operator
returns: while any consumer holds the frame the cache is registered (the
multiple plan references that justified the persist genuinely share it
during execution); when the last Python reference drops, the cache is
unpersisted — deterministic under CPython refcounting, idempotent, safe
after session stop.  Consumers that DERIVE a new frame and drop the
operator's return value carry the lease forward with
:func:`attach_lease` (or the cache is released early — still correct,
the derived plan just recomputes uncached).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["CacheLease", "attach_lease", "scope_caches"]


def _release_cache(jdf) -> None:
    """Unpersist a cached frame's JVM handle; safe after session stop."""
    try:
        jdf.unpersist(False)
    except Exception:
        pass


class CacheLease:
    """Scopes one or more internal persists to the lifetime of the frames
    that carry this lease object: when the LAST frame holding it is
    garbage collected, every cached frame is unpersisted.  ``children``
    keeps upstream leases (from operators this one composed) alive for
    exactly as long, so a composed plan releases its whole cache chain
    together.  ``release()`` drops everything eagerly."""

    __slots__ = ("__weakref__", "_finalizers", "_children")

    def __init__(self, *jdfs, children=()):
        import weakref

        self._children = list(children)
        self._finalizers = [
            weakref.finalize(self, _release_cache, j) for j in jdfs
        ]

    def release(self) -> None:
        for f in self._finalizers:
            f()
        for c in self._children:
            c.release()


def attach_lease(df: DataFrame, source: DataFrame) -> DataFrame:
    """Propagate ``source``'s cache lease (if any) onto a derived frame.

    A caller that derives a new frame (orderBy/limit/select/...) and
    discards the operator's return value must carry the lease forward or
    the cache is released before the derived plan executes (still
    correct — the consumer just recomputes uncached)."""
    lease = getattr(source, "_tamar_cache_lease", None)
    if lease is not None:
        df._tamar_cache_lease = lease
    return df


def scope_caches(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Scope the persists of ``cached`` frames to ``out``'s lifetime.

    Any lease already riding ``out`` or a ``cached`` frame (an operator
    composing another leased operator) is folded in as a child, so one
    object on the returned frame owns the full cache chain.  Returns
    ``out`` with the lease attached."""
    children = []
    for d in (out, *cached):
        lease = getattr(d, "_tamar_cache_lease", None)
        if lease is not None and all(lease is not c for c in children):
            children.append(lease)
    out._tamar_cache_lease = CacheLease(
        *(d._jdf for d in cached), children=children
    )
    return out
