"""Retained-state pagination — the batch-engine graft of the reference's
search resume (Q9, ``GraphSearcher.java:489-527``: ``resume`` continues
from the retained candidate/visited state instead of re-searching).

The plain ``offset=`` parameter on :func:`~jvector_spark.index.query.
bm25_topk_indexed` recomputes top-(offset+k) per page — exact and
stateless, but a user paging to offset 10·k has paid O(offset) kernel
work per page. :class:`PagedSearch` is the retained-state alternative:
the first page computes top-``depth`` ONCE and persists the ranked
result; every later page inside that depth is a rank-range slice of the
cached frame (no kernel re-run, no shuffle — Spark serves it from the
persisted partitions). Paging past the cached depth doubles it and
recomputes once, so reaching rank R costs O(R) total kernel work across
all pages (amortized — the geometric-doubling argument), versus O(R²/k)
for offset-per-page.

Works over ANY ranked search callable (term-partitioned, doc-partitioned,
sharded, TF-IDF, ANN tiers) — the handle only needs ``fn(k) -> DataFrame``
with a ``rank`` column, so it composes instead of duplicating each
engine's plumbing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PagedSearch:
    """Cursor over a ranked search with retained (persisted) state.

    >>> ps = PagedSearch(lambda k: bm25_topk_indexed(spark, idx, qdf, k=k),
    ...                  page_size=10)
    >>> first = ps.page(0)      # computes + persists top-40 once
    >>> third = ps.page(2)      # pure slice of the cached frame
    >>> ps.close()              # release the persisted state

    ``depth`` is the initially-materialized rank horizon (default
    4 × page_size — the reference's overquery idiom); paging past it
    doubles the horizon and recomputes once.
    """

    def __init__(
        self,
        search_fn: Callable[[int], DataFrame],
        page_size: int = 10,
        depth: int | None = None,
    ) -> None:
        if page_size < 1:
            raise ValueError(f"page_size must be >= 1, got {page_size}")
        self._fn = search_fn
        self._k = int(page_size)
        self._depth = int(depth) if depth else max(4 * self._k, self._k)
        self._cached: DataFrame | None = None
        self._next_page = 0
        self.recomputes = 0  # observability: how often the kernel re-ran

    def _ensure(self, need_rank: int) -> None:
        if self._cached is not None and need_rank <= self._depth:
            return
        while self._depth < need_rank:
            self._depth *= 2
        fresh = self._fn(self._depth).persist()
        fresh.count()  # materialize BEFORE dropping the old state
        if self._cached is not None:
            self._cached.unpersist()
        self._cached = fresh
        self.recomputes += 1

    def page(self, page_idx: int) -> DataFrame:
        """Ranks (page_idx·k, (page_idx+1)·k] for every query — global
        ranks preserved so callers can stitch pages seamlessly."""
        if page_idx < 0:
            raise ValueError(f"page_idx must be >= 0, got {page_idx}")
        lo = page_idx * self._k
        self._ensure(lo + self._k)
        assert self._cached is not None
        return self._cached.filter(
            (F.col("rank") > lo) & (F.col("rank") <= lo + self._k)
        )

    def next_page(self) -> DataFrame:
        """Sequential cursor (the ``resume`` call shape)."""
        out = self.page(self._next_page)
        self._next_page += 1
        return out

    def close(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None
