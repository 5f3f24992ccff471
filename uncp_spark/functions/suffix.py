"""Suffix-array construction + substring queries (pure numpy, no Spark).

Backs the containment pass (operators/containment.py) that the
north_rule adds on top of uncp's designed similarity tiers: "a
suffix-array pass for exact substring containment".

Construction is prefix-doubling with numpy lexsort — O(n log² n),
fully vectorized (no per-character Python). Queries are binary search
over the suffix array, O(m log n) per probe, so building one array for
a target amortizes across many probes (the applyInPandas grouping).
"""

from __future__ import annotations

import numpy as np


def suffix_array(text: str | bytes) -> np.ndarray:
    """Suffix array (int64 start offsets, lexicographic order) of text."""
    data = text.encode("utf-8", "surrogatepass") if isinstance(text, str) else text
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        diff = np.ones(n, dtype=bool)
        diff[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(diff) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


class SuffixIndex:
    """One target text + its suffix array; answers substring queries."""

    def __init__(self, text: str):
        self._bytes = text.encode("utf-8", "surrogatepass")
        self._sa = suffix_array(self._bytes)

    def contains(self, pattern: str) -> bool:
        pat = pattern.encode("utf-8", "surrogatepass")
        m = len(pat)
        if m == 0:
            return True
        if m > len(self._bytes):
            return False
        sa, data = self._sa, self._bytes
        lo, hi = 0, len(sa)
        while lo < hi:
            mid = (lo + hi) // 2
            start = sa[mid]
            if data[start : start + m] < pat:
                lo = mid + 1
            else:
                hi = mid
        if lo == len(sa):
            return False
        start = sa[lo]
        return data[start : start + m] == pat
