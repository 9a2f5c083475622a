"""Pointer-doubling chain enumeration.

Several decode paths (PLAIN byte-array length-prefix walking, FSST greedy
tokenization) are "follow a jump table from position 0" scans.  A naive scan
is a per-element python loop; instead we enumerate the visited set with
O(log n) vectorized pointer-doubling passes.  Because jumps are strictly
forward, ``np.flatnonzero`` on the visited mask yields positions in chain
order.
"""

from __future__ import annotations

import numpy as np

__all__ = ["chain_visit"]


def chain_visit(nxt: np.ndarray, start: int = 0) -> np.ndarray:
    """Enumerate positions visited following ``pos -> nxt[pos]`` from ``start``.

    ``nxt`` has length N+1; index N is the absorbing end state.  Jump targets
    are clipped into [0, N].  Returns the sorted (== visit-ordered, jumps are
    strictly forward) array of visited positions in [0, N).
    """
    n_plus_1 = len(nxt)
    end = n_plus_1 - 1
    jumps = np.clip(nxt, 0, end).astype(np.int64, copy=True)
    jumps[end] = end
    visited = np.zeros(n_plus_1, dtype=bool)
    visited[start] = True
    steps = 1
    count = 1
    while steps < n_plus_1:
        visited[jumps[visited]] = True
        new_count = int(visited.sum())
        if new_count == count:
            break
        count = new_count
        jumps = jumps[jumps]
        steps *= 2
    visited[end] = False
    return np.flatnonzero(visited)
