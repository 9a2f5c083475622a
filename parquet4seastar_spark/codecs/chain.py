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

__all__ = ["chain_visit", "chain_visit_bounded"]


def chain_visit(nxt: np.ndarray, start: int = 0) -> np.ndarray:
    """Enumerate positions visited following ``pos -> nxt[pos]`` from ``start``.

    ``nxt`` has length N+1; index N is the absorbing end state.  Jump targets
    are clipped into [0, N].  Returns the sorted (== visit-ordered, jumps are
    strictly forward) array of visited positions in [0, N).
    """
    n_plus_1 = len(nxt)
    end = n_plus_1 - 1
    dtype = np.int32 if n_plus_1 <= (1 << 31) - 1 else np.int64
    jumps = np.clip(nxt, 0, end).astype(dtype, copy=True)
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


def chain_visit_bounded(mlen: np.ndarray, max_jump: int = 8, block: int = 96) -> np.ndarray:
    """Enumerate the chain ``pos -> pos + mlen[pos]`` from 0, for jump
    lengths bounded by ``max_jump`` (< block).

    Two-level scheme that keeps every pass cache-resident instead of the
    O(log n) whole-array gather compositions of :func:`chain_visit`:

    1. per block, compute ``exit[i]`` (first position >= block end reached
       from i) with a backward sweep -- ``block`` vectorized passes over
       (n/block)-element columns.  The sweep's cost is numpy CALL overhead
       times ``block`` plus gather work; block=96 measured fastest on
       256 KiB segments (17% over 256);
    2. bounded jumps mean every block is entered at an offset < max_jump, so
       block entry offsets live in a (n/256 x max_jump) graph; enumerate it
       with pointer doubling (tiny);
    3. walk all blocks in parallel from their entry offsets, emitting token
       positions into a boolean (n) grid whose flatnonzero is position-sorted.
    """
    n = len(mlen)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    nb = (n + block - 1) // block
    npad = nb * block
    nxt = np.empty(npad + max_jump, dtype=np.int32)
    nxt[:n] = np.arange(n, dtype=np.int32)
    nxt[:n] += mlen
    nxt[n:] = npad + max_jump  # absorbing tail
    ends = (np.arange(nb, dtype=np.int32) + 1) * block
    exit_ = np.empty(npad + max_jump, dtype=np.int32)
    exit_[npad:] = npad + max_jump
    nxt2 = nxt[:npad].reshape(nb, block)
    exit2 = exit_[:npad].reshape(nb, block)
    clip_hi = np.int32(npad + max_jump - 1)
    for off in range(block - 1, -1, -1):
        t = nxt2[:, off]
        same = t < ends
        g = exit_[np.minimum(t, clip_hi)]
        exit2[:, off] = np.where(same, g, t)

    # block-entry graph: node (b, o) for o < max_jump; next node derived from
    # exit of position b*block + o, which lands in block b+1 at offset < max_jump
    em = exit2[:, :max_jump]  # (nb, max_jump) absolute target positions
    node_next = np.empty(nb * max_jump + 1, dtype=np.int64)
    tgt = em.reshape(-1).astype(np.int64)
    tgt_block = tgt // block
    tgt_off = tgt - tgt_block * block
    valid = tgt < n
    node_next[:-1] = np.where(valid, tgt_block * max_jump + tgt_off, nb * max_jump)
    node_next[-1] = nb * max_jump
    nodes = chain_visit(node_next, 0)
    entry_blocks = nodes // max_jump
    entry_abs = (entry_blocks * block + nodes % max_jump).astype(np.int32)

    # parallel per-block walks
    emit = np.zeros(npad, dtype=bool)
    cur = entry_abs.copy()
    ends_v = ((entry_blocks + 1) * block).astype(np.int32)
    n32 = np.int32(n)
    while len(cur):
        alive = (cur < ends_v) & (cur < n32)
        if not alive.all():
            cur = cur[alive]
            ends_v = ends_v[alive]
            if not len(cur):
                break
        emit[cur] = True
        cur = nxt[cur]
    return np.flatnonzero(emit[:n])
