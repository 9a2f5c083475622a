"""FSST-style string compression (Boncz, Neumann, Leis: "FSST: Fast Random
Access String Compression", VLDB 2020).

Not present in the reference (parquet4seastar has no string symbol table);
mandated on top of it by BASELINE.json (north_star).  Implemented from the
published algorithm only:

- symbol table: up to 254 symbols of 1..8 bytes, greedy gain-based selection
  (gain = frequency x length) over a few training iterations on a sample;
  code 255 is the escape marker, escape emits the next byte verbatim.
- encoding: longest-match tokenization.  The per-position longest match is
  found vectorized (8 searchsorted passes over sliding byte windows); the
  greedy left-to-right token chain is enumerated with pointer doubling
  (codecs/chain.py) instead of a per-byte python loop.
- decoding: fully vectorized gather from the padded symbol matrix.

Serialized layout (ours):
    [u8 n_symbols][u8 len x n_symbols][symbol bytes][token payload]
"""

from __future__ import annotations

import numpy as np

from .chain import chain_visit

__all__ = ["train_symbol_table", "fsst_encode", "fsst_decode", "SymbolTable"]

_ESCAPE = 255
_MAX_SYMBOLS = 254
_MAX_LEN = 8
_WEIGHTS = (np.uint64(1) << (np.uint64(8) * np.arange(8, dtype=np.uint64)))
_MASKS = np.array([(1 << (8 * L)) - 1 for L in range(9)], dtype=np.uint64)


class SymbolTable:
    """Symbols as (value little-endian uint64, length) with assigned codes."""

    def __init__(self, values: np.ndarray, lengths: np.ndarray):
        order = np.argsort(lengths, kind="stable")  # group by length for lookup
        self.values = values[order].astype(np.uint64)
        self.lengths = lengths[order].astype(np.int64)
        self.codes = order.astype(np.uint8)  # original code of sorted entry
        # per-length sorted lookup tables
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for length in range(1, _MAX_LEN + 1):
            mask = self.lengths == length
            if mask.any():
                vals = self.values[mask]
                codes = self.codes[mask]
                o = np.argsort(vals)
                self._by_len[length] = (vals[o], codes[o])
        self.n = len(values)
        # decode support: matrix of symbol bytes in CODE order
        mat = np.zeros((max(self.n, 1), _MAX_LEN), dtype=np.uint8)
        lens_by_code = np.zeros(max(self.n, 1), dtype=np.int64)
        for v, ln, c in zip(self.values, self.lengths, self.codes):
            mat[c] = np.frombuffer(int(v).to_bytes(8, "little"), dtype=np.uint8)
            lens_by_code[c] = ln
        self.matrix = mat
        self.lens_by_code = lens_by_code

    def lookup(self, length: int) -> tuple[np.ndarray, np.ndarray] | None:
        return self._by_len.get(length)

    def serialize(self) -> bytes:
        lens = np.zeros(self.n, dtype=np.uint8)
        lens[self.codes] = self.lengths.astype(np.uint8)
        sym_bytes = bytearray()
        for c in range(self.n):
            sym_bytes += self.matrix[c, : self.lens_by_code[c]].tobytes()
        return bytes([self.n]) + lens.tobytes() + bytes(sym_bytes)

    @staticmethod
    def deserialize(buf) -> tuple["SymbolTable", int]:
        n = buf[0]
        lens = np.frombuffer(buf, dtype=np.uint8, count=n, offset=1).astype(np.int64)
        pos = 1 + n
        values = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            ln = int(lens[i])
            values[i] = int.from_bytes(bytes(buf[pos : pos + ln]), "little")
            pos += ln
        # reconstruct with identity code order
        table = SymbolTable(values, lens)
        return table, pos


def _windows(data: np.ndarray) -> np.ndarray:
    """uint64 little-endian 8-byte window at every position."""
    n = len(data)
    padded = np.zeros(n + 7, dtype=np.uint8)
    padded[:n] = data
    win = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n]
    return (win.astype(np.uint64) * _WEIGHTS).sum(axis=1, dtype=np.uint64)


def _match(data: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Longest-match per position: returns (match_len[n], code[n]).

    Unmatched positions get match_len=1, code=_ESCAPE.
    """
    n = len(data)
    win = _windows(data)
    match_len = np.ones(n, dtype=np.int64)
    code = np.full(n, _ESCAPE, dtype=np.int64)
    unset = np.ones(n, dtype=bool)
    for length in range(_MAX_LEN, 0, -1):
        tab = table.lookup(length)
        if tab is None:
            continue
        vals, codes = tab
        limit = n - length + 1
        if limit <= 0:
            continue
        cand = np.flatnonzero(unset[:limit])
        if len(cand) == 0:
            continue
        w = win[cand] & _MASKS[length]
        idx = np.searchsorted(vals, w)
        idx_c = np.minimum(idx, len(vals) - 1)
        hit = vals[idx_c] == w
        hits = cand[hit]
        match_len[hits] = length
        code[hits] = codes[idx_c[hit]]
        unset[hits] = False
    return match_len, code


def _tokenize(data: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy left-to-right tokenization; returns (positions, lengths, codes)."""
    n = len(data)
    if n == 0:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty, empty
    match_len, code = _match(data, table)
    nxt = np.empty(n + 1, dtype=np.int64)
    nxt[:n] = np.arange(n, dtype=np.int64) + match_len
    nxt[n] = n
    pos = chain_visit(nxt, 0)
    return pos, match_len[pos], code[pos]


def fsst_encode(data: bytes | np.ndarray, table: SymbolTable) -> bytes:
    """Encode a byte stream: serialized table + token payload."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    pos, lens, codes = _tokenize(arr, table)
    esc = codes == _ESCAPE
    out_lens = np.where(esc, 2, 1).astype(np.int64)
    offsets = np.zeros(len(pos) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    out[offsets[:-1]] = np.where(esc, _ESCAPE, codes).astype(np.uint8)
    if esc.any():
        out[offsets[:-1][esc] + 1] = arr[pos[esc]]
    return table.serialize() + out.tobytes()


def fsst_decode(buf) -> bytes:
    """Decode a stream produced by fsst_encode."""
    table, pos = SymbolTable.deserialize(buf)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=pos)
    n = len(payload)
    if n == 0:
        return b""
    is_255 = payload == _ESCAPE
    idx = np.arange(n, dtype=np.int64)
    last_non255 = np.maximum.accumulate(np.where(~is_255, idx, -1))
    run_offset = idx - (last_non255 + 1)
    escape = is_255 & (run_offset % 2 == 0)
    literal = np.zeros(n, dtype=bool)
    literal[1:] = escape[:-1]
    escape &= ~literal  # a 255 right after an escape is the literal itself
    code_pos = np.flatnonzero(~literal & ~escape)
    token_pos = np.sort(np.concatenate([code_pos, np.flatnonzero(escape)]))
    is_esc_token = escape[token_pos]
    token_codes = payload[token_pos]
    out_lens = np.where(is_esc_token, 1, table.lens_by_code[np.where(is_esc_token, 0, token_codes)]).astype(np.int64)
    offsets = np.zeros(len(token_pos) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    # escapes: single literal byte
    if is_esc_token.any():
        out[offsets[:-1][is_esc_token]] = payload[token_pos[is_esc_token] + 1]
    # symbols: gather rows from the matrix
    sym_tokens = ~is_esc_token
    if sym_tokens.any():
        codes = token_codes[sym_tokens].astype(np.int64)
        rows = table.matrix[codes]  # (m, 8)
        lens = table.lens_by_code[codes]
        col = np.arange(_MAX_LEN, dtype=np.int64)
        valid = col[None, :] < lens[:, None]
        targets = offsets[:-1][sym_tokens][:, None] + col[None, :]
        out[targets[valid]] = rows[valid]
    return out.tobytes()


def _unique_counts(vals: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique (value,len) pairs with counts via lexsort (no python loop)."""
    if len(vals) == 0:
        return vals, lens, np.zeros(0, dtype=np.int64)
    order = np.lexsort((vals, lens))
    v = vals[order]
    l = lens[order]
    new = np.empty(len(v), dtype=bool)
    new[0] = True
    new[1:] = (v[1:] != v[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(v)))
    return v[starts], l[starts], counts


def train_symbol_table(sample: bytes | np.ndarray, iterations: int = 4) -> SymbolTable:
    """Greedy gain-based symbol selection on a sample (FSST paper, §3)."""
    arr = np.frombuffer(sample, dtype=np.uint8) if isinstance(sample, (bytes, bytearray, memoryview)) else sample
    table = SymbolTable(np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64))
    if len(arr) == 0:
        return table
    win = _windows(arr)
    for _ in range(iterations):
        pos, lens, codes = _tokenize(arr, table)
        tok_vals = win[pos] & _MASKS[lens]
        # candidate pool: single tokens + adjacent-pair concatenations <= 8B
        pair_lens = lens[:-1] + lens[1:]
        ok = pair_lens <= _MAX_LEN
        pair_vals = tok_vals[:-1][ok] | (tok_vals[1:][ok] << (np.uint64(8) * lens[:-1][ok].astype(np.uint64)))
        cand_vals = np.concatenate([tok_vals, pair_vals])
        cand_lens = np.concatenate([lens, pair_lens[ok]])
        uv, ul, counts = _unique_counts(cand_vals, cand_lens)
        gain = counts * ul
        take = min(_MAX_SYMBOLS, len(uv))
        top = np.argpartition(-gain, take - 1)[:take] if len(uv) > take else np.arange(len(uv))
        # stable order: highest gain first (ties: shorter first for determinism)
        top = top[np.lexsort((uv[top], ul[top], -gain[top]))]
        table = SymbolTable(uv[top], ul[top])
    return table
