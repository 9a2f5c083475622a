"""Optional C kernel for the FSST hot loop, with a guaranteed numpy
fallback.

The greedy longest-match tokenization is a sequential chain (pos ->
pos + match_len); the pure-numpy path vectorizes it with per-position
matching plus pointer-doubling chain enumeration (codecs/fsst.py,
codecs/chain.py), which tops out ~21 MB/s single-proc because ~60% of the
match work is at positions the chain never visits.  A ~40-line scalar C
loop does exactly the same greedy rule at memory speed.  The kernel is
compiled ON FIRST USE with the system C compiler (cc -O3) into a cached
shared object; any failure (no compiler, read-only cache, sandbox) falls
back to the numpy path silently.  Set ``P4S_NO_NATIVE=1`` to force the
fallback (tests exercise both paths and assert byte-identical output).

Semantics are pinned to the numpy path: same LUT tables (lut2 sentinel
entry makes the window compare unconditionally false), same
zero-padded-window tail guard (a match may not run past the buffer), and
the caller segments the input identically, so tokenization is
bit-reproducible whichever path runs.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>
#include <string.h>

/* Greedy FSST tokenization over one segment.
   Tables are the SymbolTable code-indexed arrays (fsst.py):
   lut1[256]  byte -> 1-byte symbol code, miss = 255 (escape);
   lut2[65536] 2-byte prefix -> multi-byte symbol code, miss = 254
              (sentinel: masks[254]=0, vals[254]=~0 -> compare false);
   lens[256] / vals[256] / masks[256] code -> length / value / mask.
   Writes token (pos, len, code) triples; returns the token count. */
long p4s_fsst_tokenize(
    const uint8_t *data, long n,
    const uint8_t *lut1, const uint8_t *lut2,
    const int8_t *lens, const uint64_t *vals, const uint64_t *masks,
    int64_t *out_pos, int64_t *out_len, int64_t *out_code)
{
    long i = 0, t = 0;
    while (i < n) {
        uint64_t win = 0;
        long rem = n - i;
        if (rem >= 8) {
            memcpy(&win, data + i, 8);
        } else {
            memcpy(&win, data + i, (size_t)rem);
        }
        uint8_t c2 = lut2[(uint16_t)win];
        int L = lens[c2];
        if (((win & masks[c2]) == vals[c2]) && (i + L <= n)) {
            out_pos[t] = i; out_len[t] = L; out_code[t] = c2;
            i += L;
        } else {
            out_pos[t] = i; out_len[t] = 1; out_code[t] = lut1[data[i]];
            i += 1;
        }
        t++;
    }
    return t;
}

/* Greedy tokenize + payload emission fused: writes the encoded byte
   stream (code, or 255 + literal byte on a 1-byte-table miss) directly.
   Identical output to tokenize -> numpy assembly.  out needs 2n bytes
   worst case; returns the emitted length. */
long p4s_fsst_encode(
    const uint8_t *data, long n,
    const uint8_t *lut1, const uint8_t *lut2,
    const int8_t *lens, const uint64_t *vals, const uint64_t *masks,
    uint8_t *out)
{
    long i = 0, o = 0;
    while (i < n) {
        uint64_t win = 0;
        long rem = n - i;
        if (rem >= 8) {
            memcpy(&win, data + i, 8);
        } else {
            memcpy(&win, data + i, (size_t)rem);
        }
        uint8_t c2 = lut2[(uint16_t)win];
        int L = lens[c2];
        if (((win & masks[c2]) == vals[c2]) && (i + L <= n)) {
            out[o++] = c2;
            i += L;
        } else {
            uint8_t c1 = lut1[data[i]];
            out[o++] = c1;
            if (c1 == 255) out[o++] = data[i];  /* escape + literal */
            i += 1;
        }
    }
    return o;
}

/* Two independent segments tokenized in ONE interleaved loop: the
   greedy chain is serially dependent (next position depends on the
   match length), so a single stream stalls on the 64 KiB lut2 lookup
   latency; two streams hide it.  Per-segment output is byte-identical
   to p4s_fsst_encode (same rule, same tables).  Writes stream B's
   length to *ob_out; returns stream A's. */
long p4s_fsst_encode2(
    const uint8_t *da, long na, const uint8_t *db, long nb,
    const uint8_t *lut1, const uint8_t *lut2,
    const int8_t *lens, const uint64_t *vals, const uint64_t *masks,
    uint8_t *outa, uint8_t *outb, long *ob_out)
{
    long ia = 0, oa = 0, ib = 0, ob = 0;
    while (ia < na && ib < nb) {
        uint64_t wa = 0, wb = 0;
        long ra = na - ia, rb = nb - ib;
        if (ra >= 8) memcpy(&wa, da + ia, 8); else memcpy(&wa, da + ia, (size_t)ra);
        if (rb >= 8) memcpy(&wb, db + ib, 8); else memcpy(&wb, db + ib, (size_t)rb);
        uint8_t ca = lut2[(uint16_t)wa];
        uint8_t cb = lut2[(uint16_t)wb];
        int la = lens[ca], lb = lens[cb];
        if (((wa & masks[ca]) == vals[ca]) && (ia + la <= na)) {
            outa[oa++] = ca; ia += la;
        } else {
            uint8_t c1 = lut1[da[ia]];
            outa[oa++] = c1;
            if (c1 == 255) outa[oa++] = da[ia];
            ia += 1;
        }
        if (((wb & masks[cb]) == vals[cb]) && (ib + lb <= nb)) {
            outb[ob++] = cb; ib += lb;
        } else {
            uint8_t c1 = lut1[db[ib]];
            outb[ob++] = c1;
            if (c1 == 255) outb[ob++] = db[ib];
            ib += 1;
        }
    }
    while (ia < na) {
        uint64_t w = 0;
        long r = na - ia;
        if (r >= 8) memcpy(&w, da + ia, 8); else memcpy(&w, da + ia, (size_t)r);
        uint8_t c2 = lut2[(uint16_t)w];
        int L = lens[c2];
        if (((w & masks[c2]) == vals[c2]) && (ia + L <= na)) { outa[oa++] = c2; ia += L; }
        else {
            uint8_t c1 = lut1[da[ia]];
            outa[oa++] = c1;
            if (c1 == 255) outa[oa++] = da[ia];
            ia += 1;
        }
    }
    while (ib < nb) {
        uint64_t w = 0;
        long r = nb - ib;
        if (r >= 8) memcpy(&w, db + ib, 8); else memcpy(&w, db + ib, (size_t)r);
        uint8_t c2 = lut2[(uint16_t)w];
        int L = lens[c2];
        if (((w & masks[c2]) == vals[c2]) && (ib + L <= nb)) { outb[ob++] = c2; ib += L; }
        else {
            uint8_t c1 = lut1[db[ib]];
            outb[ob++] = c1;
            if (c1 == 255) outb[ob++] = db[ib];
            ib += 1;
        }
    }
    *ob_out = ob;
    return oa;
}

/* Decode one FSST token payload segment: codes expand from the (256 x 8)
   symbol byte matrix; code 255 escapes the following literal byte.
   Returns the number of output bytes (caller sizes out for the worst
   case: 8 bytes per payload byte), or -1 on a malformed trailing escape
   byte (the numpy fallback raises on the same corruption; silently
   truncating would mask page corruption as shortened data). */
long p4s_fsst_decode(
    const uint8_t *payload, long n,
    const uint8_t *matrix, const int8_t *lens,
    uint8_t *out)
{
    long i = 0, o = 0;
    while (i < n) {
        uint8_t c = payload[i];
        if (c == 255) {
            if (i + 1 >= n) return -1;  /* malformed trailing escape */
            out[o++] = payload[i + 1];
            i += 2;
        } else {
            /* unconditional 8-byte copy; o advances by the true length, so
               pad bytes are overwritten by the next token */
            memcpy(out + o, matrix + ((long)c << 3), 8);
            o += lens[c];
            i += 1;
        }
    }
    return o;
}

/* PLAIN BYTE_ARRAY encode: interleave u32-LE length prefixes with value
   bytes.  The numpy path scatters every payload byte through an int64
   fancy index (8 B of index traffic per payload byte); here it is one
   memcpy per value.  Returns the total bytes written. */
long p4s_plain_ba_encode(
    const int64_t *lengths, long n, const uint8_t *payload, uint8_t *out)
{
    long o = 0, p = 0;
    for (long i = 0; i < n; i++) {
        uint32_t L = (uint32_t)lengths[i];
        memcpy(out + o, &L, 4);
        memcpy(out + o + 4, payload + p, (size_t)lengths[i]);
        o += 4 + lengths[i];
        p += lengths[i];
    }
    return o;
}

/* Lexicographic min/max of zero-padded k-byte prefixes over a ragged
   column (BYTE_ARRAY chunk stats).  Tie semantics match the stable
   lexsort the numpy path uses: min keeps the FIRST tied row, max keeps
   the LAST.  out = {lo_index, hi_index, min_tied_prefix_len}. */
static int p4s_cmp_padded(const uint8_t *a, long la, const uint8_t *b, long lb)
{
    long m = la < lb ? la : lb;
    int c = memcmp(a, b, (size_t)m);
    if (c) return c;
    for (long i = m; i < la; i++) if (a[i]) return 1;
    for (long i = m; i < lb; i++) if (b[i]) return -1;
    return 0;
}

void p4s_ba_stats(
    const uint8_t *payload, const int64_t *lengths, long n, long k,
    int64_t *out)
{
    const uint8_t *p = payload;
    const uint8_t *plo = payload, *phi = payload;
    long llo = lengths[0] < k ? lengths[0] : k;
    long lhi = llo;
    long lo = 0, hi = 0;
    p += lengths[0];
    for (long i = 1; i < n; i++) {
        long li = lengths[i] < k ? lengths[i] : k;
        if (p4s_cmp_padded(p, li, plo, llo) < 0) { lo = i; plo = p; llo = li; }
        if (p4s_cmp_padded(p, li, phi, lhi) >= 0) { hi = i; phi = p; lhi = li; }
        p += lengths[i];
    }
    /* shortest tied prefix length among rows whose padded prefix equals
       the minimum (embedded-NUL ties; see _chunk_stats) */
    long min_len = llo;
    p = payload;
    for (long i = 0; i < n; i++) {
        long li = lengths[i] < k ? lengths[i] : k;
        if (p4s_cmp_padded(p, li, plo, llo) == 0 && li < min_len) min_len = li;
        p += lengths[i];
    }
    out[0] = lo; out[1] = hi; out[2] = min_len;
}

/* Paired FNV-1a-64 over each ragged value (bloom.bytes_hashes): the
   numpy path is one masked pass per byte POSITION; here the value stays
   in cache and both hashes update per byte. */
void p4s_bloom_bytes_hashes(
    const uint8_t *payload, const int64_t *lengths, long n,
    uint64_t *h1, uint64_t *h2)
{
    const uint64_t PRIME = 0x100000001B3ULL;
    const uint8_t *p = payload;
    for (long i = 0; i < n; i++) {
        uint64_t a = 0xCBF29CE484222325ULL;
        uint64_t b = 0x84222325CBF29CE4ULL;
        for (long j = 0; j < lengths[i]; j++) {
            a = (a ^ p[j]) * PRIME;
            b = (b ^ p[j]) * PRIME;
        }
        h1[i] = a; h2[i] = b;
        p += lengths[i];
    }
}

/* DELTA_BINARY_PACKED block emission (everything after the 4-field
   header): per 256-value block, signed min over the wrapped deltas,
   zigzag-ULEB128 min, all 8 miniblock width bytes, LSB-first bit-packed
   (delta - min) per used miniblock.  du = wrapped deltas already masked
   to nbytes*8 bits (computed vectorized in numpy); byte-identical to
   delta.dbp_encode's python assembly.  Returns bytes written. */
static long p4s_uleb(uint64_t v, uint8_t *out)
{
    long o = 0;
    while (v & ~0x7FULL) { out[o++] = (uint8_t)(v & 0x7F) | 0x80; v >>= 7; }
    out[o++] = (uint8_t)(v & 0x7F);
    return o;
}

long p4s_dbp_blocks(
    const uint64_t *du, long n_deltas, int nbytes, uint8_t *out)
{
    const long BLOCK = 256, MBS = 8, VPMB = 32;
    long o = 0;
    for (long start = 0; start < n_deltas; start += BLOCK) {
        long len = n_deltas - start < BLOCK ? n_deltas - start : BLOCK;
        const uint64_t *b = du + start;
        int64_t mn;
        if (nbytes == 4) {
            int32_t m = (int32_t)(uint32_t)b[0];
            for (long i = 1; i < len; i++) {
                int32_t v = (int32_t)(uint32_t)b[i];
                if (v < m) m = v;
            }
            mn = m;
        } else {
            int64_t m = (int64_t)b[0];
            for (long i = 1; i < len; i++) {
                int64_t v = (int64_t)b[i];
                if (v < m) m = v;
            }
            mn = m;
        }
        uint64_t mask = nbytes == 4 ? 0xFFFFFFFFULL : ~0ULL;
        uint64_t mdu = (uint64_t)mn & mask;
        /* zigzag64 of the sign-extended min */
        uint64_t zz = ((uint64_t)mn << 1) ^ (uint64_t)(mn >> 63);
        o += p4s_uleb(zz, out + o);
        long used = (len + VPMB - 1) / VPMB;
        uint8_t widths[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        uint64_t rel[256];
        for (long i = 0; i < len; i++) rel[i] = (b[i] - mdu) & mask;
        for (long i = len; i < used * VPMB; i++) rel[i] = 0;
        for (long mb = 0; mb < used; mb++) {
            uint64_t mx = 0;
            for (long i = 0; i < VPMB; i++) {
                uint64_t v = rel[mb * VPMB + i];
                if (v > mx) mx = v;
            }
            int w = 0;
            while (mx) { w++; mx >>= 1; }
            widths[mb] = (uint8_t)w;
        }
        for (long mb = 0; mb < MBS; mb++) out[o++] = widths[mb];
        for (long mb = 0; mb < used; mb++) {
            int w = widths[mb];
            if (w == 0) continue;
            /* 128-bit accumulator: nbits stays < 8 after draining, so
               nbits + w <= 71 always fits */
            unsigned __int128 acc = 0;
            int nbits = 0;
            for (long i = 0; i < VPMB; i++) {
                acc |= (unsigned __int128)rel[mb * VPMB + i] << nbits;
                nbits += w;
                while (nbits >= 8) {
                    out[o++] = (uint8_t)acc;
                    acc >>= 8;
                    nbits -= 8;
                }
            }
            if (nbits > 0) out[o++] = (uint8_t)acc;
        }
    }
    return o;
}

/* MinHash signatures over k-byte-gram rolling hashes, one fused pass.
   Bit-identical to the numpy path in operators/dedup.py: per gram,
   h = polynomial hash with multiplier 1099511628211 (uint64 wraparound);
   hp = h % (2^31-1); per permutation i, t = hp*a[i]+b[i] reduced by TWO
   Mersenne folds (t = (t & p) + (t >> 31)) and one conditional subtract;
   sig[d][i] = min over the doc's grams.  A doc shorter than k grams
   contributes the single sentinel hash 0 (hp = 0), exactly like the
   numpy stream.  The numpy path walks the gram stream once per
   permutation (64 full-stream passes of ~8 memory ops each); here the
   gram hash stays in a register and the nh minima stay in L1. */
void p4s_minhash(
    const uint8_t *payload, const int64_t *doc_bytes, long ndocs, long k,
    const uint64_t *a, const uint64_t *b, long nh, int64_t *out)
{
    const uint64_t MULT = 1099511628211ULL;
    const uint64_t P = 2147483647ULL;
    uint64_t mk = 1;                      /* MULT^(k-1) for the roll */
    for (long j = 0; j < k - 1; j++) mk *= MULT;
    uint64_t mins[256];                   /* caller guards nh <= 256 */
    const uint8_t *p = payload;
    for (long d = 0; d < ndocs; d++) {
        long nb = doc_bytes[d];
        long grams = nb - k + 1;
        int64_t *sig = out + d * nh;
        if (grams <= 0) {                 /* sentinel gram: hp = 0 */
            for (long i = 0; i < nh; i++) {
                uint64_t t = b[i];
                uint64_t hi = t >> 31; t &= P; t += hi;
                hi = t >> 31; t &= P; t += hi;
                if (t >= P) t -= P;
                sig[i] = (int64_t)t;
            }
            p += nb > 0 ? nb : 0;
            continue;
        }
        for (long i = 0; i < nh; i++) mins[i] = ~0ULL;
        uint64_t h = 0;
        for (long j = 0; j < k; j++) h = h * MULT + p[j];
        for (long g = 0; g < grams; g++) {
            uint64_t hp = h % P;
            for (long i = 0; i < nh; i++) {
                uint64_t t = hp * a[i] + b[i];
                uint64_t hi = t >> 31; t &= P; t += hi;
                hi = t >> 31; t &= P; t += hi;
                if (t >= P) t -= P;
                if (t < mins[i]) mins[i] = t;
            }
            if (g + 1 < grams)
                h = (h - (uint64_t)p[g] * mk) * MULT + p[g + k];
        }
        for (long i = 0; i < nh; i++) sig[i] = (int64_t)mins[i];
        p += nb;
    }
}
"""

_lib = None
_tried = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "p4s_native")


def _build() -> str | None:
    """Compile (or reuse) the kernel .so; returns its path or None."""
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    d = _cache_dir()
    so = os.path.join(d, f"fsst_{tag}.so")
    if os.path.exists(so):
        return so
    try:
        os.makedirs(d, exist_ok=True)
        with tempfile.TemporaryDirectory(dir=d) as td:
            c = os.path.join(td, "k.c")
            tmp_so = os.path.join(td, "k.so")
            with open(c, "w") as f:
                f.write(_SRC)
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-o", tmp_so, c],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp_so, so)  # atomic: concurrent workers race safely
        return so
    except Exception:
        return None


def get_kernel():
    """The loaded ctypes library, or None (numpy fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("P4S_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.p4s_fsst_tokenize.restype = ctypes.c_long
        lib.p4s_fsst_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.p4s_fsst_encode.restype = ctypes.c_long
        lib.p4s_fsst_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.p4s_fsst_encode2.restype = ctypes.c_long
        lib.p4s_fsst_encode2.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.p4s_fsst_decode.restype = ctypes.c_long
        lib.p4s_fsst_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.p4s_minhash.restype = None
        lib.p4s_minhash.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
        ]
        lib.p4s_dbp_blocks.restype = ctypes.c_long
        lib.p4s_dbp_blocks.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.p4s_plain_ba_encode.restype = ctypes.c_long
        lib.p4s_plain_ba_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.p4s_ba_stats.restype = None
        lib.p4s_ba_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p,
        ]
        lib.p4s_bloom_bytes_hashes.restype = None
        lib.p4s_bloom_bytes_hashes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
