"""Optional C fast path for the FSST greedy scan, compiled at first use
with the toolchain already in the image (plain ``cc -O2 -shared``) and
loaded via ctypes — no third-party packages, no install step.

The kernel is a direct transliteration of the numpy wave loop's matching
rules (fsst._greedy_encode): per position, try the 3..8-byte hashed
symbol, then the 2-byte direct table, then the 1-byte table, never
crossing a segment end.  Greedy encode is sequential PER SEGMENT and
independent ACROSS segments, so scan order doesn't affect the result —
the C path and the numpy wave path produce byte-identical ``code_at``
arrays (CRC-asserted in tests), which keeps resume/determinism intact
even in a mixed fleet where some workers failed to compile and fell back.

Failure of any step (no compiler, sandboxed /tmp, load error) degrades to
``lib = None`` and the numpy path — the C kernel is an optimization, not
a dependency.
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

int64_t greedy_scan(const uint8_t *pad,
                 const int64_t *seg_s, const int64_t *seg_e, int64_t n_segs,
                 const uint8_t *t1, const uint8_t *t2,
                 const uint64_t *hkey, const uint64_t *hmask,
                 const int32_t *hlen, const uint8_t *hcode,
                 int64_t *units_out, uint8_t *codes_out)
{
    int64_t k = 0;   /* segments are start-ordered, so units emit ascending */
    for (int64_t s = 0; s < n_segs; s++) {
        int64_t p = seg_s[s];
        const int64_t end = seg_e[s];
        while (p < end) {
            uint64_t key8;
            memcpy(&key8, pad + p, 8);          /* little-endian hosts */
            const int64_t rem = end - p;
            uint32_t h = ((uint32_t)(key8 & 0xFFFFFFu) * 2654435761u) >> 20;
            const int32_t hl = hlen[h];
            int64_t len;
            uint8_t c;
            if (hl > 0 && (key8 & hmask[h]) == hkey[h] && hl <= rem) {
                len = hl;
                c = hcode[h];
            } else {
                const uint8_t c2 = t2[key8 & 0xFFFFu];
                if (c2 != 255 && rem >= 2) {
                    len = 2;
                    c = c2;
                } else {
                    len = 1;
                    c = t1[key8 & 0xFFu];
                }
            }
            units_out[k] = p;
            codes_out[k] = c;
            k++;
            p += len;
        }
    }
    return k;
}

/* greedy_scan fused with stream emission: write the final code stream
   (code byte, plus the literal byte after each escape) during the scan and
   record the stream offset at every segment start, so python skips the
   units/codes materialization and the two scatter passes entirely.
   Matching rules identical to greedy_scan (byte-identical stream). */
int64_t encode_scan(const uint8_t *pad,
                 const int64_t *seg_s, const int64_t *seg_e, int64_t n_segs,
                 const uint8_t *t1, const uint8_t *t2,
                 const uint64_t *hkey, const uint64_t *hmask,
                 const int32_t *hlen, const uint8_t *hcode,
                 uint8_t *stream_out, int64_t *seg_out)
{
    int64_t o = 0;
    for (int64_t s = 0; s < n_segs; s++) {
        seg_out[s] = o;
        int64_t p = seg_s[s];
        const int64_t end = seg_e[s];
        while (p < end) {
            uint64_t key8;
            memcpy(&key8, pad + p, 8);          /* little-endian hosts */
            const int64_t rem = end - p;
            uint32_t h = ((uint32_t)(key8 & 0xFFFFFFu) * 2654435761u) >> 20;
            const int32_t hl = hlen[h];
            int64_t len;
            uint8_t c;
            if (hl > 0 && (key8 & hmask[h]) == hkey[h] && hl <= rem) {
                len = hl;
                c = hcode[h];
            } else {
                const uint8_t c2 = t2[key8 & 0xFFFFu];
                if (c2 != 255 && rem >= 2) {
                    len = 2;
                    c = c2;
                } else {
                    len = 1;
                    c = t1[key8 & 0xFFu];
                }
            }
            stream_out[o++] = c;
            if (c == 255 && len == 1)           /* escape: literal follows */
                stream_out[o++] = pad[p];
            p += len;
        }
    }
    seg_out[n_segs] = o;
    return o;
}

/* front-coding decode: string i = previous string's first plen[i] bytes +
   the next slen[i] suffix bytes.  Sequential by definition — this loop is
   pure memcpy.  Caller sizes out = sum(plen) + sum(slen). */
int64_t fcode_decode(const uint8_t *suffix, const int64_t *plen,
                     const int64_t *slen, int64_t n, uint8_t *out)
{
    int64_t o = 0, si = 0, prev = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t start = o;
        int64_t pl = plen[i];
        if (pl > o - prev) pl = o - prev;   /* crc guards; no OOB read */
        memcpy(out + o, out + prev, (size_t)pl);
        o += pl;
        memcpy(out + o, suffix + si, (size_t)slen[i]);
        o += slen[i];
        si += slen[i];
        prev = start;
    }
    return o;
}

int64_t decode_stream(const uint8_t *stream, int64_t stream_len,
                      const int64_t *counts, int64_t n_strings,
                      const uint8_t *sym_flat, const int64_t *sym_off,
                      const int64_t *sym_len,
                      uint8_t *out_buf, int64_t *out_offsets)
{
    /* Pack each symbol into a u64 word so the hot loop is ONE unconditional
       8-byte store + advance-by-true-length (symbols are <= 8 bytes; the
       caller over-allocates out_buf by >= 8 bytes of slack, and overshoot
       bytes are overwritten by the next store or sliced off).  Identical
       output to the per-symbol memcpy loop, ~3x fewer store instructions. */
    uint64_t sym8[256];
    for (int j = 0; j < 256; j++) {
        uint64_t w = 0;
        memcpy(&w, sym_flat + sym_off[j], (size_t)sym_len[j]);
        sym8[j] = w;
    }
    int64_t i = 0, out = 0;
    for (int64_t s = 0; s < n_strings; s++) {
        out_offsets[s] = out;
        int64_t end = i + counts[s];
        if (end > stream_len) end = stream_len;      /* crc guards; no OOB */
        while (i < end) {
            const uint8_t b = stream[i];
            if (b == 255) {
                if (i + 1 < end) out_buf[out++] = stream[i + 1];
                i += 2;
            } else {
                memcpy(out_buf + out, &sym8[b], 8);
                out += sym_len[b];
                i += 1;
            }
        }
    }
    out_offsets[n_strings] = out;
    return out;
}

/* exact (key,len) gram counter for the table build: open-addressing
   insert-or-increment over the candidate stream, then compact occupied
   slots.  Output order is hash-slot order — callers MUST select symbols
   with an order-independent total sort so this path and the numpy
   fallback (sorted-group order) build identical tables.  tab_* are
   caller-zeroed arrays of tab_size (a power of two >= 2n); cnt==0 marks
   an empty slot (a real gram always counts >= 1). */
int64_t count_grams(const uint64_t *keys, const int64_t *lens, int64_t n,
                    uint64_t *tab_key, int64_t *tab_len, int64_t *tab_cnt,
                    int64_t tab_size,
                    uint64_t *out_key, int64_t *out_len, int64_t *out_cnt)
{
    const uint64_t mask = (uint64_t)tab_size - 1;
    for (int64_t j = 0; j < n; j++) {
        const uint64_t k = keys[j];
        const int64_t l = lens[j];
        uint64_t h = (k * 0x9E3779B97F4A7C15ull) ^
                     ((uint64_t)l * 0xFF51AFD7ED558CCDull);
        h ^= h >> 33;
        uint64_t i = h & mask;
        for (;;) {
            if (tab_cnt[i] == 0) {
                tab_key[i] = k; tab_len[i] = l; tab_cnt[i] = 1;
                break;
            }
            if (tab_key[i] == k && tab_len[i] == l) {
                tab_cnt[i]++;
                break;
            }
            i = (i + 1) & mask;
        }
    }
    int64_t m = 0;
    for (int64_t i = 0; i < tab_size; i++) {
        if (tab_cnt[i] != 0) {
            out_key[m] = tab_key[i];
            out_len[m] = tab_len[i];
            out_cnt[m] = tab_cnt[i];
            m++;
        }
    }
    return m;
}
"""

_HASH_SHIFT_CHECK = 32 - 12  # must match fsst._HASH_BITS (shift 20 in C)

lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    cache = os.environ.get("COLONNADE_NATIVE_DIR", tempfile.gettempdir())
    so_path = os.path.join(cache, f"colonnade_fsst_{tag}.so")
    if not os.path.exists(so_path):
        src_path = os.path.join(cache, f"colonnade_fsst_{tag}.c")
        tmp_so = f"{so_path}.{os.getpid()}.tmp"
        with open(src_path, "w") as f:
            f.write(_SRC)
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src_path],
            check=True, capture_output=True, timeout=60)
        os.replace(tmp_so, so_path)     # atomic: concurrent workers race safely
    dll = ctypes.CDLL(so_path)
    i64 = ctypes.c_int64
    p = ctypes.POINTER
    dll.greedy_scan.argtypes = [
        p(ctypes.c_uint8), p(i64), p(i64), i64,
        p(ctypes.c_uint8), p(ctypes.c_uint8),
        p(ctypes.c_uint64), p(ctypes.c_uint64),
        p(ctypes.c_int32), p(ctypes.c_uint8),
        p(i64), p(ctypes.c_uint8)]
    dll.greedy_scan.restype = i64
    dll.encode_scan.argtypes = [
        p(ctypes.c_uint8), p(i64), p(i64), i64,
        p(ctypes.c_uint8), p(ctypes.c_uint8),
        p(ctypes.c_uint64), p(ctypes.c_uint64),
        p(ctypes.c_int32), p(ctypes.c_uint8),
        p(ctypes.c_uint8), p(i64)]
    dll.encode_scan.restype = i64
    dll.fcode_decode.argtypes = [
        p(ctypes.c_uint8), p(i64), p(i64), i64, p(ctypes.c_uint8)]
    dll.fcode_decode.restype = i64
    dll.decode_stream.argtypes = [
        p(ctypes.c_uint8), i64, p(i64), i64,
        p(ctypes.c_uint8), p(i64), p(i64),
        p(ctypes.c_uint8), p(i64)]
    dll.decode_stream.restype = i64
    dll.count_grams.argtypes = [
        p(ctypes.c_uint64), p(i64), i64,
        p(ctypes.c_uint64), p(i64), p(i64), i64,
        p(ctypes.c_uint64), p(i64), p(i64)]
    dll.count_grams.restype = i64
    return dll


def get_lib():
    global lib, _tried
    if not _tried:
        _tried = True
        try:
            lib = _build()
        except Exception:
            lib = None              # numpy fallback; never fatal
    return lib


def greedy_scan(pad, seg_s, seg_e, t1, t2, hkey, hmask, hlen, hcode,
                units_out, codes_out):
    """Run the C scan into preallocated output arrays; returns the unit
    count, or None when the kernel is unavailable (numpy path)."""
    dll = get_lib()
    if dll is None:
        return None
    cp = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(cp(ct))

    return int(dll.greedy_scan(
        ptr(pad, ctypes.c_uint8),
        ptr(seg_s, ctypes.c_int64), ptr(seg_e, ctypes.c_int64),
        ctypes.c_int64(len(seg_s)),
        ptr(t1, ctypes.c_uint8), ptr(t2, ctypes.c_uint8),
        ptr(hkey, ctypes.c_uint64), ptr(hmask, ctypes.c_uint64),
        ptr(hlen, ctypes.c_int32), ptr(hcode, ctypes.c_uint8),
        ptr(units_out, ctypes.c_int64), ptr(codes_out, ctypes.c_uint8)))


def encode_scan(pad, seg_s, seg_e, t1, t2, hkey, hmask, hlen, hcode,
                stream_out, seg_out):
    """Run the fused C scan+emit into preallocated buffers; returns the
    stream length, or None when the kernel is unavailable (numpy path)."""
    dll = get_lib()
    if dll is None:
        return None
    cp = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(cp(ct))

    return int(dll.encode_scan(
        ptr(pad, ctypes.c_uint8),
        ptr(seg_s, ctypes.c_int64), ptr(seg_e, ctypes.c_int64),
        ctypes.c_int64(len(seg_s)),
        ptr(t1, ctypes.c_uint8), ptr(t2, ctypes.c_uint8),
        ptr(hkey, ctypes.c_uint64), ptr(hmask, ctypes.c_uint64),
        ptr(hlen, ctypes.c_int32), ptr(hcode, ctypes.c_uint8),
        ptr(stream_out, ctypes.c_uint8), ptr(seg_out, ctypes.c_int64)))


def fcode_decode(suffix, plens, slens, out_buf):
    """Run the C front-coding decode; returns output bytes written, or
    None when the kernel is unavailable (python fallback)."""
    dll = get_lib()
    if dll is None:
        return None
    cp = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(cp(ct))

    return int(dll.fcode_decode(
        ptr(suffix, ctypes.c_uint8),
        ptr(plens, ctypes.c_int64), ptr(slens, ctypes.c_int64),
        ctypes.c_int64(len(plens)), ptr(out_buf, ctypes.c_uint8)))


def decode_stream(stream, counts, sym_flat, sym_off, sym_len,
                  out_buf, out_offsets):
    """Run the C decode; returns total output bytes, or None when the
    kernel is unavailable (numpy path)."""
    dll = get_lib()
    if dll is None:
        return None
    cp = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(cp(ct))

    i64 = ctypes.c_int64
    return int(dll.decode_stream(
        ptr(stream, ctypes.c_uint8), i64(len(stream)),
        ptr(counts, i64), i64(len(counts)),
        ptr(sym_flat, ctypes.c_uint8), ptr(sym_off, i64), ptr(sym_len, i64),
        ptr(out_buf, ctypes.c_uint8), ptr(out_offsets, i64)))


def count_grams(keys, lens):
    """Exact (key, len) -> count via the C open-addressing counter.

    Returns ``(uniq_key, uniq_len, count)`` in HASH-SLOT order (callers
    must not depend on it — fsst.build_symbol_table re-sorts with a total
    order), or None when the kernel is unavailable (numpy grouping path).
    """
    import numpy as np

    dll = get_lib()
    if dll is None or keys.size == 0:
        return None
    n = keys.size
    tab_size = 1 << max(int(2 * n - 1).bit_length(), 4)
    # only cnt marks occupancy (cnt==0 = empty): key/len slots are written
    # before they are ever compared, so they can stay uninitialized
    tab_key = np.empty(tab_size, dtype=np.uint64)
    tab_len = np.empty(tab_size, dtype=np.int64)
    tab_cnt = np.zeros(tab_size, dtype=np.int64)
    out_key = np.empty(n, dtype=np.uint64)
    out_len = np.empty(n, dtype=np.int64)
    out_cnt = np.empty(n, dtype=np.int64)
    cp = ctypes.POINTER

    def ptr(a, ct):
        return a.ctypes.data_as(cp(ct))

    i64 = ctypes.c_int64
    m = int(dll.count_grams(
        ptr(np.ascontiguousarray(keys), ctypes.c_uint64),
        ptr(np.ascontiguousarray(lens), i64), i64(n),
        ptr(tab_key, ctypes.c_uint64), ptr(tab_len, i64), ptr(tab_cnt, i64),
        i64(tab_size),
        ptr(out_key, ctypes.c_uint64), ptr(out_len, i64), ptr(out_cnt, i64)))
    return out_key[:m], out_len[:m], out_cnt[:m]
