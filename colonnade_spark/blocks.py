"""Self-describing block format + codec auto-selection.

A block = one column × one row range, framed as::

    b"CSPB" | version u8 | codec_id u8 | header_len u32le | header JSON | payload

The JSON header is the ``Headed`` regime of the reference (named,
self-describing columns — /root/reference/colonnade/src/Colonnade/Encode.hs:
499-500); ``strip_header``/``reattach_header`` give the ``Headless``/
``Indexed`` positional regime (Encode.hs:515-516, siphon/src/Siphon/Types.hs:
25-27) where the header travels in an external manifest instead.

Unlike the reference's CSV chunking (content-oblivious: a cell may span
chunks, handled by parser continuations — Siphon.hs:612-616), blocks are
row-aligned and size-capped: decode never needs cross-block state
(SURVEY.md §4.3, the one deliberate physical divergence).
"""

from __future__ import annotations

import base64
import json
import zlib

import numpy as np
import pyarrow as pa

from .codecs import BY_ID, BY_NAME, EncodeContext, compute_stats, from_arrow, to_arrow

MAGIC = b"CSPB"
VERSION = 1

#: selection candidates in deterministic tie-break order (lower wins ties).
#: deliberately all LIGHTWEIGHT codecs (north rule: dict/RLE/FSST/bit-pack/
#: FOR family) — general-purpose DEFLATE is available as the post-encode
#: fmap (encode_block(post="zlib")), not as a selection candidate.
_CANDIDATE_ORDER = ("plain", "forbp", "delta", "dict", "rle", "alpha4",
                    "fcode", "fsst", "fbss")


class BlockError(ValueError):
    """Typed decode error with coordinates — the SiphonError analog
    (/root/reference/siphon/src/Siphon/Types.hs:35-59)."""


#: probe gating: once the same codec wins _GATE_STREAK consecutive chunks of
#: a column stream, skip the losers' estimates and keep that codec, with a
#: full re-probe every _GATE_REPROBE-th chunk (content drift, e.g. a stripe
#: crossing into another language's files).  The gate state lives in the
#: EncodeContext — already per-(bucket, column) stream state — so selection
#: stays a pure function of the chunk sequence (resume/determinism intact).
#: The auto-path plain fallback in encode_block still bounds every block at
#: <= plain even when the gated pick goes stale.
_GATE_STREAK = 3
_GATE_REPROBE = 16


def select_codec(col, stats, ctx, exclude=()) -> str:
    """Argmin of estimated encoded size over applicable candidates.

    ``plain`` is always applicable, so the result is never worse than the
    plain baseline (BASELINE.md compressed-size bound, structural)."""
    gate = ctx.extras.get("sel_gate")
    if gate is None:
        gate = ctx.extras["sel_gate"] = {"idx": 0, "last": None, "streak": 0}
    idx = gate["idx"]
    gate["idx"] = idx + 1
    if (not exclude and gate["streak"] >= _GATE_STREAK
            and idx % _GATE_REPROBE != 0
            and BY_NAME[gate["last"]].applicable(col, stats)):
        return gate["last"]
    best_name, best_est = "plain", None
    for name in _CANDIDATE_ORDER:
        if name in exclude:
            continue
        codec = BY_NAME[name]
        if not codec.applicable(col, stats):
            continue
        est = codec.estimate(col, stats, ctx)
        if best_est is None or est < best_est:
            best_name, best_est = name, est
    if not exclude:        # retry probes (exclude != ()) don't teach the gate
        if best_name == gate["last"]:
            gate["streak"] += 1
        else:
            gate["last"], gate["streak"] = best_name, 1
    return best_name


def encode_block(arr: pa.Array, codec: str = "auto", exclude=(),
                 ctx: EncodeContext | None = None,
                 post: str | None = None) -> bytes:
    """Encode one arrow array into a framed, self-describing block.

    ``ctx`` may be passed in to reuse expensive per-column scratch (the FSST
    symbol table) across successive chunks of the same column — the
    build-once / fold-many plan reuse of the reference
    (/root/reference/colonnade/src/Colonnade/Encode.hs:560-566).

    With ``codec="auto"`` the encoded payload is *guaranteed* <= the plain
    payload: if the estimate-selected codec turns out worse on the actual
    data (estimates are sample-based), we fall back to plain post-hoc.

    ``post`` is the user-facing post-encode ``fmap``
    (/root/reference/colonnade/src/Colonnade/Encode.hs:569: map content
    AFTER the cell encoder runs): an optional transform over the already-
    encoded payload, recorded in the header and inverted on decode.
    Currently ``"zlib"`` (DEFLATE over the block payload).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # config validation BEFORE any early return: a bogus codec/post name
    # must raise on EVERY batch, not only non-empty ones (otherwise the
    # error is partitioning-dependent — whether it surfaces depends on
    # which worker sees an empty tail batch)
    if codec != "auto" and codec not in BY_NAME:
        raise BlockError(f"unknown codec {codec!r}; have {sorted(BY_NAME)}")
    if post is not None and post != "zlib":
        raise BlockError(f"unknown post-encode transform {post!r}")
    if _is_supported_list(arr.type):
        return _encode_list_block(arr, codec=codec, ctx=ctx, post=post,
                                  exclude=exclude)
    col, validity = from_arrow(arr)
    header: dict = {"n": col.n, "k": col.kind, "t": col.arrow_type}
    if validity is not None:
        header["v"] = base64.b64encode(
            np.packbits(validity, bitorder="little").tobytes()).decode("ascii")
    if col.n == 0:
        return _frame(BY_NAME["plain"].codec_id, header, b"")
    arr_nonnull = arr.fill_null({"str": "", "int": 0, "float": 0.0, "bool": False}
                                [col.kind]) if arr.null_count else arr
    stats = compute_stats(col, arr_nonnull)
    if ctx is None:
        ctx = EncodeContext()
    auto = codec == "auto"
    if auto:
        name = select_codec(col, stats, ctx, exclude)
    else:
        name = codec
        if name not in BY_NAME:
            raise BlockError(f"unknown codec {name!r}; have {sorted(BY_NAME)}")
        if not BY_NAME[name].applicable(col, stats):
            raise BlockError(
                f"codec {name!r} not applicable to kind={col.kind} column "
                f"({col.arrow_type}, n={col.n})")
    c = BY_NAME[name]
    params, payload = c.encode(col, stats, ctx)
    if auto and name != "plain":
        plain = BY_NAME["plain"]
        if len(payload) >= plain.estimate(col, stats, ctx):
            c = plain
            params, payload = plain.encode(col, stats, ctx)
    if params:
        header["p"] = params
    if post is not None:
        if post != "zlib":
            raise BlockError(f"unknown post-encode transform {post!r}")
        payload = zlib.compress(bytes(payload), 6)
        header["z"] = 1
    header["crc"] = zlib.crc32(payload)
    return _frame(c.codec_id, header, payload)


def decode_block(buf: bytes | memoryview) -> pa.Array:
    codec_id, header, payload = _unframe(buf)
    if "f" in header:
        raise BlockError(
            f"block is cell fragment {header['f']}: a fragmented cell needs "
            f"its full set — use decode_cell_fragments")
    if header["n"] == 0:
        base = pa.type_for_alias(header["t"])
        if header.get("k") == "list":
            # list headers store t = VALUE type; an empty list block must
            # still decode to the list type (an empty tail batch of an
            # embedding column otherwise comes back as bare float)
            base = pa.large_list(base) if header.get("lg") else pa.list_(base)
        return pa.array([], type=base)
    if header.get("crc") is not None and zlib.crc32(payload) != header["crc"]:
        raise BlockError(f"crc mismatch in block (codec_id={codec_id})")
    if header.get("z"):
        payload = memoryview(zlib.decompress(payload))
    if header["k"] == "list":
        return _decode_list_block(header, payload)
    codec = BY_ID.get(codec_id)
    if codec is None:
        raise BlockError(f"unknown codec id {codec_id}")
    col = codec.decode(payload, header.get("p", {}), header["n"], header["k"], header["t"])
    validity = None
    if "v" in header:
        bits = np.frombuffer(base64.b64decode(header["v"]), dtype=np.uint8)
        validity = np.unpackbits(bits, bitorder="little")[: header["n"]].astype(bool)
    return to_arrow(col, validity)


# --------------------------------------------------------------------------
# list columns (array<primitive>) — composite child + lengths block
# --------------------------------------------------------------------------
#
# The embeddings/training-pipeline case: an ``array<float>`` column rides
# the SAME block store as flat columns by decomposing into its arrow parts
# and recursively encoding each with the normal codec machinery — child
# values (one concatenated primitive array → fbss/forbp/fsst pick up the
# usual wins) and per-row lengths (constant for fixed-dim embeddings → RLE
# collapses them).  One level only (value types: numeric/string); outer
# nulls ride the header validity like every other block.

def _is_supported_list(t: pa.DataType) -> bool:
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        return False
    v = t.value_type
    return (pa.types.is_floating(v) or pa.types.is_integer(v)
            or pa.types.is_string(v) or pa.types.is_boolean(v))


def _encode_list_block(arr: pa.Array, codec: str = "auto",
                       ctx: EncodeContext | None = None,
                       post: str | None = None, exclude=()) -> bytes:
    import pyarrow.compute as pc

    lens = pc.fill_null(pc.list_value_length(arr), 0)
    lens64 = pa.array(np.asarray(lens, dtype=np.int64))
    child = pc.list_flatten(arr)            # values of non-null slots only
    sub_ctx = ctx if ctx is not None else EncodeContext()
    child_blk = encode_block(child, codec=codec, ctx=sub_ctx,
                             exclude=exclude)
    lens_blk = encode_block(lens64, exclude=exclude)
    payload = b"".join([len(child_blk).to_bytes(4, "little"),
                        child_blk, lens_blk])
    header: dict = {"n": len(arr), "k": "list",
                    "t": str(arr.type.value_type),
                    "lg": 1 if pa.types.is_large_list(arr.type) else 0}
    if arr.null_count:
        validity = np.asarray(arr.is_valid())
        header["v"] = base64.b64encode(
            np.packbits(validity, bitorder="little").tobytes()).decode("ascii")
    if post is not None:
        if post != "zlib":
            raise BlockError(f"unknown post-encode transform {post!r}")
        payload = zlib.compress(payload, 6)
        header["z"] = 1
    header["crc"] = zlib.crc32(payload)
    return _frame(BY_NAME["plain"].codec_id, header, payload)


def _decode_list_block(header: dict, payload) -> pa.Array:
    payload = memoryview(payload)
    clen = int.from_bytes(payload[:4], "little")
    child = decode_block(payload[4: 4 + clen])
    lens = np.asarray(decode_block(payload[4 + clen:]), dtype=np.int64)
    off_dtype = np.int64 if header.get("lg") else np.int32
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(off_dtype)
    mask = None
    if "v" in header:
        bits = np.frombuffer(base64.b64decode(header["v"]), dtype=np.uint8)
        valid = np.unpackbits(bits, bitorder="little")[: header["n"]].astype(bool)
        mask = pa.array(~valid)
    cls = pa.LargeListArray if header.get("lg") else pa.ListArray
    return cls.from_arrays(pa.array(offsets), child, mask=mask)


# --------------------------------------------------------------------------
# multi-block cells (a single cell spanning several blocks)
# --------------------------------------------------------------------------
#
# The reference's CSV chunking lets one cell span chunk boundaries, resumed
# by parser continuations (/root/reference/siphon/src/Siphon.hs:612-616 —
# `Continue`/`commit` across chunk refills).  Blocks here are row-aligned,
# so the analog is at the CELL level: a single cell larger than the stripe
# cap is split into `nfrag` framed fragment blocks (header "f": [i, nfrag]),
# each carrying a byte slice of the raw cell.  Fragments bound block size
# (and sidestep the 2 GiB int32-offset cliff: each fragment is well under
# it, and reassembly can target large types).  decode_block refuses a lone
# fragment — reassembly needs the full set, via decode_cell_fragments.

_FRAG_KINDS = {"str", "bin"}


def encode_cell_fragments(arr: pa.Array, frag_bytes: int,
                          post: str | None = None) -> list[bytes]:
    """Split a single oversized var-width cell across multiple framed blocks.

    ``arr`` must be a one-row string/binary array (the stripe cutter already
    isolates such rows).  Each fragment is independently integrity-checked
    (per-fragment crc) and optionally post-compressed (the fmap ``post``,
    applied per fragment so decode can stream them)."""
    if len(arr) != 1:
        raise BlockError(f"cell fragmentation takes a 1-row array, got {len(arr)}")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        kind = "str"
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        kind = "bin"
    else:
        raise BlockError(f"cell fragmentation needs string/binary, got {t}")
    if arr.null_count:
        raise BlockError("a null cell is never oversized; refuse to fragment")
    v = arr[0].as_py()
    raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    frag_bytes = max(int(frag_bytes), 1)
    nfrag = max((len(raw) + frag_bytes - 1) // frag_bytes, 1)
    frames = []
    for i in range(nfrag):
        payload = raw[i * frag_bytes:(i + 1) * frag_bytes]
        header = {"n": 1, "k": kind, "t": str(t), "f": [i, nfrag]}
        if post is not None:
            if post != "zlib":
                raise BlockError(f"unknown post-encode transform {post!r}")
            payload = zlib.compress(payload, 6)
            header["z"] = 1
        header["crc"] = zlib.crc32(payload)
        frames.append(_frame(BY_NAME["plain"].codec_id, header, payload))
    return frames


def iter_cell_fragments(frames, meta_out: dict | None = None):
    """Stream one fragmented cell as index-ordered byte chunks WITHOUT ever
    materializing the whole cell — the >2 GiB-cell scale path (an arrow
    scalar caps at 2 GiB; a chunk iterator does not).

    Fragments may arrive in any order; only out-of-order fragments are
    buffered, so index-ordered arrival streams in O(one fragment) memory.
    Per-fragment crc is validated on arrival, completeness when the input
    is exhausted (the generator raises BlockError at that point — consumers
    must drain it before trusting the prefix).  Chunks are raw payload
    bytes: a ``str`` cell is UTF-8 and a chunk may end mid-codepoint — use
    ``codecs.getincrementaldecoder("utf-8")`` on the consumer side.

    ``meta_out`` (optional dict) receives ``{"k": kind, "t": arrow_type,
    "n": n_fragments}`` as soon as the first fragment arrives.

    The reference analog is the resumable parser continuation for cells
    spanning chunk boundaries (/root/reference/siphon/src/Siphon.hs:612-616)
    — there the chunking is the CSV transport's, here it is the fragment
    blocks'.
    """
    pending: dict[int, bytes] = {}
    nfrag = kind = typ = None
    nxt = 0
    for buf in frames:
        i, n, payload, k, t = fragment_chunk(buf)
        if nfrag is None:
            nfrag, kind, typ = n, k, t
            if meta_out is not None:
                meta_out.update({"k": kind, "t": typ, "n": nfrag})
        elif (n, k, t) != (nfrag, kind, typ):
            raise BlockError("inconsistent fragment set (mixed cells?)")
        if i < nxt or i in pending:
            raise BlockError(f"duplicate cell fragment {i}/{nfrag}")
        if i >= nfrag:
            # would sit in `pending` forever and the nxt==nfrag completeness
            # check would still pass — reject corrupt indexes on arrival
            raise BlockError(f"cell fragment index {i} out of range "
                             f"(set has {nfrag} fragments)")
        pending[i] = payload
        while nxt in pending:
            yield pending.pop(nxt)
            nxt += 1
    if pending:
        raise BlockError(f"stray cell fragments never yielded: "
                         f"{sorted(pending)}")
    if nfrag is None or nxt != nfrag:
        missing = sorted(set(range(nfrag or 0)) - set(range(nxt))
                         - set(pending))
        raise BlockError(f"incomplete cell fragment set: missing {missing}")


def fragment_chunk(buf) -> tuple[int, int, bytes, str, str]:
    """Decode ONE fragment block standalone → (frag_idx, n_frags, payload
    bytes, kind, arrow_type).  Per-fragment crc validated; post-transform
    inverted.  The unit the distributed chunked decode maps over
    (engine.decode_giant_cells) — no cross-fragment state needed."""
    codec_id, header, payload = _unframe(buf)
    f = header.get("f")
    if f is None:
        raise BlockError("not a cell fragment (no 'f' in header)")
    i, n = int(f[0]), int(f[1])
    if header.get("crc") is not None and zlib.crc32(payload) != header["crc"]:
        raise BlockError(f"crc mismatch in cell fragment {i}/{n}")
    if header.get("z"):
        payload = zlib.decompress(payload)
    return i, n, bytes(payload), header["k"], header["t"]


def decode_cell_fragments(frames) -> pa.Array:
    """Reassemble one cell from its fragment blocks (any order — fragments
    carry their index).  Validates completeness, duplicates, and per-fragment
    crc; returns a 1-row arrow array of the original type.  (Materializing
    form of :func:`iter_cell_fragments` — fine below the 2 GiB arrow scalar
    ceiling, use the iterator above it.)"""
    meta: dict = {}
    raw = b"".join(iter_cell_fragments(frames, meta_out=meta))
    atype = pa.type_for_alias(meta["t"])
    scalar = raw.decode("utf-8") if meta["k"] == "str" else raw
    return pa.array([scalar], type=atype)


def is_fragment(buf: bytes | memoryview) -> bool:
    _codec_id, header, _payload = _unframe(buf)
    return "f" in header


def block_info(buf: bytes | memoryview) -> dict:
    codec_id, header, payload = _unframe(buf)
    return {"codec": BY_ID[codec_id].name, "codec_id": codec_id,
            "payload_bytes": len(payload), **header}


def strip_header(buf: bytes | memoryview) -> tuple[dict, bytes]:
    """Headless mode: split a block into (manifest header dict, bare frame)."""
    codec_id, header, payload = _unframe(buf)
    return ({"codec_id": codec_id, **header},
            bytes(payload))


def reattach_header(manifest: dict, payload: bytes) -> bytes:
    m = dict(manifest)
    codec_id = m.pop("codec_id")
    return _frame(codec_id, m, payload)


def _frame(codec_id: int, header: dict, payload: bytes) -> bytes:
    hj = json.dumps(header, separators=(",", ":"), sort_keys=True).encode()
    return b"".join([MAGIC, bytes([VERSION, codec_id]),
                     len(hj).to_bytes(4, "little"), hj, payload])


def _unframe(buf: bytes | memoryview):
    buf = memoryview(buf)
    if len(buf) < 10 or bytes(buf[:4]) != MAGIC:
        raise BlockError("bad block magic or truncated frame")
    if buf[4] != VERSION:
        raise BlockError(f"unsupported block version {buf[4]}")
    codec_id = buf[5]
    hlen = int.from_bytes(buf[6:10], "little")
    if 10 + hlen > len(buf):
        raise BlockError("truncated block header")
    try:
        header = json.loads(bytes(buf[10:10 + hlen]))
    except ValueError as e:
        raise BlockError(f"corrupt block header: {e}") from e
    return codec_id, header, buf[10 + hlen:]
