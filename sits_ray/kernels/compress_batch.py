"""Batch-vectorized Gorilla encoders.

Encodes MANY series per call with numpy — no per-value Python. Two
deliberate deviations from the scalar encoder in
:mod:`sits_ray.kernels.compress` (bitstream-compatible with its decoders,
pinned by round-trip tests):

* values: the previous-window reuse branch is never taken (every nonzero
  XOR emits the '11' + 6-bit lead + 6-bit len + meaningful-bits form).
  Reuse requires sequential state; dropping it makes the encoder fully
  data-parallel at a small ratio cost (~12 extra bits per value when the
  window would have been stable).
* the output bytes therefore differ from the scalar encoder's, but decode
  to identical data (tests assert round-trip equality, not byte equality).

Implementation: per batch, compute every value's (hi-code, hi-bits,
lo-code, lo-bits) vectorized, lay all series into ONE zero-initialized
bit array (each series starts at a byte boundary: [u64 count][u64 first]
[codes...][pad]), scatter the code bits with <=78 vectorized passes (one
per bit position, masked), then ``np.packbits`` once and slice per-series
byte ranges.
"""

from __future__ import annotations

import numpy as np

_U1 = np.uint64(1)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit_length for uint64 via float exponent + rounding fix."""
    f = x.astype(np.float64)
    # frexp: f = m * 2**e with 0.5 <= m < 1  ->  e == bit_length normally
    _, e32 = np.frexp(f)
    e = e32.astype(np.int64)
    # float rounding may push x up across a power of two: correct down.
    # For x==0 frexp gives e==0, so e-1 clamps to 0 and the shift test
    # (0 >> 0 == 0) would flag it — but e[x==0] is forced to 0 anyway.
    em1 = np.minimum(np.maximum(e - 1, 0), 63).view(np.uint64)
    over = (x >> em1) == 0
    e[over] -= 1
    e[x == 0] = 0
    # values near 2**64 round up to 2**64 in float (e=65) but bl is 64
    return np.minimum(e, 64)


def _ctz_u64(x: np.ndarray) -> np.ndarray:
    """Trailing zeros of nonzero uint64 (exact: isolated low bit is a
    power of two, float-representable)."""
    iso = x & (~x + _U1)
    return _bit_length_u64(iso) - 1


_M64np = np.uint64(0xFFFFFFFFFFFFFFFF)


def _or_field(words: np.ndarray, pos: np.ndarray, F: np.ndarray, klen: np.ndarray) -> None:
    """OR a <=64-bit field ``F`` of ``klen`` bits at absolute bit position
    ``pos`` into a big-endian uint64 word array: each field touches at most
    two words -> two ``bitwise_or.at`` passes (fast-pathed for uint64 on
    this numpy — measured FASTER than a sorted reduceat merge), no per-bit
    loops. Non-negative int64 shift counts are reinterpreted as uint64 via
    zero-copy ``.view`` (an ``astype`` would copy; mixing int64 with uint64
    operands would upcast to float64)."""
    live = klen > 0
    if not live.all():
        pos, F, klen = pos[live], F[live], klen[live]
    if pos.size == 0:
        return
    w = pos >> 6
    # chain the offset arithmetic in-place (first-touch page faults on
    # fresh arrays are the measured bottleneck on this host, not ALU):
    # sh <- 64 - ((pos & 63) + klen), then reuse its buffer for the
    # shifted contribution
    sh = pos & 63
    np.add(sh, klen, out=sh)
    np.subtract(64, sh, out=sh)        # negative iff the field spills
    s_idx = np.flatnonzero(sh < 0)
    spill = (-sh[s_idx]).view(np.uint64) if s_idx.size else None
    np.maximum(sh, 0, out=sh)
    contrib1 = np.left_shift(F, sh.view(np.uint64), out=sh.view(np.uint64))
    if s_idx.size:
        contrib1[s_idx] = F[s_idx] >> spill
        np.bitwise_or.at(words, w, contrib1)
        contrib2 = (F[s_idx] << (np.uint64(64) - spill)) & _M64np
        np.bitwise_or.at(words, w[s_idx] + 1, contrib2)
    else:
        np.bitwise_or.at(words, w, contrib1)


def _scatter_codes(
    words: np.ndarray,
    pos: np.ndarray,
    hi: np.ndarray,
    hi_len: np.ndarray,
    lo: np.ndarray,
    lo_len: np.ndarray,
) -> None:
    """Write variable-length (hi,lo) codes MSB-first at ``pos``: hi then lo.
    Zero-valued single-bit codes need no write (words start zeroed)."""
    nz = hi != 0
    _or_field(words, pos[nz], hi[nz], hi_len[nz])
    _or_field(words, pos + hi_len, lo, lo_len)


def _assemble(
    offsets: np.ndarray,
    coded_series: np.ndarray,   # series index per coded element
    nbits: np.ndarray,          # total code length per coded element
    hi: np.ndarray, hi_len: np.ndarray,
    lo: np.ndarray, lo_len: np.ndarray,
    counts: np.ndarray,         # per-series element count (header)
    firsts: np.ndarray,         # per-series first raw 64-bit value (header)
) -> tuple[np.ndarray, np.ndarray]:
    """Lay out all series into one byte buffer. Returns ``(buf, start_byte)``
    — series ``i`` is ``buf[start_byte[i]:start_byte[i+1]]``. Callers wrap
    as a Python list (:func:`_to_blocks`) or zero-copy Arrow binary
    (:func:`_to_binary_array`)."""
    n_series = counts.size
    bit_sum = np.zeros(n_series, dtype=np.int64)
    if coded_series.size:
        # coded_series is sorted: per-series runs are contiguous, so one
        # reduceat replaces the unbuffered add.at
        fm = np.empty(coded_series.size, dtype=bool)
        fm[0] = True
        np.not_equal(coded_series[1:], coded_series[:-1], out=fm[1:])
        first_idx = np.flatnonzero(fm)
        sid = coded_series[first_idx]
        bit_sum[sid] = np.add.reduceat(nbits, first_idx)
    byte_len = 16 + (bit_sum + 7) // 8
    empty = counts == 0
    byte_len[empty] = 8  # only the count header
    start_byte = np.concatenate([[0], np.cumsum(byte_len)])
    total_bytes = int(start_byte[-1])

    n_words = (total_bytes + 7) // 8
    words = np.zeros(n_words, dtype=np.uint64)
    if coded_series.size:
        # absolute bit position of each code: fold the per-series payload
        # start and the first-code cumsum correction into ONE per-series
        # base so the hot path is a single gather + add
        within = np.cumsum(nbits)
        within -= nbits
        series_base = np.zeros(n_series, dtype=np.int64)
        series_base[sid] = (start_byte[sid] + 16) * 8 - within[first_idx]
        pos = series_base[coded_series] + within
        _scatter_codes(words, pos, hi, hi_len, lo, lo_len)

    words.byteswap(inplace=True)  # big-endian wire order, no extra copy
    out = words.view(np.uint8)[:total_bytes]
    # headers: big-endian u64 count (+ u64 first value when nonempty)
    sh = np.arange(56, -8, -8, dtype=np.uint64)
    hdr_pos = start_byte[:-1][:, None] + np.arange(8)[None, :]
    out[hdr_pos] = ((counts.astype(np.uint64)[:, None] >> sh[None, :]) & np.uint64(0xFF)).astype(np.uint8)
    ne = ~empty
    if ne.any():
        vpos = start_byte[:-1][ne][:, None] + 8 + np.arange(8)[None, :]
        out[vpos] = ((firsts[ne][:, None] >> sh[None, :]) & np.uint64(0xFF)).astype(np.uint8)

    return out, start_byte


def _to_blocks(buf: np.ndarray, start_byte: np.ndarray) -> list[bytes]:
    b = buf.tobytes()
    return [
        b[start_byte[i] : start_byte[i + 1]] for i in range(start_byte.size - 1)
    ]


def _to_binary_array(buf: np.ndarray, start_byte: np.ndarray):
    """Zero-copy wrap of the assembled buffer as ``pa.BinaryArray`` — no
    per-series Python bytes objects, no ``pa.array(list)`` re-copy."""
    import pyarrow as pa

    if start_byte[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "encoded batch exceeds 2 GiB; lower the encode batch_size"
        )
    offs32 = start_byte.astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        start_byte.size - 1,
        [None, pa.py_buffer(offs32), pa.py_buffer(buf)],
    )


class _Layout:
    """Per-batch series layout shared by every metric encoded over the SAME
    ``offsets`` (one ``np.repeat`` + mask instead of one per metric)."""

    __slots__ = ("offsets", "counts", "nz_series", "coded_mask", "cs")

    def __init__(self, offsets: np.ndarray):
        offsets = np.asarray(offsets, dtype=np.int64)
        self.offsets = offsets
        n_series = offsets.size - 1
        self.counts = offsets[1:] - offsets[:-1]
        self.nz_series = self.counts > 0
        n = int(offsets[-1])
        is_first = np.zeros(n, dtype=bool)
        is_first[offsets[:-1][self.nz_series]] = True
        self.coded_mask = ~is_first
        series_of = np.repeat(np.arange(n_series), self.counts)
        self.cs = series_of[self.coded_mask]


def _encode_values_core(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Gorilla-XOR encode many float64 series. ``flat`` is the concatenated
    values; ``offsets`` (len n_series+1) delimits series."""
    flat = np.ascontiguousarray(flat, dtype=np.float64)
    bits64 = flat.view(np.uint64)
    if layout is None:
        layout = _Layout(offsets)
    offsets = layout.offsets
    n_series = offsets.size - 1
    counts = layout.counts
    firsts = np.zeros(n_series, dtype=np.uint64)
    nz_series = layout.nz_series
    firsts[nz_series] = bits64[offsets[:-1][nz_series]]

    n = flat.size
    if n:
        x = np.empty(n, dtype=np.uint64)
        x[0] = 0
        x[1:] = bits64[1:] ^ bits64[:-1]
    else:
        x = np.empty(0, dtype=np.uint64)

    cs = layout.cs
    xc = x[layout.coded_mask]

    # compute codes on the NONZERO subset only (zero XOR = repeated value
    # = single '0' bit; count metrics repeat constantly, so the subset is
    # often much smaller than the batch), then scatter into full-size
    # code arrays — replaces five full-width np.where passes
    m = xc.size
    inz = np.flatnonzero(xc)
    xnz = xc[inz]
    bl = _bit_length_u64(xnz)
    ctz = _ctz_u64(xnz)
    lead = np.minimum(64 - bl, 63)
    mlen = 64 - lead - ctz  # >= 1 for any nonzero xor

    nbits = np.ones(m, dtype=np.int64)
    nbits[inz] = 14 + mlen
    hi = np.zeros(m, dtype=np.uint64)
    hi[inz] = (
        (np.uint64(0b11) << np.uint64(12))
        | (lead.view(np.uint64) << np.uint64(6))
        | (mlen - 1).view(np.uint64)
    )
    hi_len = np.ones(m, dtype=np.int64)
    hi_len[inz] = 14
    lo = np.zeros(m, dtype=np.uint64)
    lo[inz] = xnz >> ctz.view(np.uint64)
    lo_len = np.zeros(m, dtype=np.int64)
    lo_len[inz] = mlen

    return _assemble(offsets, cs, nbits, hi, hi_len, lo, lo_len, counts, firsts)


def encode_values_batch(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
) -> list[bytes]:
    return _to_blocks(*_encode_values_core(flat, offsets, layout))


def encode_values_arrow(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
):
    """Like :func:`encode_values_batch` but returns a zero-copy
    ``pa.BinaryArray`` (the hot path for the fused exchange encode)."""
    return _to_binary_array(*_encode_values_core(flat, offsets, layout))


_DOD_BOUNDS = np.array([0, 64, 256, 2048], dtype=np.int64)
# per-class code tables: [zero, 7-bit, 9-bit, 12-bit, raw-64]
_TS_HI_LEN = np.array([1, 2, 3, 4, 4], dtype=np.int64)
_TS_HI = np.array([0, 0b10, 0b110, 0b1110, 0b1111], dtype=np.uint64)
_TS_LO_LEN = np.array([0, 7, 9, 12, 64], dtype=np.int64)
_TS_BIAS = np.array([0, 63, 255, 2047, 0], dtype=np.int64)


def _encode_timestamps_core(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Delta-of-delta encode many int64-microsecond series (same class
    table as the scalar encoder; first delta coded like a dod)."""
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    if layout is None:
        layout = _Layout(offsets)
    offsets = layout.offsets
    counts = layout.counts
    n_series = offsets.size - 1
    firsts = np.zeros(n_series, dtype=np.uint64)
    nzs = layout.nz_series
    starts = offsets[:-1][nzs]
    if starts.size:
        firsts[nzs] = flat[starts].view(np.uint64)

    n = flat.size
    d = np.zeros(n, dtype=np.int64)
    if n > 1:
        d[1:] = flat[1:] - flat[:-1]
    dod = np.zeros(n, dtype=np.int64)
    if n > 2:
        dod[2:] = d[2:] - d[1:-1]
    if n > 1:
        dod[1] = d[1]
    # per-series resets: position s (raw header) is masked out below; the
    # second element (s+1) carries delta0 rather than a cross-series dod;
    # positions >= s+2 already use purely in-series deltas
    s1 = starts[counts[nzs] >= 2] + 1
    dod[s1] = flat[s1] - flat[s1 - 1]

    cs = layout.cs
    dc = dod[layout.coded_mask]

    # class id 0..4 by dod magnitude (one comparison chain, then small
    # lookup tables indexed by class — cheaper than five np.select passes)
    cls = (
        (dc != 0).astype(np.int8)
        + ((dc < -63) | (dc > 64))
        + ((dc < -255) | (dc > 256))
        + ((dc < -2047) | (dc > 2048))
    )
    hi_len = _TS_HI_LEN[cls]
    hi = _TS_HI[cls]
    lo_len = _TS_LO_LEN[cls]
    bias = _TS_BIAS[cls]
    lo = np.where(cls == 4, dc.view(np.uint64), (dc + bias).view(np.uint64))
    nbits = hi_len + lo_len

    return _assemble(offsets, cs, nbits, hi, hi_len, lo, lo_len, counts, firsts)


def encode_timestamps_batch(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
) -> list[bytes]:
    return _to_blocks(*_encode_timestamps_core(flat, offsets, layout))


def encode_timestamps_arrow(
    flat: np.ndarray, offsets: np.ndarray, layout: _Layout | None = None
):
    """Like :func:`encode_timestamps_batch` but returns a zero-copy
    ``pa.BinaryArray``."""
    return _to_binary_array(*_encode_timestamps_core(flat, offsets, layout))


# --- batch decoders ---------------------------------------------------------
# Decode MANY series per call: all series advance in lockstep, one code per
# step, with every bit-field extraction vectorized across the still-active
# series (the decode twin of the batch encoders above; VERDICT r1 #7).
# Accepts BOTH encoder dialects: the scalar encoder's previous-window reuse
# ('10' control) and the batch encoder's always-explicit ('11') form.

def _concat_blocks(blocks) -> tuple[np.ndarray, np.ndarray, int]:
    """Accepts a Python ``list[bytes]`` OR an Arrow binary array /
    chunked column: the Arrow form is already the concatenation (offsets +
    one values buffer), so decode needs no per-row ``as_py`` — one padded
    copy of the values buffer, O(bytes) not O(rows) Python. Returns
    ``(padded buffer, per-block start offsets, n_blocks)``."""
    if not isinstance(blocks, list):
        import pyarrow as pa

        if isinstance(blocks, pa.ChunkedArray):
            blocks = blocks.combine_chunks()
        # binary arrays expose no .offsets accessor: read the int32 offsets
        # buffer directly, honoring a possible slice offset
        raw = np.frombuffer(blocks.buffers()[1], dtype=np.int32)
        offs = raw[blocks.offset : blocks.offset + len(blocks) + 1].astype(
            np.int64
        )
        lo, hi = int(offs[0]), int(offs[-1])
        data = np.frombuffer(blocks.buffers()[-1], dtype=np.uint8)[lo:hi]
        buf = np.empty(data.size + 16, dtype=np.uint8)
        buf[: data.size] = data
        buf[data.size :] = 0
        return buf, offs - lo, offs.size - 1
    lens = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=len(blocks))
    starts = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(blocks) + b"\x00" * 16, dtype=np.uint8)
    return buf, starts, len(blocks)


def _read64(buf: np.ndarray, bitpos: np.ndarray) -> np.ndarray:
    """Big-endian 64-bit window starting at each absolute bit position."""
    byte_i = bitpos >> 3
    o = (bitpos & 7).astype(np.uint64)
    idx = byte_i[:, None] + np.arange(9)
    b = buf[idx].astype(np.uint64)
    w = np.zeros(bitpos.size, np.uint64)
    for j in range(8):
        w = (w << np.uint64(8)) | b[:, j]
    return (w << o) | (b[:, 8] >> (np.uint64(8) - o))


def decode_values_batch(blocks) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_values_batch` (and of the scalar
    ``encode_values``): value blocks (``list[bytes]`` or Arrow binary
    array) -> (flat float64, offsets)."""
    buf, bstarts, k = _concat_blocks(blocks)
    if k == 0:
        return np.empty(0, np.float64), np.zeros(1, np.int64)
    heads = bstarts[:-1]
    counts = _read64(buf, heads * 8).astype(np.int64)
    out_offs = np.concatenate([[0], np.cumsum(counts)])
    flat = np.empty(int(out_offs[-1]), np.uint64)
    nz = counts > 0
    prev = np.zeros(k, np.uint64)
    prev[nz] = _read64(buf, (heads[nz] + 8) * 8)
    flat[out_offs[:-1][nz]] = prev[nz]
    pos = (heads + 16) * 8
    lead = np.zeros(k, np.uint64)
    mlen = np.zeros(k, np.uint64)
    done = np.ones(k, np.int64)
    active = np.flatnonzero(counts > done)
    while active.size:
        a = active
        w = _read64(buf, pos[a])
        nzv = (w >> np.uint64(63)) != 0
        adv = np.ones(a.size, np.int64)
        idx = np.flatnonzero(nzv)
        if idx.size:
            an, wn = a[idx], w[idx]
            is11 = ((wn >> np.uint64(62)) & np.uint64(1)) != 0
            lead[an[is11]] = (wn[is11] >> np.uint64(56)) & np.uint64(0x3F)
            mlen[an[is11]] = ((wn[is11] >> np.uint64(50)) & np.uint64(0x3F)) + np.uint64(1)
            hdr = np.where(is11, 14, 2).astype(np.int64)
            ml = mlen[an]  # >= 1 for any valid stream
            w2 = _read64(buf, pos[an] + hdr)
            m_bits = w2 >> (np.uint64(64) - ml)
            prev[an] ^= m_bits << (np.uint64(64) - lead[an] - ml)
            adv[idx] = hdr + ml.astype(np.int64)
        flat[out_offs[a] + done[a]] = prev[a]
        pos[a] += adv
        done[a] += 1
        active = a[counts[a] > done[a]]
    return flat.view(np.float64), out_offs


def decode_timestamps_batch(blocks) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_timestamps_batch` (and of the scalar
    ``encode_timestamps``): ts blocks (``list[bytes]`` or Arrow binary
    array) -> (flat int64 us, offsets)."""
    buf, bstarts, k = _concat_blocks(blocks)
    if k == 0:
        return np.empty(0, np.int64), np.zeros(1, np.int64)
    heads = bstarts[:-1]
    counts = _read64(buf, heads * 8).astype(np.int64)
    out_offs = np.concatenate([[0], np.cumsum(counts)])
    flat = np.empty(int(out_offs[-1]), np.int64)
    nz = counts > 0
    prev = np.zeros(k, np.int64)
    prev[nz] = _read64(buf, (heads[nz] + 8) * 8).view(np.int64)
    flat[out_offs[:-1][nz]] = prev[nz]
    pos = (heads + 16) * 8
    delta = np.zeros(k, np.int64)
    done = np.ones(k, np.int64)
    active = np.flatnonzero(counts > done)
    while active.size:
        a = active
        w = _read64(buf, pos[a])
        b = [((w >> np.uint64(63 - i)) & np.uint64(1)).astype(np.int64) for i in range(4)]
        cls = np.select(
            [b[0] == 0, b[1] == 0, b[2] == 0, b[3] == 0], [0, 1, 2, 3], 4
        )
        v1 = ((w >> np.uint64(55)) & np.uint64(0x7F)).astype(np.int64) - 63
        v2 = ((w >> np.uint64(52)) & np.uint64(0x1FF)).astype(np.int64) - 255
        v3 = ((w >> np.uint64(48)) & np.uint64(0xFFF)).astype(np.int64) - 2047
        dod = np.select([cls == 1, cls == 2, cls == 3], [v1, v2, v3], 0)
        c4 = np.flatnonzero(cls == 4)
        if c4.size:
            dod[c4] = _read64(buf, pos[a[c4]] + 4).view(np.int64)
        adv = np.select(
            [cls == 0, cls == 1, cls == 2, cls == 3], [1, 9, 12, 16], 68
        ).astype(np.int64)
        first = done[a] == 1  # second element carries delta0, not a dod
        delta[a] = np.where(first, dod, delta[a] + dod)
        prev[a] += delta[a]
        flat[out_offs[a] + done[a]] = prev[a]
        pos[a] += adv
        done[a] += 1
        active = a[counts[a] > done[a]]
    return flat, out_offs
