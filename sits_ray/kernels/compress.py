"""Time-series block compression: delta-of-delta timestamps + Gorilla
XOR-encoded float values (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015).

This is the transcript-domain analog of the reference's INT2S+scale
on-disk band encoding (``R/api_reduce.R:245-254``): the compact physical
representation of a regular per-series metric block. Encoded blocks are
stored as Arrow ``binary`` column values in the tier Parquet; decoding
must round-trip bit-exact (tested in ``tests/test_compress.py``).

Layout (big-endian bit stream, MSB first):

timestamps (int64 microseconds):
  [u64 count][i64 t0]  then for point 1: zigzag-varint-bits delta0 encoded
  with the same class table as deltas-of-deltas; for point i>=2 the
  delta-of-delta D:
    D == 0                  -> '0'
    D in [-63, 64]          -> '10'  + 7  bits (D + 63)
    D in [-255, 256]        -> '110' + 9  bits (D + 255)
    D in [-2047, 2048]      -> '1110'+ 12 bits (D + 2047)
    else                    -> '1111'+ 64 bits (D mod 2^64)

values (float64):
  [u64 count][raw 64-bit v0] then per value, X = bits(v) XOR bits(prev):
    X == 0 -> '0'
    else '1' then:
      leading/trailing zeros of X fit the previous window -> '0' + the
        previous window's meaningful bits
      else '1' + 6 bits leading-zero count + 6 bits (meaningful-length - 1)
        + meaningful bits
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = nbits
        while remaining > 0:
            byte_i, bit_i = divmod(pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            remaining -= take
        self.pos = pos
        return out


_DOD_CLASSES = (  # (prefix_bits, prefix_len, value_bits, bias)
    (0b10, 2, 7, 63),
    (0b110, 3, 9, 255),
    (0b1110, 4, 12, 2047),
)


def _write_dod(w: BitWriter, d: int) -> None:
    if d == 0:
        w.write(0, 1)
        return
    for prefix, plen, bits, bias in _DOD_CLASSES:
        if -bias <= d <= bias + 1:
            w.write(prefix, plen)
            w.write(d + bias, bits)
            return
    w.write(0b1111, 4)
    w.write(d & ((1 << 64) - 1), 64)


def _read_dod(r: BitReader) -> int:
    if r.read(1) == 0:
        return 0
    for _, _, bits, bias in _DOD_CLASSES:
        if r.read(1) == 0:
            return r.read(bits) - bias
    v = r.read(64)
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    ts = np.asarray(ts_us, dtype=np.int64)
    w = BitWriter()
    n = ts.size
    w.write(n, 64)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    _write_dod(w, int(deltas[0]))
    dods = np.diff(deltas)
    for d in dods:
        _write_dod(w, int(d))
    return w.getvalue()


def decode_timestamps(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(64)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    if t0 >= (1 << 63):
        t0 -= 1 << 64
    out[0] = t0
    if n == 1:
        return out
    delta = _read_dod(r)
    out[1] = out[0] + delta
    for i in range(2, n):
        delta += _read_dod(r)
        out[i] = out[i - 1] + delta
    return out


def encode_values(values: np.ndarray) -> bytes:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = BitWriter()
    n = bits.size
    w.write(n, 64)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, mlen = 65, 0  # previous window: invalid sentinel
    for i in range(1, n):
        cur = int(bits[i])
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        xl = 64 - x.bit_length()  # leading zeros
        xt = (x & -x).bit_length() - 1  # trailing zeros
        if mlen > 0 and xl >= lead and xt >= 64 - lead - mlen:
            w.write(0, 1)
            w.write(x >> (64 - lead - mlen), mlen)
        else:
            lead = min(xl, 63)
            mlen = 64 - lead - xt
            w.write(1, 1)
            w.write(lead, 6)
            w.write(mlen - 1, 6)
            w.write(x >> xt, mlen)
    return w.getvalue()


def decode_values(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(64)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(6)
            mlen = r.read(6) + 1
        x = r.read(mlen) << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_block(ts_us: np.ndarray, values: dict[str, np.ndarray]) -> dict[str, bytes]:
    """Encode one regular series block -> {'ts': ..., 'val:<metric>': ...}."""
    out = {"ts": encode_timestamps(ts_us)}
    for name, v in values.items():
        out[f"val:{name}"] = encode_values(np.asarray(v, dtype=np.float64))
    return out


def decode_block(blocks: dict[str, bytes]) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    ts = decode_timestamps(blocks["ts"])
    vals = {k[4:]: decode_values(v) for k, v in blocks.items() if k.startswith("val:")}
    return ts, vals
