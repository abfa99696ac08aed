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
    """Inlined hot loop: ~an order of magnitude faster than going through
    BitWriter method calls (BitWriter stays as the readable reference and
    is exercised against this in tests)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = ts.size
    buf = bytearray(n.to_bytes(8))
    if n == 0:
        return bytes(buf)
    buf += (int(ts[0]) & _M64).to_bytes(8)
    if n == 1:
        return bytes(buf)
    deltas = np.diff(ts)
    dods = np.concatenate([deltas[:1], np.diff(deltas)]).tolist()
    acc = 0
    nb = 0
    for d in dods:
        if d == 0:
            acc <<= 1
            nb += 1
        elif -63 <= d <= 64:
            acc = (acc << 9) | (0b10 << 7) | (d + 63)
            nb += 9
        elif -255 <= d <= 256:
            acc = (acc << 12) | (0b110 << 9) | (d + 255)
            nb += 12
        elif -2047 <= d <= 2048:
            acc = (acc << 16) | (0b1110 << 12) | (d + 2047)
            nb += 16
        else:
            acc = (acc << 68) | (0b1111 << 64) | (d & _M64)
            nb += 68
        while nb >= 64:
            nb -= 64
            buf += ((acc >> nb) & _M64).to_bytes(8)
            acc &= (1 << nb) - 1
    if nb:
        pad = (-nb) % 8
        buf += ((acc << pad) & ((1 << (nb + pad)) - 1)).to_bytes((nb + pad) // 8)
    return bytes(buf)


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


_M64 = (1 << 64) - 1


def encode_values(values: np.ndarray) -> bytes:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = bits.size
    buf = bytearray(n.to_bytes(8))
    if n == 0:
        return bytes(buf)
    xors = np.bitwise_xor(bits[1:], bits[:-1]).tolist()
    buf += int(bits[0]).to_bytes(8)
    lead, mlen, shift = 65, 0, 64  # previous window: invalid sentinel
    acc = 0
    nb = 0
    for x in xors:
        if x == 0:
            acc <<= 1
            nb += 1
        else:
            xl = 64 - x.bit_length()
            xt = (x & -x).bit_length() - 1
            if mlen > 0 and xl >= lead and xt >= shift:
                acc = (acc << (2 + mlen)) | (0b10 << mlen) | (x >> shift)
                nb += 2 + mlen
            else:
                lead = xl if xl < 63 else 63
                mlen = 64 - lead - xt
                shift = xt
                acc = (
                    (acc << (14 + mlen))
                    | (0b11 << (12 + mlen))
                    | (lead << (6 + mlen))
                    | ((mlen - 1) << mlen)
                    | (x >> xt)
                )
                nb += 14 + mlen
        while nb >= 64:
            nb -= 64
            buf += ((acc >> nb) & _M64).to_bytes(8)
            acc &= (1 << nb) - 1
    if nb:
        pad = (-nb) % 8
        buf += ((acc << pad) & ((1 << (nb + pad)) - 1)).to_bytes((nb + pad) // 8)
    return bytes(buf)


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
