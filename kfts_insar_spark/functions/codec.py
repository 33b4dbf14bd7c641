"""Gorilla-style time-series compression: delta-of-delta timestamps +
XOR-packed float values (Facebook Gorilla, VLDB'15 — public algorithm).

Role in the engine (SURVEY.md §2.10): rolled-up series are packed per
(source, coarse-bucket) into binary columns for the retention tiers. This is
the principled replacement for the reference's *lossy* state compression
(it discards covariance cross-terms and keeps only diag σ,
/root/reference/kf/KF_class.py:353-369 — comment at :227 admits the
approximation); our tier encoding is bit-exact lossless.

Encode runs inside an Arrow-batched grouped UDF — once per bucket, never per
row. Decode is the verification path (tests + time-travel reads).

Bit layout
----------
timestamps (int64 seconds, monotone within bucket):
  header: t0 (64b), d0 = t1−t0 (zigzag 64b)  [n from the column count]
  then per point: dod = (t_k − t_{k−1}) − (t_{k−1} − t_{k−2}) in buckets
    '0'                      dod == 0
    '10'  + 7b  zigzag       −63 … 64
    '110' + 9b  zigzag       −255 … 256
    '1110'+ 12b zigzag       −2047 … 2048
    '1111'+ 64b zigzag       otherwise
values (float64 bit patterns):
  header: v0 (64b)
  then per point, x = bits(v_k) XOR bits(v_{k−1}):
    '0'                      x == 0
    '10'  + meaningful bits  leading/trailing-zero window ⊇ previous window
    '11'  + 6b lead + 6b len + bits   new window
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------- bit plumbing
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
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------- timestamps
def encode_timestamps(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    w = BitWriter()
    n = len(ts)
    if n == 0:
        return b""
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    d0 = int(ts[1]) - int(ts[0])
    w.write(_zigzag(d0), 64)
    deltas = np.diff(ts)
    dods = np.diff(deltas)
    for dod in dods:
        dod = int(dod)
        z = _zigzag(dod)
        if dod == 0:
            w.write(0b0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(z, 7 + 1)  # zigzag of ±64 needs 8 bits
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(z, 10)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(z, 13)
        else:
            w.write(0b1111, 4)
            w.write(z, 64)
    return w.getvalue()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = BitReader(data)
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    out = [t0]
    if n == 1:
        return np.asarray(out, dtype=np.int64)
    delta = _unzigzag(r.read(64))
    out.append(t0 + delta)
    for _ in range(n - 2):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(8))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(10))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(13))
        else:
            dod = _unzigzag(r.read(64))
        delta += dod
        out.append(out[-1] + delta)
    return np.asarray(out, dtype=np.int64)


# -------------------------------------------------------------------- values
def encode_values(vals: np.ndarray) -> bytes:
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = BitWriter()
    n = len(bits)
    if n == 0:
        return b""
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    lead, tail = 65, 0  # sentinel: no previous window
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0b0, 1)
            continue
        cl = 64 - x.bit_length()  # leading zeros
        ct = (x & -x).bit_length() - 1  # trailing zeros
        cl = min(cl, 31)  # cap so 5/6-bit headers suffice (Gorilla spec)
        if cl >= lead and ct >= tail:
            w.write(0b10, 2)
            w.write(x >> tail, 64 - lead - tail)
        else:
            lead, tail = cl, ct
            sig = 64 - lead - tail
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(sig - 1, 6)  # store len−1 so sig=64 fits in 6 bits
            w.write(x >> tail, sig)
    return w.getvalue()


def decode_values(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = BitReader(data)
    prev = r.read(64)
    out = [prev]
    lead, tail = 65, 0
    for _ in range(n - 1):
        if r.read(1) == 0:
            out.append(prev)
            continue
        if r.read(1) == 0:
            sig = 64 - lead - tail
            x = r.read(sig) << tail
        else:
            lead = r.read(6)
            sig = r.read(6) + 1
            tail = 64 - lead - sig
            x = r.read(sig) << tail
        prev ^= x
        out.append(prev)
    return np.asarray(out, dtype=np.uint64).view(np.float64)


def gorilla_roundtrip_ok(ts: np.ndarray, vals: np.ndarray) -> bool:
    """decode∘encode == identity, bitwise (FIXTURES.md F5 property)."""
    n = len(ts)
    t2 = decode_timestamps(encode_timestamps(ts), n)
    v2 = decode_values(encode_values(vals), n)
    return bool(
        np.array_equal(t2, np.asarray(ts, dtype=np.int64))
        and np.array_equal(
            v2.view(np.uint64), np.asarray(vals, dtype=np.float64).view(np.uint64)
        )
    )
