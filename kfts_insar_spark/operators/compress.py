"""Compressed retention tiers: pack each (source, coarse bucket) series into
Gorilla binary columns, and unpack for verification / time-travel reads.

groupBy(source, chunk).applyInPandas — one codec call per bucket, Arrow
batched; zero per-row Python. Chunk width defaults to 1 day of raw points
(288 × 300 s), the same granularity the retention policy expires at, so
dropping an expired chunk is a partition delete, never a rewrite.

val_codec wire format (since round 4): 1 tag byte + stream.

- tag 0x01 — fixed-width zigzag-delta int stream: the chunk's values are
  all exactly int64-representable (token SUMS are — they're sums of
  integer counts carried in float64, exact below 2^53), so they are cast
  to int64 and packed as v0 + per-chunk-width zigzag deltas
  (:func:`~..functions.codec.encode_ints_chunked`). XOR-packing
  near-integer doubles wastes ~3× the bits: two close integer doubles
  differ across most of the mantissa (~45 meaningful bits), while their
  integer delta fits 10-20 bits. This is both the bytes/point win and the
  scaling win — the compress stage was pinned to the host's DRAM-stream
  ceiling (BENCH_CLUSTER.md), and this moves ~⅓ the bytes through the
  packer; decode of this form is branch-free (no control-bit walk).
- tag 0x00 — Gorilla XOR float stream (unchanged wire form after the tag),
  used whenever any value in the chunk is fractional / NaN / ≥ 2^53
  (e.g. the seq_gorilla_roundtrip_frac oracle's fractional values).

ts_codec wire format (also since round 4): 1 tag byte + stream.

- tag 0x00 — the delta-of-delta stream unchanged after the tag.
- tag 0x02 — GCD-scaled dod: 4-byte big-endian g (> 1, the GCD of the
  chunk's timestamp deltas), then the standard dod stream of the SCALED
  series t0 + (ts − t0)/g. Bucket timestamps sit on a coarse grid
  (300 s raw tier), so every delta — and every gap-induced dod — is a
  multiple of the grid step; dividing by g moves dods from the 13/17-bit
  buckets into the 8/10-bit ones (~0.80 → ~0.5 B/pt on gappy series).
  Encode and decode are the UNCHANGED dod codec over the scaled series
  plus one affine map per chunk.

The tag is per CHUNK, so mixed tiers (integer sums next to fractional
averages, regular next to irregular grids) pick the right codec row by
row. Decode dispatches on the tag and runs each subset through its
lockstep decoder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import (
    decode_ints_lockstep,
    decode_timestamps_lockstep,
    decode_values_lockstep,
    encode_ints_chunked,
    encode_timestamps_chunked,
    encode_values_chunked,
)
from ..schema import COMPRESSED_TIER

CHUNK_SECONDS = 86400

# Wire-format version of the per-chunk tagged codec streams. Bumped when the
# byte layout changes (v2 = round-4 tagged streams; pre-round-4 untagged
# streams have NO version property and are rejected at read time — an old
# ts stream's first byte is 0x00, which would silently parse as tag 0 with
# the whole stream shifted by one byte). Recorded in the compressed tier's
# snapshot properties by the pipeline and checked by ``Pipeline.read_tier``.
CODEC_FORMAT = 2

_TS_TAGS = frozenset({0x00, 0x02})
_VAL_TAGS = frozenset({0x00, 0x01})


def compress_tier(
    tier: DataFrame,
    value_col: str = "sum_tok",
    chunk_seconds: int = CHUNK_SECONDS,
    num_buckets: int = 256,
) -> DataFrame:
    """tier(source, bucket_es, <value_col>, …) → COMPRESSED_TIER rows.

    Grouping key is a coarse hash bucket of (source, chunk) — NOT the chunk
    itself — so each applyInPandas call packs thousands of chunks through
    the chunk-vectorized encoders (one packbits per stream per call). A
    per-chunk grouping pays ~0.3 ms of pandas overhead per call, which
    dominates everything when chunks are small."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized across ALL chunks in the group: one lexsort, one
        # boundary scan, one packbits per stream — per-chunk Python cost
        # (pandas groupby slices + per-chunk encoders) dominated when chunks
        # are small (measured 0.6 ms/chunk → ~µs/chunk here)
        src = pdf["source"].to_numpy()
        chunk = pdf["_chunk"].to_numpy(np.int64)
        ts = pdf["bucket_es"].to_numpy(np.int64)
        vals = pdf["_v"].to_numpy(np.float64)
        order = np.lexsort((ts, chunk, src))
        src, chunk, ts, vals = src[order], chunk[order], ts[order], vals[order]
        boundary = np.empty(len(src), dtype=bool)
        boundary[0] = True
        boundary[1:] = (src[1:] != src[:-1]) | (chunk[1:] != chunk[:-1])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(src)))
        n_chunks = len(starts)
        chunk_id = np.repeat(np.arange(n_chunks), counts)

        # ---- timestamps: per-chunk GCD scaling (tag 0x02) when g > 1
        first = np.zeros(len(ts), dtype=bool)
        first[starts] = True
        d = np.empty(len(ts), dtype=np.int64)
        d[1:] = ts[1:] - ts[:-1]
        d[0] = 0
        d[first] = 0
        g_c = np.gcd.reduceat(np.abs(d), starts)  # gcd(0, x) == x
        scaled_c = (g_c > 1) & (g_c < 2**32)  # g is a 4-byte field
        ts_codecs: list[bytes] = [b""] * n_chunks
        for want in (scaled_c, ~scaled_c):
            if not want.any():
                continue
            pts = want[chunk_id]
            sub_starts = np.concatenate(
                [[0], np.cumsum(counts[want])[:-1]]
            ).astype(np.int64)
            sub_ts = ts[pts]
            if want is scaled_c:
                g_pt = g_c[chunk_id][pts]
                t0_pt = ts[starts][chunk_id][pts]
                sub_ts = t0_pt + (sub_ts - t0_pt) // g_pt
            enc = encode_timestamps_chunked(sub_ts, sub_starts)
            if want is scaled_c:
                for j, c in zip(np.flatnonzero(want), enc):
                    ts_codecs[j] = (
                        b"\x02" + int(g_c[j]).to_bytes(4, "big") + c
                    )
            else:
                for j, c in zip(np.flatnonzero(want), enc):
                    ts_codecs[j] = b"\x00" + c

        # per-chunk codec choice: int dod (tag 0x01) when every value is
        # exactly int64-representable, Gorilla XOR (tag 0x00) otherwise
        exact = (
            np.isfinite(vals)
            & (np.abs(vals) < 2.0**53)
            & (vals == np.rint(vals))
        )
        all_int = np.logical_and.reduceat(exact, starts)
        val_codecs: list[bytes] = [b""] * n_chunks
        for want, tag, enc_fn, cast in (
            (all_int, b"\x01", encode_ints_chunked, np.int64),
            (~all_int, b"\x00", encode_values_chunked, np.float64),
        ):
            if not want.any():
                continue
            pts = want[chunk_id]
            sub_counts = counts[want]
            sub_starts = np.concatenate(
                [[0], np.cumsum(sub_counts)[:-1]]
            ).astype(np.int64)
            for j, c in zip(
                np.flatnonzero(want),
                enc_fn(vals[pts].astype(cast), sub_starts),
            ):
                val_codecs[j] = tag + c
        return pd.DataFrame(
            {
                "source": src[starts],
                "bucket_es": chunk[starts],
                "n_points": counts.astype(np.int32),
                "ts_codec": ts_codecs,
                "val_codec": val_codecs,
            }
        )

    chunked = tier.select(
        "source",
        "bucket_es",
        F.col(value_col).cast("double").alias("_v"),
        (F.floor(F.col("bucket_es") / F.lit(chunk_seconds)) * F.lit(chunk_seconds))
        .cast("long")
        .alias("_chunk"),
    )
    bucketed = chunked.withColumn(
        "_b", F.pmod(F.xxhash64("source", "_chunk"), F.lit(num_buckets))
    )
    return bucketed.groupBy("_b").applyInPandas(pack, schema=COMPRESSED_TIER)


def decompress_tier(comp: DataFrame, value_name: str = "value") -> DataFrame:
    """Inverse of :func:`compress_tier` (verification / time-travel reads).

    Decodes ALL chunks in the Arrow batch in LOCKSTEP (vectorized gathers
    into one shared bit matrix) instead of a per-chunk per-bit Python
    reader — variable-length codes are sequential within a stream but
    thousands of streams advance together."""
    schema = f"source string, bucket_es long, {value_name} double"
    import pyarrow as pa

    out_pa = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("bucket_es", pa.int64()),
            pa.field(value_name, pa.float64()),
        ]
    )

    def unpack(it):
        for rb in it:
            if rb.num_rows == 0:
                continue
            cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
            ns = cols["n_points"].to_numpy().astype(np.int64)
            tc = cols["ts_codec"].to_pylist()
            for c in tc:
                if not c or c[0] not in _TS_TAGS:
                    raise ValueError(
                        "decompress_tier: unknown ts_codec tag byte "
                        f"{c[:1]!r} — corrupt chunk or pre-v{CODEC_FORMAT} "
                        "untagged stream (re-materialize the compressed tier)"
                    )
            ttags = np.array([c[0] for c in tc], dtype=np.int64)
            max_n = int(ns.max(initial=0))
            ts_mat = np.zeros((len(tc), max(max_n, 1)), dtype=np.int64)
            plain = np.flatnonzero(ttags == 0)
            if len(plain):
                m = decode_timestamps_lockstep(
                    [tc[i][1:] for i in plain], ns[plain]
                )
                ts_mat[plain[:, None], np.arange(m.shape[1])[None, :]] = m
            scl = np.flatnonzero(ttags == 2)
            if len(scl):
                g = np.array(
                    [int.from_bytes(tc[i][1:5], "big") for i in scl],
                    dtype=np.int64,
                )
                m = decode_timestamps_lockstep(
                    [tc[i][5:] for i in scl], ns[scl]
                )
                # undo the affine map: ts = t0 + (ts_s - t0)·g
                t0 = m[:, :1]
                m = t0 + (m - t0) * g[:, None]
                ts_mat[scl[:, None], np.arange(m.shape[1])[None, :]] = m
            vc = cols["val_codec"].to_pylist()
            for c in vc:
                if not c or c[0] not in _VAL_TAGS:
                    raise ValueError(
                        "decompress_tier: unknown val_codec tag byte "
                        f"{c[:1]!r} — corrupt chunk or pre-v{CODEC_FORMAT} "
                        "untagged stream (re-materialize the compressed tier)"
                    )
            tags = np.array([c[0] for c in vc], dtype=np.int64)
            v_mat = np.zeros(ts_mat.shape, dtype=np.float64)
            gor = np.flatnonzero(tags == 0)
            if len(gor):
                m = decode_values_lockstep([vc[i][1:] for i in gor], ns[gor])
                v_mat[gor[:, None], np.arange(m.shape[1])[None, :]] = m
            ints = np.flatnonzero(tags == 1)
            if len(ints):
                m = decode_ints_lockstep(
                    [vc[i][1:] for i in ints], ns[ints]
                ).astype(np.float64)
                v_mat[ints[:, None], np.arange(m.shape[1])[None, :]] = m
            mask = np.arange(ts_mat.shape[1])[None, :] < ns[:, None]
            ridx, cidx = np.nonzero(mask)
            # Arrow-native expansion: the source strings replicate through a
            # C-level take on the incoming Arrow column instead of 10^7
            # per-row python string objects through pandas
            yield pa.RecordBatch.from_arrays(
                [
                    pa.compute.take(
                        cols["source"], pa.array(ridx, type=pa.int64())
                    ),
                    pa.array(ts_mat[ridx, cidx], type=pa.int64()),
                    pa.array(v_mat[ridx, cidx], type=pa.float64()),
                ],
                schema=out_pa,
            )

    return comp.mapInArrow(unpack, schema=schema)
