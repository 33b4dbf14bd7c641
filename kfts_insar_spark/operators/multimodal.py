"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with typed metadata and runs decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs. The image/audio codecs are NOT in this
container, so the decode step is STUBBED (deterministic fake by default,
`NotImplementedError` in strict mode) — but everything Spark-side is real
and tested: schema, partitioning, mapInPandas batch shape, UDF signatures.

Layout convention:
    payload: binary           -- opaque encoded bytes
    media_type: string        -- 'image/png', 'audio/wav', …
    meta: struct<width:int, height:int, n_channels:int, duration_ms:int>
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, n_channels:int, duration_ms:int>"
)

STRICT_DECODE = False  # True → decode raises NotImplementedError (no codecs here)


def synth_media(docs: DataFrame, media_type: str = "image/png") -> DataFrame:
    """Attach a deterministic opaque payload + metadata to each doc —
    payload = repeated md5 bytes of the text (stands in for encoded pixels),
    metadata derived from n_chars. Pure Catalyst expressions."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
            F.lit(3).cast("int").alias("n_channels"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_stub(
    payload: bytes, width: int, height: int, channels: int, strict: bool | None = None
) -> np.ndarray:
    """STUB for the real image decode (no PIL/libjpeg in this container).

    Deterministic fake: tiles the payload bytes into the declared (h, w, c)
    shape — preserving the real decode's contract (shape, dtype, per-row
    determinism) so downstream feature extraction is fully testable.
    """
    if STRICT_DECODE if strict is None else strict:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not available in this "
            "container; deterministic fake used in tests instead"
        )
    n = height * width * channels
    reps = -(-n // len(payload))
    flat = np.frombuffer(payload * reps, dtype=np.uint8)[:n]
    return flat.reshape(height, width, channels)


# fingerprint = Σ hist[j]·31^j mod 2^31−1 — integer-vectorizable across the
# whole batch (counts ≤ 10^4, powers < 2^31 → products < 2^45, exact int64)
_FP_MOD = 2147483647
_FP_POWS = np.array([pow(31, j, _FP_MOD) for j in range(16)], dtype=np.int64)


def decode_features(
    media: DataFrame, batch_docs: int = 1024, strict: bool | None = None
) -> DataFrame:
    """decode → feature-extract as a mapInPandas operator.

    Emits per-doc features: mean per channel, overall std, and a 16-bin
    intensity-histogram fingerprint. Decode is inherently per-item (the
    codec boundary — stubbed here); EVERYTHING downstream is batch numpy:
    segments concatenated once, channel sums via np.add.reduceat over the
    (pixels, channels) view, histograms via one bincount over
    doc_index·16 + (byte >> 4), fingerprints as an integer polynomial —
    no per-row Python beyond the decode call.
    """
    schema = (
        "doc_id long, mean_c0 double, mean_c1 double, mean_c2 double, "
        "std_all double, hist_fp long"
    )
    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_channels").alias("n_channels"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            w = pdf["width"].to_numpy(np.int64)
            h = pdf["height"].to_numpy(np.int64)
            cc = pdf["n_channels"].to_numpy(np.int64)
            sizes = w * h * cc
            # per-item decode ONLY (codec boundary)
            seg = np.concatenate(
                [
                    _decode_stub(bytes(p), int(wi), int(hi), int(ci), strict).reshape(-1)
                    for p, wi, hi, ci in zip(pdf["payload"], w, h, cc)
                ]
            )
            offs = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(sizes, out=offs[1:])

            means = np.full((B, 3), np.nan)
            stds = np.empty(B)
            # vectorize per distinct channel count (one group in practice)
            seg64 = seg.astype(np.int64)
            segsq = seg64 * seg64
            for c in np.unique(cc):
                rows = np.flatnonzero(cc == c)
                # gather this group's segments contiguously
                take = np.concatenate(
                    [np.arange(offs[i], offs[i + 1]) for i in rows]
                ) if len(rows) < B else None
                g = seg64 if take is None else seg64[take]
                gsq = segsq if take is None else segsq[take]
                gsizes = sizes[rows]
                goffs = np.zeros(len(rows) + 1, dtype=np.int64)
                np.cumsum(gsizes, out=goffs[1:])
                m2 = g.reshape(-1, c)
                ch_sums = np.add.reduceat(m2, goffs[:-1] // c, axis=0)  # (Bg,c)
                npix = (gsizes // c).astype(np.float64)
                means[rows, : min(c, 3)] = (ch_sums[:, :3] / npix[:, None])[
                    :, : min(c, 3)
                ]
                sum_all = ch_sums.sum(axis=1)
                sumsq = np.add.reduceat(gsq, goffs[:-1])
                mean_all = sum_all / gsizes
                var = sumsq / gsizes - mean_all * mean_all
                stds[rows] = np.sqrt(np.maximum(var, 0.0))

            # 16-bin histogram per doc in ONE bincount over a combined key
            doc_idx = np.repeat(np.arange(B, dtype=np.int64), sizes)
            hist = np.bincount(
                doc_idx * 16 + (seg >> 4), minlength=B * 16
            ).reshape(B, 16)
            fp = (hist.astype(np.int64) * _FP_POWS).sum(axis=1) % _FP_MOD

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mean_c0": means[:, 0],
                    "mean_c1": means[:, 1],
                    "mean_c2": means[:, 2],
                    "std_all": stds,
                    "hist_fp": fp,
                }
            )

    return flat.mapInPandas(run, schema=schema)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    at a fixed timestamp stride (the standard pre-training video treatment:
    sample k frames, then run the image path on each).

    The container has no video codec, so per-frame decode is the same
    deterministic stub seeded by (payload, frame index) — the contract a
    real decoder honors: frame count from duration, per-frame determinism,
    (h, w, c) shape from metadata. Everything after the decode boundary is
    batch numpy: one concatenate, one reduceat for per-frame means.

    Scale: explode factor is bounded (≤ max_frames per doc) and declared
    up front, so the output row count is predictable; the operator is a
    narrow mapInPandas (no shuffle) and downstream feature extraction
    reuses :func:`decode_features` on the exploded frames."""
    schema = (
        "doc_id long, frame_idx int, ts_ms int, payload binary, "
        "width int, height int, mean_intensity double"
    )
    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_idx, out_ts, out_pay, out_w, out_h = [], [], [], [], [], []
            segs, sizes = [], []
            for doc_id, payload, w, h, c, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"],
                pdf["n_channels"], pdf["duration_ms"],
            ):
                n_frames = min(max_frames, max(1, int(dur) // every_ms))
                for k in range(n_frames):
                    # per-frame decode ONLY (codec boundary): the stub
                    # varies deterministically by frame via a rotated
                    # payload — a real decoder seeks to ts_ms instead
                    rot = k % max(1, len(payload))
                    fbytes = bytes(payload[rot:]) + bytes(payload[:rot])
                    img = _decode_stub(fbytes, int(w), int(h), int(c))
                    out_doc.append(doc_id)
                    out_idx.append(k)
                    out_ts.append(k * every_ms)
                    out_pay.append(img.tobytes())
                    out_w.append(int(w))
                    out_h.append(int(h))
                    segs.append(img.reshape(-1))
                    sizes.append(img.size)
            if not segs:
                continue
            # batch numpy beyond the decode boundary: one concat + reduceat
            seg = np.concatenate(segs).astype(np.int64)
            offs = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(np.asarray(sizes, dtype=np.int64), out=offs[1:])
            sums = np.add.reduceat(seg, offs[:-1])
            means = sums / np.asarray(sizes, dtype=np.float64)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": np.asarray(out_idx, dtype=np.int32),
                    "ts_ms": np.asarray(out_ts, dtype=np.int32),
                    "payload": out_pay,
                    "width": np.asarray(out_w, dtype=np.int32),
                    "height": np.asarray(out_h, dtype=np.int32),
                    "mean_intensity": means,
                }
            )

    return flat.mapInPandas(run, schema=schema)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over opaque PCM-ish payloads: RMS energy,
    zero-crossing count, and peak amplitude per doc. The codec boundary is
    the same stub (payload bytes reinterpreted as a centered int16-like
    waveform); every feature is computed across the batch with one
    concatenate + reduceat — no per-row Python beyond the decode."""
    schema = "doc_id long, n_samples int, rms double, zero_crossings int, peak int"
    flat = media.select("doc_id", "payload", F.col("meta.duration_ms").alias("dur"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            waves = []
            sizes = np.empty(B, dtype=np.int64)
            for i, (payload, dur) in enumerate(zip(pdf["payload"], pdf["dur"])):
                # decode stub: tile payload to 8 samples/ms, center at 0
                n = max(8, (int(dur) // 1000) * 8)
                # empty payload → silence (all-zero wave), mirroring
                # frame_sample's max(1, len) guard for the same case
                src = bytes(payload) if len(payload) else b"\x80"
                reps = -(-n // len(src))
                w = np.frombuffer(src * reps, dtype=np.uint8)[:n]
                waves.append(w.astype(np.int64) - 128)
                sizes[i] = n
            seg = np.concatenate(waves)
            offs = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(sizes, out=offs[1:])
            sq = seg * seg
            rms = np.sqrt(np.add.reduceat(sq, offs[:-1]) / sizes)
            sign = (seg >= 0).astype(np.int8)
            flips = np.abs(np.diff(sign.astype(np.int16)))
            # zero crossings within each doc: total flips minus boundary flips
            total = np.add.reduceat(
                np.concatenate([flips, [0]]), offs[:-1]
            )
            # subtract the flip that straddles each doc boundary (it was
            # counted into the left doc's reduceat bucket)
            boundary = np.zeros(B, dtype=np.int64)
            boundary[:-1] = flips[offs[1:-1] - 1]
            zc = total - boundary
            peak = np.maximum.reduceat(np.abs(seg), offs[:-1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_samples": sizes.astype(np.int32),
                    "rms": rms,
                    "zero_crossings": zc.astype(np.int32),
                    "peak": peak.astype(np.int32),
                }
            )

    return flat.mapInPandas(run, schema=schema)


def resize_stub(media: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Resize = decode → subsample → re-encode; with the codec stubbed this
    keeps the byte plumbing honest: output payload is a deterministic
    subsample of the fake-decoded array."""
    schema = "doc_id long, payload binary, media_type string, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        th, tw = target
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                img = _decode_stub(
                    bytes(payload), meta["width"], meta["height"], meta["n_channels"]
                )
                ys = np.linspace(0, img.shape[0] - 1, th).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, tw).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append((doc_id, small.tobytes(), mtype, tw, th))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "media_type", "width", "height"]
            )

    return media.mapInPandas(run, schema=schema)
