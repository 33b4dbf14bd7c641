"""Codec round-trip vectors (FIXTURES.md F5): decode∘encode == identity,
bitwise for doubles, across deterministic and adversarial series."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kfts_insar_spark.functions.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
    gorilla_roundtrip_ok,
)
from kfts_insar_spark.operators.compress import compress_tier, decompress_tier
from kfts_insar_spark.operators.rollup import rollup_raw
from kfts_insar_spark.synth import sequences

CASES = [
    ("empty", np.empty(0, np.int64), np.empty(0, np.float64)),
    ("single", np.array([1767225600], np.int64), np.array([3.14])),
    ("constant", np.arange(100, dtype=np.int64) * 300, np.full(100, 7.5)),
    ("ramp", np.arange(500, dtype=np.int64) * 300 + 10**9, np.arange(500) * 1.25),
    (
        "jitter",
        np.cumsum(np.r_[10**9, np.abs(np.random.default_rng(1).integers(1, 5000, 99))]).astype(np.int64),
        np.random.default_rng(2).normal(0, 1e6, 100),
    ),
    (
        "adversarial",
        np.array([0, 1, 2, 10**12, 10**12 + 1], np.int64),
        np.array([0.0, -0.0, np.inf, -np.inf, 5e-324]),  # denormal + signed inf
    ),
    ("nan", np.arange(4, dtype=np.int64), np.array([1.0, np.nan, np.nan, -1.0])),
]


@pytest.mark.parametrize("name,ts,vals", CASES, ids=[c[0] for c in CASES])
def test_roundtrip_vectors(name, ts, vals):
    assert gorilla_roundtrip_ok(ts, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(2**40), 2**40), max_size=60),
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=60
    ),
)
def test_roundtrip_property(ts, vals):
    n = min(len(ts), len(vals))
    ts = np.sort(np.asarray(ts[:n], dtype=np.int64))
    vals = np.asarray(vals[:n], dtype=np.float64)
    t2 = decode_timestamps(encode_timestamps(ts), n)
    v2 = decode_values(encode_values(vals), n)
    assert np.array_equal(t2, ts)
    assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))


def test_compression_ratio_on_regular_series():
    """Regular grid + smooth values → far below 16 bytes/point."""
    ts = np.arange(2880, dtype=np.int64) * 300
    vals = np.round(1000 + 10 * np.sin(np.arange(2880) / 50), 2)
    nbytes = len(encode_timestamps(ts)) + len(encode_values(vals))
    assert nbytes < 2880 * 16 * 0.45, f"got {nbytes / 2880:.1f} B/point"


def test_spark_compress_roundtrip(spark):
    seq = sequences(spark, 2000)
    raw = rollup_raw(seq)
    comp = compress_tier(raw)
    back = decompress_tier(comp)
    got = sorted(
        (r.source, r.bucket_es, r.value) for r in back.collect()
    )
    want = sorted(
        (r.source, r.bucket_es, float(r.sum_tok)) for r in raw.collect()
    )
    assert got == want


@pytest.mark.parametrize("name,ts,vals", CASES, ids=[c[0] + "_vec" for c in CASES])
def test_vectorized_encoders_roundtrip(name, ts, vals):
    from kfts_insar_spark.functions.codec import (
        encode_timestamps_vec,
        encode_values_vec,
    )

    n = len(ts)
    assert np.array_equal(decode_timestamps(encode_timestamps_vec(ts), n), ts)
    v2 = decode_values(encode_values_vec(vals), n)
    assert np.array_equal(
        v2.view(np.uint64), np.asarray(vals, np.float64).view(np.uint64)
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(2**40), 2**40), max_size=60),
    st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=60),
)
def test_vectorized_roundtrip_property(ts, vals):
    from kfts_insar_spark.functions.codec import (
        encode_timestamps_vec,
        encode_values_vec,
    )

    n = min(len(ts), len(vals))
    ts = np.sort(np.asarray(ts[:n], dtype=np.int64))
    vals = np.asarray(vals[:n], dtype=np.float64)
    assert np.array_equal(decode_timestamps(encode_timestamps_vec(ts), n), ts)
    v2 = decode_values(encode_values_vec(vals), n)
    assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))


def test_chunked_encoders_match_single(spark=None):
    from kfts_insar_spark.functions.codec import (
        encode_timestamps_chunked,
        encode_values_chunked,
    )

    rng = np.random.default_rng(5)
    # 50 chunks of varying size incl. 1- and 2-point chunks
    sizes = np.r_[1, 2, rng.integers(1, 40, 48)]
    starts = np.r_[0, np.cumsum(sizes)[:-1]]
    n = sizes.sum()
    ts = np.cumsum(rng.integers(1, 4000, n)).astype(np.int64)
    vals = np.where(rng.random(n) < 0.3, 7.5, rng.normal(0, 1e5, n))
    tcs = encode_timestamps_chunked(ts, starts)
    vcs = encode_values_chunked(vals, starts)
    for c, (s, size) in enumerate(zip(starts, sizes)):
        t_chunk = ts[s : s + size]
        v_chunk = vals[s : s + size]
        assert np.array_equal(decode_timestamps(tcs[c], size), t_chunk), c
        got = decode_values(vcs[c], size)
        assert np.array_equal(got.view(np.uint64), v_chunk.view(np.uint64)), c


def test_lockstep_decoders_match_scalar():
    """Lockstep (vectorized-across-streams) decode == the per-bit scalar
    reference decoders, over streams exercising every control bucket and
    ragged lengths including n=0,1,2."""
    import numpy as np

    from kfts_insar_spark.functions.codec import (
        decode_timestamps,
        decode_timestamps_lockstep,
        decode_values,
        decode_values_lockstep,
        encode_timestamps,
        encode_values,
    )

    rng = np.random.default_rng(5)
    ts_streams, val_streams = [], []
    # dod magnitudes hitting all five buckets (0 / ±64 / ±256 / ±2048 / big)
    for n in (1, 2, 3, 7, 50, 288):
        base = rng.integers(-(2**40), 2**40)
        deltas = rng.choice(
            [0, 1, -63, 64, -255, 256, -2047, 2048, 10**7, -(10**9)],
            size=max(n - 1, 0),
        )
        ts = base + np.concatenate([[0], np.cumsum(deltas)]).astype(np.int64)[:n]
        vals = rng.normal(0, 1e3, n)
        vals[rng.random(n) < 0.3] = 0.0  # runs of identical xors
        if n > 2:
            vals[2] = vals[1]  # exact repeat → '0' control
        ts_streams.append((encode_timestamps(ts), ts))
        val_streams.append((encode_values(vals), vals))

    ns = np.array([len(t) for _, t in ts_streams])
    tmat = decode_timestamps_lockstep([d for d, _ in ts_streams], ns)
    vmat = decode_values_lockstep([d for d, _ in val_streams], ns)
    for i, ((_, ts), (_, vals)) in enumerate(zip(ts_streams, val_streams)):
        n = len(ts)
        np.testing.assert_array_equal(tmat[i, :n], ts)
        np.testing.assert_array_equal(
            vmat[i, :n].view(np.uint64), vals.view(np.uint64)
        )
        # and both agree with the scalar readers
        np.testing.assert_array_equal(
            decode_timestamps(ts_streams[i][0], n), ts
        )
        np.testing.assert_array_equal(decode_values(val_streams[i][0], n), vals)


def test_pooled_chunk_layout_never_larger_than_explicit():
    """encode_values_chunked picks pooled-vs-explicit per chunk by exact
    bit cost, so its output can never exceed the explicit-only encoder
    (encode_values_vec) on the same chunks."""
    from kfts_insar_spark.functions.codec import (
        encode_values_chunked,
        encode_values_vec,
    )

    rng = np.random.default_rng(11)
    vals = np.where(rng.random(4000) < 0.4, 42.0, rng.normal(0, 1e4, 4000))
    starts = np.arange(0, 4000, 100)
    pooled = encode_values_chunked(vals, starts)
    for c, s in enumerate(starts):
        chunk = vals[s : s + 100]
        assert len(pooled[c]) <= len(encode_values_vec(chunk)), c
        got = decode_values(pooled[c], len(chunk))
        assert np.array_equal(got.view(np.uint64), chunk.view(np.uint64))


# ------------------------------------------------------- property testing
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    finite = st.floats(
        allow_nan=False,
        allow_infinity=False,
        width=64,
        min_value=-1e15,
        max_value=1e15,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(finite, min_size=1, max_size=40), min_size=1, max_size=6
        )
    )
    def test_gorilla_value_roundtrip_property(chunks):
        """Lossless for ANY finite doubles, any chunk shapes — including
        denormal-adjacent magnitudes, sign flips, and repeated values
        (the '10'-window reuse path)."""
        import numpy as np

        from kfts_insar_spark.functions.codec import (
            decode_values_lockstep,
            encode_values_chunked,
        )

        vals = np.array([v for c in chunks for v in c], dtype=np.float64)
        starts = np.cumsum([0] + [len(c) for c in chunks[:-1]])
        ns = np.array([len(c) for c in chunks], dtype=np.int64)
        codecs = encode_values_chunked(vals, np.asarray(starts))
        mat = decode_values_lockstep([bytes(b) for b in codecs], ns)
        off = 0
        for i, n in enumerate(ns):
            got = mat[i, :n]
            want = vals[off : off + n]
            assert np.array_equal(got, want), (i, got, want)
            off += n

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=2**40),
                min_size=1,
                max_size=40,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_gorilla_timestamp_roundtrip_property(chunks):
        """Delta-of-delta is exact for ANY non-decreasing int64 sequences
        (sorted inside each chunk, arbitrary gaps — the real bucket grid
        is a special case)."""
        import numpy as np

        from kfts_insar_spark.functions.codec import (
            decode_timestamps_lockstep,
            encode_timestamps_chunked,
        )

        chunks = [sorted(c) for c in chunks]
        ts = np.array([v for c in chunks for v in c], dtype=np.int64)
        starts = np.cumsum([0] + [len(c) for c in chunks[:-1]])
        ns = np.array([len(c) for c in chunks], dtype=np.int64)
        codecs = encode_timestamps_chunked(ts, np.asarray(starts))
        mat = decode_timestamps_lockstep([bytes(b) for b in codecs], ns)
        off = 0
        for i, n in enumerate(ns):
            assert np.array_equal(mat[i, :n], ts[off : off + n])
            off += n


def test_int_codec_roundtrip_vectors():
    """Fixed-width zigzag-delta int codec (val_codec tag 0x01): exact for
    constants, single points, noise, big jumps, negatives, ±2^52."""
    from kfts_insar_spark.functions.codec import (
        decode_ints_lockstep,
        encode_ints_chunked,
    )

    rng = np.random.default_rng(7)
    chunks = [
        np.array([5], np.int64),
        np.array([7, 7, 7, 7], np.int64),
        rng.integers(-30000, 30000, 288).astype(np.int64),
        np.cumsum(rng.integers(-24000, 24000, 100)).astype(np.int64),
        np.array([2**52, -(2**52), 0, 1], np.int64),
        rng.integers(0, 2, 50).astype(np.int64),
    ]
    vals = np.concatenate(chunks)
    starts = np.cumsum([0] + [len(c) for c in chunks])[:-1]
    ns = np.array([len(c) for c in chunks], dtype=np.int64)
    enc = encode_ints_chunked(vals, np.asarray(starts))
    dec = decode_ints_lockstep([bytes(b) for b in enc], ns)
    for i, c in enumerate(chunks):
        assert np.array_equal(dec[i, : ns[i]], c), i
    # the headline property: noisy 16-bit-delta ints pack ~4× tighter than
    # the 45-bit XOR form (2 B/pt here vs ~5.6 B/pt gorilla)
    assert sum(len(e) for e in enc) / len(vals) < 2.5


def test_int_codec_roundtrip_property():
    from kfts_insar_spark.functions.codec import (
        decode_ints_lockstep,
        encode_ints_chunked,
    )

    ints = st.integers(min_value=-(2**53), max_value=2**53)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.lists(ints, min_size=1, max_size=40), min_size=1, max_size=6)
    )
    def prop(chunks):
        vals = np.array([v for c in chunks for v in c], dtype=np.int64)
        starts = np.cumsum([0] + [len(c) for c in chunks[:-1]])
        ns = np.array([len(c) for c in chunks], dtype=np.int64)
        enc = encode_ints_chunked(vals, np.asarray(starts))
        mat = decode_ints_lockstep([bytes(b) for b in enc], ns)
        off = 0
        for i, n in enumerate(ns):
            assert np.array_equal(mat[i, :n], vals[off : off + n]), i
            off += n

    prop()


def test_compress_tier_mixed_int_and_frac_chunks(spark):
    """One tier holding integer-sum chunks AND fractional chunks: each
    chunk picks its codec (tag byte) and the roundtrip is bit-exact."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = []
    rng = np.random.default_rng(11)
    for src, frac in (("ints", False), ("fracs", True), ("mixed_nan", True)):
        for k in range(40):
            v = float(rng.integers(0, 50000)) if not frac else float(rng.normal())
            if src == "mixed_nan" and k % 7 == 0:
                v = float("nan")
            rows.append((src, 1767225600 + 300 * k, v))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "bucket_es", "sum_tok"])
    )
    comp = compress_tier(df)
    tags = {
        r.source: bytes(r.val_codec)[0]
        for r in comp.select("source", "val_codec").collect()
    }
    assert tags["ints"] == 1 and tags["fracs"] == 0 and tags["mixed_nan"] == 0
    back = (
        decompress_tier(comp)
        .toPandas()
        .sort_values(["source", "bucket_es"])
        .reset_index(drop=True)
    )
    want = (
        df.toPandas().sort_values(["source", "bucket_es"]).reset_index(drop=True)
    )
    assert np.array_equal(
        back["value"].to_numpy().view(np.uint64),
        want["sum_tok"].to_numpy().view(np.uint64),
    )
    assert np.array_equal(back["bucket_es"].to_numpy(), want["bucket_es"].to_numpy())


def test_compress_tier_gcd_scaled_timestamps(spark):
    """Gappy 300 s grid → ts_codec tag 0x02 (GCD-scaled dod) and exact
    roundtrip; an irregular (gcd=1) series keeps the plain tag 0x00."""
    import pandas as pd

    rows = []
    # gappy but 300-aligned: deltas {300, 900, 1500} → g = 300
    t = 1767225600
    for k in range(60):
        t += 300 * (1 + 2 * (k % 3))
        rows.append(("grid", t, float(k * 10)))
    # irregular: deltas coprime → g = 1
    t = 1767225600
    for k in range(60):
        t += 301 + k
        rows.append(("jitter", t, float(k)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "bucket_es", "sum_tok"])
    )
    comp = compress_tier(df)
    tags = {
        r.source: bytes(r.ts_codec)[0]
        for r in comp.select("source", "ts_codec").collect()
    }
    assert tags["grid"] == 2 and tags["jitter"] == 0, tags
    back = (
        decompress_tier(comp)
        .toPandas()
        .sort_values(["source", "bucket_es"])
        .reset_index(drop=True)
    )
    want = (
        df.toPandas().sort_values(["source", "bucket_es"]).reset_index(drop=True)
    )
    assert np.array_equal(
        back["bucket_es"].to_numpy(), want["bucket_es"].to_numpy()
    )
    assert np.array_equal(back["value"].to_numpy(), want["sum_tok"].to_numpy())
    # the point of the scaling: every dod lands in the small buckets
    # (alternating +-600/1200 gaps -> 10-bit scaled vs 13/17-bit plain)
    r = comp.filter(F.col("source") == "grid").select(
        F.octet_length("ts_codec").alias("b"), "n_points"
    ).first()
    assert r.b / r.n_points < 1.8, (r.b, r.n_points)


from pyspark.sql import functions as F  # noqa: E402  (test helper)


def test_decompress_rejects_unknown_tag(spark):
    """ADVICE r4 (medium): an unrecognized tag byte must raise, never
    silently decode the chunk as zeros (or, for a legacy untagged ts
    stream whose first byte happens to be 0x00, as a one-byte-shifted
    garbage series)."""
    import pandas as pd

    rows = [("s", 1767225600 + 300 * k, float(k)) for k in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "bucket_es", "sum_tok"])
    )
    good = compress_tier(df).toPandas()
    for col in ("ts_codec", "val_codec"):
        bad = good.copy()
        bad[col] = bad[col].map(lambda b: b"\x7f" + bytes(b)[1:])
        with pytest.raises(Exception, match=f"unknown {col} tag"):
            decompress_tier(spark.createDataFrame(bad)).collect()


def test_encode_ints_rejects_64bit_delta():
    """ADVICE r4 (low): the delta width lives in a 6-bit field; a delta
    needing 64 bits must raise instead of wrapping the width and
    corrupting the chunk (previously [0, 2^62] roundtripped to [0, 0])."""
    from kfts_insar_spark.functions.codec import encode_ints_chunked

    with pytest.raises(ValueError, match="2\\^62"):
        encode_ints_chunked(
            np.array([0, 2**62], np.int64), np.array([0], np.int64)
        )
