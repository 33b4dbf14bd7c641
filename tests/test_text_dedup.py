"""Near-dedup scale guard: the shingle document-frequency cap must bound the
shingle self-join under an adversarial hot-shingle fixture (one boilerplate
3-gram shared by every doc would otherwise produce k² join rows) while still
finding genuine near-duplicates."""

import pandas as pd
from pyspark.sql import functions as F

from kfts_insar_spark.plans.text_queries import (
    NGRAM_DF_CAP,
    q_doc_ngram_jaccard_pairs,
    q_doc_minhash_lsh,
    _shingles,
)


def _write_documents(spark, path: str, texts: list[tuple[str, str]]) -> str:
    pdf = pd.DataFrame(texts, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def test_hot_shingle_cap_bounds_join_rows(spark, tmp_path):
    k = 4 * NGRAM_DF_CAP  # hot shingle df = 256 >> cap
    docs = [
        (f"d{i:04d}", f"the quick fox u{i} v{i} w{i}") for i in range(k)
    ]
    # one genuine duplicate pair (identical shingle sets → all LSH bands hit)
    docs.append(("dup_a", "alpha beta gamma delta epsilon"))
    docs.append(("dup_b", "alpha beta gamma delta epsilon"))
    sf_dir = _write_documents(spark, str(tmp_path), docs)

    got = q_doc_ngram_jaccard_pairs(spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    # the k docs share ONLY the capped boilerplate shingle → no pairs among
    # them (uncapped this join alone is k·(k−1)/2 ≈ 32k rows)
    assert pairs == {("dup_a", "dup_b")}, pairs

    # join-row bound, measured on the capped shingle universe itself: every
    # kept shingle has df ≤ cap, so candidate rows ≤ Σ df·(df−1)/2 stays
    # linear in docs, not quadratic
    from kfts_insar_spark.plans.common import load

    ex = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    )
    df = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    kept_max = df.filter(F.col("df") <= NGRAM_DF_CAP).agg(F.max("df")).first()[0]
    assert kept_max <= NGRAM_DF_CAP
    hot = df.filter(F.col("df") > NGRAM_DF_CAP).collect()
    assert len(hot) == 1 and hot[0].df == k  # the fixture's boilerplate

    # minhash path shares the cap: the hot shingle contributes to no
    # signature, so LSH candidates stay bounded too
    cand = q_doc_minhash_lsh(spark, sf_dir).collect()
    assert ("dup_a", "dup_b") in {(r.doc_a, r.doc_b) for r in cand}
    assert len(cand) < 4 * k  # far below the k²/2 uncapped blowup


def test_ivf_trained_recall_vs_brute_force(spark):
    """The trained coarse quantizer must give the IVF path useful recall:
    of the brute-force top-3 neighbours per query, at least half are
    recovered through nprobe=4-of-16 trained cells (first-16-seeded cells
    give a weaker quantizer; training tightens them)."""
    from kfts_insar_spark.plans import text_queries as tq

    sf = "/root/testdata/sf0.01"
    bf = {
        (r.query_id, r.neighbor_id)
        for r in tq.q_emb_topk_cosine(spark, sf).filter("rk <= 3").collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in tq.q_emb_ivf_topk(spark, sf).collect()
    }
    assert len(bf) > 0
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall@3 too low: {recall:.2f}"


def test_dedup_index_incremental_replay_and_flags(spark, tmp_path):
    """The standing dedup index: reverse-order batch splits converge to
    the batch group-by, replayed batches are no-ops (batch_id guard), and
    duplicates() flags exactly the non-canonical members."""
    from pyspark.sql import functions as F

    from kfts_insar_spark.operators.dedup_index import DedupIndex
    from kfts_insar_spark.plans.common import load

    d = load(spark, "/root/testdata/sf0.01", "documents")
    mid = d.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    hi, lo = d.filter(F.col("doc_id") > mid), d.filter(F.col("doc_id") <= mid)

    idx = DedupIndex(str(tmp_path / "idx"))
    idx.ingest(spark, hi, batch_id=0)
    idx.ingest(spark, lo, batch_id=1)
    # at-least-once redelivery of batch 1 must not double n_dups
    assert idx.ingest(spark, lo, batch_id=1).get("skipped")

    want = {
        (r.fp, r.canonical_id, r.n_dups)
        for r in d.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .collect()
    }
    got = {
        (r.fp, r.canonical_id, r.n_dups) for r in idx.read(spark).collect()
    }
    assert got == want

    flags = idx.duplicates(spark, d)
    n_dup_docs = flags.filter("is_dup").count()
    want_dups = d.count() - len(want)  # every non-canonical member
    assert n_dup_docs == want_dups
    # canonical docs are never flagged
    canon = {c for (_f, c, _n) in want}
    flagged = {r.doc_id for r in flags.filter("is_dup").collect()}
    assert not (flagged & canon)

    # VERDICT r3 #4: a single-pb probe batch must open ONLY that pb's
    # index files (manifest pruning in duplicates(), not a full scan)
    one = d.limit(1)
    pb = one.select(F.substring(F.md5("text"), 1, 2).alias("pb")).first()[0]
    probe_idx = idx.tbl.read(spark, where=lambda p: p.get("pb") in {pb})
    opened = probe_idx.inputFiles()
    all_files = idx.tbl.read(spark).inputFiles()
    assert opened and len(opened) < len(all_files)
    assert all(f"pb={pb}" in f for f in opened)
    # and duplicates() itself prunes: intercept the read to capture `where`
    seen = {}
    orig_read = idx.tbl.read

    def spy(spark_, snapshot_id=None, where=None, **kw):
        seen["where"] = where
        return orig_read(spark_, snapshot_id=snapshot_id, where=where, **kw)

    idx.tbl.read = spy
    try:
        res = idx.duplicates(spark, one)
        assert res.count() == 1
    finally:
        idx.tbl.read = orig_read
    assert seen["where"] is not None
    assert seen["where"]({"pb": pb}) and not seen["where"]({"pb": "zz"})


def test_lsh_plane_count_keeps_bucket_occupancy_bounded():
    """r3-verdict #7 regression: a FIXED plane count makes every bucket-join
    ANN/near-dup query quadratic (10x vectors -> 100x candidate pairs; the
    sf1 gate measured 70x wall). _lsh_planes must grow with log(n) so the
    expected occupancy n / 2^planes stays <= LSH_TARGET_OCCUPANCY until the
    LSH_MAX_PLANES cap."""
    from kfts_insar_spark.plans.text_queries import (
        LSH_MAX_PLANES,
        LSH_TARGET_OCCUPANCY,
        _lsh_planes,
    )

    # historical small-corpus behavior pinned: 8 planes up to 2048 vectors
    assert _lsh_planes(1) == 8
    assert _lsh_planes(2048) == 8
    # monotone nondecreasing, capped
    prev = 0
    for n in (1, 100, 2048, 20480, 2 * 10**5, 2 * 10**6, 10**12):
        p = _lsh_planes(n)
        assert prev <= p <= LSH_MAX_PLANES
        prev = p
    # occupancy bound holds everywhere the cap allows
    for n in (2048, 4096, 20480, 10**6, LSH_TARGET_OCCUPANCY * 2**LSH_MAX_PLANES):
        assert n / 2 ** _lsh_planes(n) <= LSH_TARGET_OCCUPANCY
    # sf1-scale corpus (20480 vectors) gets strictly more planes than sf0.1
    assert _lsh_planes(20480) > _lsh_planes(2048)


def test_lsh_plane_coefficients_not_degenerate():
    """Root cause of the sf1 quadratic: the old additive seed walk
    (A_p + d*40503, with 40503 % 3 == 0 and 2^31-1 % 3 == 1) made every
    plane's coefficient CONSTANT across dims -> all planes ~ the all-ones
    vector -> 2-3 buckets for the whole corpus. Pin that each plane's
    coefficient vector varies across dims and planes differ from each
    other."""
    from kfts_insar_spark.plans.text_queries import (
        LSH_BANDS,
        LSH_MAX_PLANES,
        _lsh_coef,
    )

    def coefs(band, p):
        return tuple(_lsh_coef(band * LSH_MAX_PLANES + p))

    seen = set()
    for band in range(LSH_BANDS):
        for p in range(LSH_MAX_PLANES):
            c = coefs(band, p)
            # varies within the plane (the old form failed exactly this)
            assert len(set(c)) == 3, (band, p, set(c))
            # roughly balanced: no value hogs > 60% of dims
            for v in (-1, 0, 1):
                assert c.count(v) <= 39, (band, p, v, c.count(v))
            # distinct from every other plane in every band
            assert c not in seen
            seen.add(c)


def test_lsh_buckets_spread_end_to_end(spark, tmp_path):
    """End-to-end degenerate-hash guard: on a synthetic corpus of spread-out
    unit vectors, the sign-LSH bucketing must produce MANY buckets with a
    bounded max. The round-3 coefficient bug put the whole corpus in 2-3
    buckets (quadratic candidates) while every per-pair oracle check still
    passed -- only this distribution property catches it."""
    import numpy as np

    from kfts_insar_spark.plans.text_queries import q_emb_lsh_buckets

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(512, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": range(512), "embedding": [v.astype("float64") for v in vecs]}
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    b = q_emb_lsh_buckets(spark, str(tmp_path))
    sizes = [r.c for r in b.groupBy("bucket").agg(F.count("*").alias("c")).collect()]
    # 512 spread vectors over 2^8 buckets: expect >= 64 occupied, none huge
    assert len(sizes) >= 64, f"only {len(sizes)} buckets - degenerate planes?"
    assert max(sizes) <= 64, f"max bucket {max(sizes)} - degenerate planes?"


def test_lsh_neardup_recall_on_planted_duplicates(spark, tmp_path):
    """Recall guard (r4 verdict item 6): the sf corpora contain no real
    near-duplicates (max pairwise cos ~ 0.5), so every value-exact oracle
    row would stay green through a coefficient regression that silently
    destroyed RECALL — the oracle mirrors the pruning, it cannot see missed
    pairs. Plant known s >= 0.9 pairs and assert the banded-LSH near-dup
    query finds >= 0.7 of them end-to-end (theory: per-plane collision
    p = 1 - acos(s)/pi; at s = 0.95, 8 planes x 4 bands -> ~0.89)."""
    import numpy as np

    from kfts_insar_spark.plans.text_queries import q_emb_cosine_neardup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(1000, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # one planted near-dup per first-150 original: b = a + eps*g renormed,
    # eps tuned so cos(a, b) lands ~0.93-0.97 (the "real near-dup" regime
    # the docstring claims >= 0.74 recall for)
    n_planted = 150
    noise = rng.normal(size=(n_planted, 64))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dup = base[:n_planted] + 0.27 * noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    cos_planted = np.sum(base[:n_planted] * dup, axis=1)
    assert cos_planted.min() >= 0.9, cos_planted.min()  # fixture sanity
    vecs = np.vstack([base, dup])
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [v.astype("float64") for v in vecs],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    found = {
        (r.vec_a, r.vec_b)
        for r in q_emb_cosine_neardup(spark, str(tmp_path)).collect()
    }
    planted = {(i, 1000 + i) for i in range(n_planted)}
    recall = len(found & planted) / n_planted
    assert recall >= 0.7, f"banded-LSH recall {recall:.2f} on s>=0.9 pairs"
