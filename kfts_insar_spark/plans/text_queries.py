"""Training-data pipeline operators over `documents` and `embeddings`
(driver brief: dedup, similarity search, text analysis — first-class
components alongside the SURVEY.md §2 inventory), each with a DuckDB oracle.

Cross-engine exactness strategy (see plans/common.py):
- all hashes are explicit integer polynomials (31-base rolling hash mod
  1e9+7) evaluated identically by Catalyst and DuckDB — never engine-native
  hash functions;
- embedding similarity runs on 1e3-quantized INTEGER vectors: products and
  sums stay < 2^53, so even DuckDB's double-typed list_dot_product is exact
  and cosine = qdot/sqrt(qa2·qb2) is bit-identical;
- ratios are double divisions of exact integers (order-free).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

P = 1_000_000_007
# shingle document-frequency cap for near-dedup (drop boilerplate shingles
# that would make the shingle self-join quadratic on a hot key)
NGRAM_DF_CAP = 64
STOPWORDS = ("the", "a", "of", "and", "to", "in")
MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band
JACCARD_TAU = 0.5


# --------------------------------------------------------------- primitives
def _words(col):
    return F.split(F.trim(col), r"\s+")


_WORDS_SQL = "regexp_split_to_array(trim({c}), '\\s+')"


def _poly_hash_expr(colname: str) -> str:
    """Spark SQL form (usable in selectExpr). Chars come from ONE
    split(col, '') pass — the indexed form `transform(sequence(1, len),
    i -> ascii(substring(col, i, 1)))` re-scans the UTF8 string per
    character (substring by codepoint index is O(i)), i.e. O(len²) per
    doc; the split form measured 2.4× faster with identical fp values
    (verified exceptAll-empty on the documents table)."""
    return (
        f"aggregate(transform(split({colname}, ''), "
        f"ch -> ascii(ch)), 0L, "
        f"(a, c) -> (a * 31 + c) % {P})"
    )


def _poly_hash_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, 1 + length({expr})), "
        f"i -> CAST(ascii(substr({expr}, i, 1)) AS BIGINT))), "
        f"(a, c) -> (a * 31 + c) % {P})"
    )


# ------------------------------------------------------------ text analysis
def q_doc_token_count(spark, sf_dir):
    """Token counting: whitespace words + distinct words + char count —
    the per-doc token statistics a data pipeline computes before training."""
    d = load(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    return d.select(
        "doc_id",
        F.size(w).cast("int").alias("n_words"),
        F.size(F.array_distinct(w)).cast("int").alias("n_distinct_words"),
        F.length("text").cast("int").alias("n_chars_m"),
    )


def q_doc_quality_score(spark, sf_dir):
    """Quality scoring: length / stopword-ratio / mean word length — exact
    integer counts, double ratios."""
    d = load(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    n_stop = F.size(
        F.filter(w, lambda x: x.isin(*STOPWORDS))
    )
    n_words = F.size(w)
    return d.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        n_stop.cast("int").alias("n_stop"),
        (n_stop.cast("double") / n_words).alias("stop_ratio"),
        (
            (F.length("text") - n_words + 1).cast("double") / n_words
        ).alias("mean_word_len"),
    )


def q_doc_lang_id(spark, sf_dir):
    """Language-ID heuristic: deterministic marker-word voting with a fixed
    priority tie-break (a real pipeline uses n-gram profiles; the operator
    shape — per-doc scoring + argmax — is identical)."""
    d = load(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    markers = {
        "en": ("the", "a", "fast", "slow"),
        "de": ("der", "die", "und", "agg"),
        "es": ("el", "la", "query", "data"),
        "fr": ("le", "la", "window", "order"),
        "zh": ("de", "shi", "join", "merge"),
    }
    votes = [
        F.size(F.filter(w, lambda x: x.isin(*ms))).alias(f"v_{lang}")
        for lang, ms in markers.items()
    ]
    scored = d.select("doc_id", "lang", *votes)
    # argmax with fixed order tie-break (en > de > es > fr > zh)
    pred = F.lit("en")
    best = F.col("v_en")
    for lang in ("de", "es", "fr", "zh"):
        cond = F.col(f"v_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"v_{lang}")).otherwise(best)
    return scored.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        pred.alias("pred_lang"),
        best.cast("int").alias("best_votes"),
    )


def q_doc_repetition(spark, sf_dir):
    """Repetition screening (the Gopher-style duplicate-n-gram quality
    rule): per doc, word-trigram total/distinct counts, the hottest
    trigram's frequency, and the duplicate fraction. High duplicate
    fraction = boilerplate/spam; a real pipeline drops or downweights.

    Scale: explode(trigram) → two-level agg keyed by (doc_id, trigram)
    then doc_id — both shuffles carry doc-local keys (no hot global key,
    unlike the cross-doc shingle join which needs the df cap)."""
    d = load(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    # slices + zip_with, not element_at-over-indices — the indexed form
    # re-splits the text per trigram element (O(words²)/doc, 11× slower
    # measured; see _shingles). when() guards docs < 3 words (slice of
    # negative length would raise; DuckDB range() gives empty).
    m = F.greatest(F.size(w) - 2, F.lit(0))  # slice() throws on negative len
    tri = F.when(
        F.size(w) >= 3,
        F.zip_with(
            F.slice(w, 1, m),
            F.zip_with(
                F.slice(w, 2, m), F.slice(w, 3, m),
                lambda b, c: F.concat_ws(" ", b, c),
            ),
            lambda a, bc: F.concat_ws(" ", a, bc),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = d.select("doc_id", F.explode(tri).alias("tri"))
    per_tri = ex.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("c"))
    agg = per_tri.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_trigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("max_freq"),
    )
    return agg.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        "max_freq",
        (
            (F.col("n_trigrams") - F.col("n_distinct")).cast("double")
            / F.col("n_trigrams")
        ).alias("dup_frac"),
    )


# PII patterns: plain character-class regexes only (no backrefs, no
# lookaround) — the subset where Java regex (Spark) and RE2 (DuckDB) agree
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
_PII_DIGITRUN = r"[0-9]{7,}"


def _pii_augment_spark(d):
    """The synthetic corpus carries no PII — inject deterministic fake
    contact strings from doc_id (first-matching-arm CASE, mirrored exactly
    in the oracle) so the screen has real positives to count."""
    did = F.col("doc_id")
    return d.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" contact user"), did, F.lit("@mail.example.com now")),
            )
            .when(
                did % 11 == 0,
                F.concat(
                    F.lit(" server at 10."), did % 256, F.lit(".0."), did % 100,
                    F.lit(" port"),
                ),
            )
            .when(
                did % 13 == 0,
                F.concat(F.lit(" call 555"), did, F.lit("01234 today")),
            )
            .otherwise(F.lit("")),
        ),
    )


def q_doc_pii_screen(spark, sf_dir):
    """PII screening + redaction measurement: per doc, counts of email /
    IPv4 / long-digit-run matches and the redacted text length (all three
    patterns replaced by fixed tags) — the pre-training privacy scrub
    stage. Pure JVM regex projection, no shuffle at all."""
    d = _pii_augment_spark(load(spark, sf_dir, "documents"))
    t = F.col("text2")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ),
        _PII_DIGITRUN,
        "<NUM>",
    )
    n_email = F.regexp_count(t, F.lit(_PII_EMAIL))
    n_ipv4 = F.regexp_count(F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), F.lit(_PII_IPV4))
    n_digit = F.regexp_count(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ),
        F.lit(_PII_DIGITRUN),
    )
    return d.select(
        "doc_id",
        n_email.cast("int").alias("n_email"),
        n_ipv4.cast("int").alias("n_ipv4"),
        n_digit.cast("int").alias("n_digitrun"),
        ((n_email + n_ipv4 + n_digit) > 0).alias("has_pii"),
        F.length(red).cast("int").alias("redacted_len"),
    )


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: rolling polynomial hash over all chars —
    the content-defined fingerprint used for shard-stable dedup keys."""
    d = load(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id", f"CAST({_poly_hash_expr('text')} AS BIGINT) AS fp"
    )


# ------------------------------------------------------------------- dedup
def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on md5(text), keep min doc_id as canonical
    (at 100 TB: one shuffle on the digest; dup groups are tiny → no skew)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def _shingles(col, n: int = 3):
    """Distinct word n-gram shingle strings (empty for docs < n words).

    Built from n array slices folded with zip_with — NOT element_at
    inside a transform over indices: Catalyst inlines the split() into
    every element_at call, so the indexed form re-splits the text per
    gram element (O(words²) per doc — measured 11× slower on the
    documents table). Slices evaluate the split O(n)=3 times per ROW."""
    w = _words(col)
    # clamp: when() does not guarantee the unused branch is never
    # evaluated, and slice() throws on negative length for short docs
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    sh = F.slice(w, n, m)
    for j in range(n - 1, 0, -1):
        sh = F.zip_with(
            F.slice(w, j, m), sh, lambda a, b: F.concat_ws(" ", a, b)
        )
    empty = F.array().cast("array<string>")
    return F.when(F.size(w) >= n, F.array_distinct(sh)).otherwise(empty)


_SHINGLES_SQL = (
    "list_distinct(list_transform(range(0, 1 + len({w}) - 3), "
    "i -> {w}[i+1] || ' ' || {w}[i+2] || ' ' || {w}[i+3]))"
)


def q_doc_dedup_index(spark, sf_dir):
    """INCREMENTAL exact-dedup index (operators/dedup_index.py): the
    corpus arrives in two batches — the HIGH-doc_id half first, then the
    low half, so the second batch must downgrade canonical ids through
    the least() merge — each batch folded into a snapshot-committed
    fingerprint index with partition-pruned lookups and CoW upserts. The
    final index must equal the one-shot batch group-by (the oracle),
    proving the standing-pipeline form converges to the batch answer
    regardless of batch split or order."""
    import tempfile

    from ..operators.dedup_index import DedupIndex

    d = load(spark, sf_dir, "documents")
    mid = d.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    idx = DedupIndex(tempfile.mkdtemp(prefix="dedup_idx_") + "/idx")
    idx.ingest(spark, d.filter(F.col("doc_id") > mid), batch_id=0)
    idx.ingest(spark, d.filter(F.col("doc_id") <= mid), batch_id=1)
    return idx.read(spark)


def q_doc_ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup pairs by word-3-gram Jaccard ≥ τ: explode distinct shingles
    → equi-join on shingle → |A∩B| per pair → Jaccard from set sizes.
    At 100 TB the same plan holds with the shingle column bucketed; the
    shingle join is the scale path (no all-pairs cross join).

    Shingle document-frequency cap: one boilerplate shingle present in k
    docs makes k² join rows — a quadratic blowup on a hot key at 10^12
    docs. Shingles with df > NGRAM_DF_CAP carry ~zero Jaccard signal, so
    they are dropped from the shingle UNIVERSE (intersections AND set
    sizes), standard near-dedup practice; the DuckDB oracle mirrors the
    cap exactly."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    # persist the exploded shingles: they feed THREE consumers (df filter,
    # per-doc set size, intersection join) and the shingle construction
    # (split + n slices + zip_with folds) dominates — recomputing it per
    # consumer measured 13.8 s vs 5.3–6.7 s persisted at sf0.1 (cold,
    # fresh persist each run). MEMORY_AND_DISK default spills at scale;
    # the ContextCleaner unpersists when the returned plan is released.
    ex0 = d.select("doc_id", F.explode("sh").alias("s")).persist()
    keep = (
        ex0.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= F.lit(NGRAM_DF_CAP))
        .select("s")
    )
    kept = ex0.join(keep, "s").persist()  # equi-join on shingle (reused below)
    n_sh = kept.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("n_sh"))
    ex = kept.join(n_sh, "doc_id")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", F.col("n_inter").cast("long").alias("n_inter"), "jaccard")
    )


def q_doc_minhash_lsh(spark, sf_dir):
    """MinHash + LSH banding: shingle → K=16 minhashes (integer affine
    permutations of the 31-base shingle hash) → 4 bands × 4 rows →
    candidate pairs sharing a band key. Fully deterministic integer
    arithmetic → DuckDB-oracle-checkable. The banded self-join touches only
    same-bucket rows — the dedup plan that survives 10^12 docs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("s")
    ).persist()  # feeds the df filter AND the cap join — build shingles once
    # same document-frequency cap as the Jaccard path: hot shingles add no
    # signature signal and skew the min-hash shuffle key
    keep = (
        d.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= F.lit(NGRAM_DF_CAP))
        .select("s")
    )
    d = d.join(keep, "s")
    # (expression built via selectExpr for exact parity with the SQL oracle)
    hashed = d.selectExpr("doc_id", f"{_poly_hash_expr('s')} AS h")
    ks = spark.range(MINHASH_K).selectExpr(
        "cast(id as int) AS j",
        "cast(2*id + 1 as bigint) AS aj",
        "cast(id * 7919 + 1 as bigint) AS bj",
    )
    mh = (
        hashed.crossJoin(F.broadcast(ks))
        .groupBy("doc_id", "j")
        .agg(F.min((F.col("aj") * F.col("h") + F.col("bj")) % F.lit(P)).alias("mh"))
    )
    w31 = F.when(F.col("j") % 4 == 0, 1).when(F.col("j") % 4 == 1, 31).when(
        F.col("j") % 4 == 2, 961
    ).otherwise(29791)
    bands = (
        mh.withColumn("band", (F.col("j") / 4).cast("int"))
        .groupBy("doc_id", "band")
        .agg((F.sum(F.col("mh") % F.lit(P) * w31) % F.lit(P)).alias("band_key"))
        # persist: the self-join below would otherwise run the ENTIRE
        # signature pipeline (explode → cap → ×K crossJoin → 2 groupBys)
        # twice; bands is tiny (docs × LSH bands rows)
        .persist()
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def q_doc_simhash(spark, sf_dir):
    """SimHash (16-bit) over word hashes: per bit j, sign of Σ(2·bit_j−1)
    across words (with multiplicity); fingerprint = Σ 2^j [sum > 0]."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(_words(F.col("text"))).alias("w"))
    hashed = words.selectExpr("doc_id", f"{_poly_hash_expr('w')} AS h")
    bits = spark.range(16).selectExpr("cast(id as int) AS j")
    contrib = (
        hashed.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.expr("CASE WHEN shiftright(h, j) % 2 = 1 THEN 1 ELSE -1 END")
            ).alias("s")
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("cast(shiftleft(1L, j) as bigint)")
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("long")
            .alias("simhash")
        )
    )


# -------------------------------------------------------- similarity search
def _quantized(col):
    return F.transform(col, lambda x: F.round(x * 1000).cast("long"))


def q_emb_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-5 for the first 10 query vectors over
    1e3-quantized integer embeddings (exact in both engines; rank ties
    broken by neighbor id). The baseline ANN oracle; the LSH variant below
    is the scale path."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q_: p * q_), F.lit(0).cast("long"), lambda a, v: a + v
    )
    norms = e.select("vec_id", "q", dot(F.col("q"), F.col("q")).alias("n2"))
    qs = norms.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    j = norms.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("query_id"))
    cos = dot(F.col("q"), F.col("qv")).cast("double") / F.sqrt(
        (F.col("n2") * F.col("qn2")).cast("double")
    )
    scored = j.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("query_id", "rk", "neighbor_id", "cos")
    )


def _lsh_planes(n: int) -> int:
    """Sign-LSH plane count for an n-vector corpus: enough planes that the
    EXPECTED bucket occupancy stays ≤ LSH_TARGET_OCCUPANCY, so the
    within-bucket pair count — and with it every bucket-join ANN/near-dup
    query — stays LINEAR in n. A fixed plane count is a silent quadratic:
    10× the vectors → 10× per bucket → 100× the candidate pairs (caught by
    the sf1 scale gate: 70× wall time at 10× rows). Floored at 8 so the
    driver-scale corpora (sf0.01/sf0.1 → n ≤ 2048) keep their historical
    8-bit buckets."""
    import math

    return min(
        LSH_MAX_PLANES,
        max(8, math.ceil(math.log2(max(n, 1) / LSH_TARGET_OCCUPANCY))),
    )


LSH_TARGET_OCCUPANCY = 8
LSH_MAX_PLANES = 24
LSH_BANDS = 4  # OR over bands recovers the recall a single table loses


def _lsh_coef(g: int) -> list:
    """The 64 {−1,0,1} coefficients of global hyperplane `g`, computed in
    PYTHON once at plan-build time (they are data-independent — burning
    3 modular ops per row per dim in the engine was pure waste; literal
    arrays made the Spark bucketing 3.8× faster and the DuckDB mirror
    ~100×, and both engines now consume the SAME integers, so there is
    no formula-translation surface left to get wrong).

    Coefficient: ((n·K mod M)² mod M) mod 3 − 1 with n = g·64 + dim + 1.
    Two earlier forms were degenerate: additive `A_g + d·40503` (40503 ≡
    0 mod 3 and 2^31−1 ≡ 1 mod 3 ⇒ constant across all 64 dims — every
    plane ≈ the all-ones vector, the whole corpus in 2–3 buckets, a
    silent quadratic at ANY plane count: 100M within-bucket sf1 pairs),
    and plain multiplicative `n·K mod M mod 3` (a LINEAR map — value
    runs of ~4 dims, whole-plane collisions from plane 83 on). The
    squaring is the nonlinearity; all-integer (n·K ≤ 1.6e13, x² < 4.7e18
    — no int64 overflow). Empirically at sf1 (20k vecs, 12 planes, 4
    bands): 15457 occupied (band, bucket) cells, max 41, 267k candidate
    pairs — linear, balanced."""
    out = []
    for d in range(64):
        x = (d + g * 64 + 1) * 2654435761 % 2147483647
        out.append((x * x % 2147483647) % 3 - 1)
    return out


def _lsh_bucket_col(planes: int, band: int = 0):
    """Bucket Column for ONE sign-LSH band over F.col("q"): `planes` sign
    bits from deterministic sparse-ternary {−1,0,1} hyperplanes
    (Achlioptas-style), coefficients inlined as literals (_lsh_coef).
    Plane seeds index by `band * LSH_MAX_PLANES + p` so every band draws
    a disjoint plane family."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        carr = F.array(*[F.lit(c) for c in _lsh_coef(band * LSH_MAX_PLANES + p)])
        dot_p = F.aggregate(
            F.zip_with(F.col("q"), carr, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def q_emb_lsh_buckets(spark, sf_dir):
    """Sign-LSH bucketing (band 0 of the banded scheme): deterministic
    {−1,0,1} hyperplanes over the quantized embedding → bucket id. The
    bucket join (not all-pairs) is what scales ANN to 10^12 vectors;
    bucket assignment is the oracle-checked part. Plane count grows with
    log(n) (see _lsh_planes); the count() here is parquet-footer
    metadata, no data scan — a production deployment reads n from the
    snapshot manifest's row counts."""
    n_vecs = load(spark, sf_dir, "embeddings").count()
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    bucket = _lsh_bucket_col(_lsh_planes(n_vecs), band=0)
    return e.select("vec_id", bucket.cast("int").alias("bucket"))


def _lsh_banded(spark, sf_dir):
    """(vec_id, q, n2, band, bucket) — every vector exploded to its
    LSH_BANDS band buckets. The multi-band OR is the standard recall
    lever: a τ-similar pair missed by one band's planes is caught by
    another; candidate volume stays linear (× LSH_BANDS)."""
    n_vecs = load(spark, sf_dir, "embeddings").count()
    planes = _lsh_planes(n_vecs)
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q_: p * q_),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    n = e.select("vec_id", "q", dot(F.col("q"), F.col("q")).alias("n2"))
    return n.select(
        "vec_id",
        "q",
        "n2",
        F.posexplode(
            F.array(*[_lsh_bucket_col(planes, b) for b in range(LSH_BANDS)])
        ).alias("band", "bucket"),
        # NOT persisted although both consumers self-join it: caching the
        # wide q-array rows forces the join sides through the columnar
        # cache and measured 8× SLOWER than recomputing the literal-array
        # bucketing (2.8 s → 21.6 s at sf0.1) — the hash is cheaper than
        # the cache round-trip
    )


def q_emb_lsh_topk(spark, sf_dir):
    """ANN scale path: candidates restricted to the query's LSH buckets
    (any of LSH_BANDS bands), then exact quantized cosine rank (top-3).
    At 10^12 vectors the banded bucket equi-join replaces the all-pairs
    cross join — this query IS the pruning+verify plan, oracle-checked
    because the buckets are deterministic integer arithmetic."""
    from pyspark.sql import Window as W

    nb = _lsh_banded(spark, sf_dir)
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q_: p * q_),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    qs = nb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("band").alias("qband"),
        F.col("bucket").alias("qb"),
        F.col("n2").alias("qn2"),
    )
    j = nb.join(
        F.broadcast(qs),
        (F.col("band") == F.col("qband")) & (F.col("bucket") == F.col("qb")),
    ).filter(F.col("vec_id") != F.col("query_id"))
    cos = dot(F.col("q"), F.col("qv")).cast("double") / F.sqrt(
        (F.col("n2") * F.col("qn2")).cast("double")
    )
    # distinct BEFORE ranking: a candidate hit in >1 band must count once
    scored = j.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("query_id", "rk", "neighbor_id", "cos")
    )


IVF_CELLS = 16  # coarse-quantizer size
IVF_NPROBE = 4  # cells probed per query
IVF_ITERS = 2  # Lloyd training iterations (integer-exact)


def _ivf_train(n, dot):
    """Train the IVF coarse quantizer: IVF_ITERS Lloyd iterations in EXACT
    integer arithmetic, expressed as DataFrame aggregations.

    init = the first IVF_CELLS quantized vectors (deterministic); each
    iteration assigns every vector to its nearest centroid by integer
    ||q−c||² (ties → lowest cell) and recomputes centroids element-wise as
    ``sum div count`` (truncating integer division — identical semantics
    in Spark ``div`` and DuckDB ``//``, verified on negatives). A cell
    that lost all members keeps its previous centroid. The element-wise
    update is a posexplode → groupBy(cell, dim) partial aggregation —
    corpus×dim rows map-side-combine down to cells×dim, the scale-correct
    shape (never a collect_list of member vectors).

    Scale contract (documented per the round-2 review): cells×dim must
    stay broadcast-sized — assignment cross-joins each vector against the
    broadcast centroid table, cost corpus × IVF_CELLS dot products per
    iteration."""
    from pyspark.sql import Window as W

    cents = n.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("q").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    w_v = W.partitionBy("vec_id").orderBy("d2", "cell")
    for _ in range(IVF_ITERS):
        d2 = F.col("n2") + F.col("cn2") - 2 * dot(F.col("q"), F.col("cv"))
        asn = (
            n.join(F.broadcast(cents), how="cross")
            .select("vec_id", "q", "cell", d2.alias("d2"))
            .withColumn("rk", F.row_number().over(w_v))
            .filter(F.col("rk") == 1)
        )
        upd = (
            asn.select("cell", F.posexplode("q").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .withColumn("cd", F.expr("s div c"))
        )
        newc = (
            upd.groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "cd"))).alias("_e")
            )
            .select(
                "cell", F.transform(F.col("_e"), lambda s: s["cd"]).alias("cv2")
            )
        )
        cv = F.coalesce("cv2", "cv")
        cents = (
            cents.join(newc, "cell", "left")
            .select("cell", cv.alias("cv"))
            .select("cell", "cv", dot(F.col("cv"), F.col("cv")).alias("cn2"))
        )
    return cents


def q_emb_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbours — the inverted-file scale path
    next to the sign-LSH variant: a TRAINED coarse quantizer (IVF_CELLS
    centroids, IVF_ITERS integer-exact Lloyd iterations — `_ivf_train`)
    partitions the corpus by nearest centroid, each query probes its
    IVF_NPROBE nearest cells, and exact quantized cosine ranks the
    candidates (top-3). All assignment/training math is integer
    (||q−c||² = |q|² + |c|² − 2·q·c; centroid update = sum div count) →
    value-exact vs the oracle, which unrolls the same iterations in SQL.
    At 10^12 vectors the cell equi-join scans nprobe/cells of the corpus
    instead of all of it."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q_: p * q_),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    n = e.select("vec_id", "q", dot(F.col("q"), F.col("q")).alias("n2"))
    # persist: 16 rows, but TWO consumers (assignment, probe lists) would
    # each re-run the full Lloyd training over the corpus without it
    cents = _ivf_train(n, dot).persist()
    # assignment: nearest centroid per vector (ties → lowest cell id)
    d2 = F.col("n2") + F.col("cn2") - 2 * dot(F.col("q"), F.col("cv"))
    w_v = W.partitionBy("vec_id").orderBy("d2", "cell")
    asn = (
        n.join(F.broadcast(cents), how="cross")
        .select("vec_id", "q", "n2", "cell", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w_v))
        .filter(F.col("rk") == 1)
        .drop("rk", "d2")
    )
    # probe lists: each query's IVF_NPROBE nearest cells
    qs = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    qd2 = F.col("qn2") + F.col("cn2") - 2 * dot(F.col("qv"), F.col("cv"))
    w_q = W.partitionBy("query_id").orderBy("d2", "cell")
    probes = (
        qs.join(F.broadcast(cents), how="cross")
        .select("query_id", "qv", "qn2", "cell", qd2.alias("d2"))
        .withColumn("rk", F.row_number().over(w_q))
        .filter(F.col("rk") <= IVF_NPROBE)
        .select("query_id", "qv", "qn2", "cell")
    )
    # candidates = vectors in probed cells; exact cosine rank within
    cand = asn.join(probes, "cell").filter(F.col("vec_id") != F.col("query_id"))
    cos = dot(F.col("q"), F.col("qv")).cast("double") / F.sqrt(
        (F.col("n2") * F.col("qn2")).cast("double")
    )
    w_r = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .withColumn("rk", F.row_number().over(w_r).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("query_id", "rk", "neighbor_id", "cos")
    )


EMB_NEARDUP_TAU = 0.3


def q_emb_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the dedup mode over the
    embedding column: candidates restricted to a shared sign-LSH bucket in
    ANY of LSH_BANDS bands (the pruning step that avoids the 10^24
    all-pairs join at 10^12 vectors; the band OR is the recall lever),
    then EXACT quantized cosine ≥ τ verification. Integer dots + one sqrt
    → value-exact cross-engine.

    Recall honesty: per-plane collision prob for a pair at cosine s is
    p = 1 − acos(s)/π, per-band p^planes, overall 1 − (1−p^planes)^bands.
    Real near-dups (s ≥ 0.9 ⇒ p ≥ 0.856) are caught at ≥ 0.74 with 8
    planes × 4 bands and ≥ 0.97 for s ≥ 0.98. THIS synthetic corpus has
    no planted dups (max pairwise cos ≈ 0.5), so at τ = 0.3 measured
    recall is ~0.07 — the theory value for diffuse similarity, where NO
    sublinear scheme has high recall (the LSH exponent ρ → 1 as τ → 0).
    The oracle mirrors the pruning, so the query stays value-exact; the
    candidate volume stays linear in n (sf1: 267k candidates / 20k vecs,
    max bucket 41)."""
    nb = _lsh_banded(spark, sf_dir)
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q_: p * q_),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    a, c = nb.alias("a"), nb.alias("b")
    j = a.join(
        c,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = dot(F.col("a.q"), F.col("b.q")).cast("double") / F.sqrt(
        (F.col("a.n2") * F.col("b.n2")).cast("double")
    )
    return (
        j.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(EMB_NEARDUP_TAU))
        # distinct: a pair colliding in >1 band is one near-dup pair (cos
        # is recomputed identically from the same integers → stable key)
        .distinct()
    )


# ------------------------------------------------- dedup clustering / curation
def q_doc_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: the MinHash-LSH candidate pairs closed under
    transitivity via distributed connected components (alternating
    large-star/small-star, operators/concomp.py) — the step that turns
    pairwise near-dup hits into dedup decisions. One row per clustered doc:
    its cluster id (= min doc_id in the component, the exact-dedup
    canonical-survivor convention), the cluster size, and whether this doc
    is the canonical survivor."""
    from ..operators.concomp import connected_components

    pairs = q_doc_minhash_lsh(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        F.when(F.col("node") == F.col("component"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_canonical"),
    )


# per-lang keep rates ×1000 for the stratified sample (downsample the
# over-represented head, keep the long tail — standard data-mix curation)
SAMPLE_RATES = {"en": 200, "de": 500, "es": 800}
SAMPLE_DEFAULT_RATE = 1000
SAMPLE_A = 2654435761  # Knuth multiplicative constant (deterministic "rng")


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling by language: keep a doc iff
    (doc_id·A) mod 1000 < rate[lang]. Hash-based (not Bernoulli) so the
    sample is reproducible across runs/engines and join-stable — the form
    that matters when the sample feeds a training mix at 10^12 docs.
    Entirely Catalyst expressions; no shuffle at all (verified: the plan is
    scan → filter → project)."""
    d = load(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for s, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == s, F.lit(r)).otherwise(rate)
    key = F.pmod(F.col("doc_id") * F.lit(SAMPLE_A), F.lit(1000))
    return (
        d.select("doc_id", "lang", key.alias("sample_key"), rate.alias("rate"))
        .filter(F.col("sample_key") < F.col("rate"))
        .select("doc_id", "lang", F.col("sample_key").cast("long").alias("sample_key"))
    )


CONTAM_MIN_OVERLAP = 3  # shingles shared with the eval set ⇒ contaminated


def q_doc_contamination(spark, sf_dir):
    """Benchmark-contamination screen: word-3-gram overlap between every
    corpus doc and a held-out eval set (docs with doc_id ≡ 0 mod 97 stand
    in for the benchmark). The eval shingle set is tiny → broadcast-joined
    against the exploded corpus shingles; output = docs sharing ≥ 1 shingle
    with the eval set, flagged contaminated at ≥ CONTAM_MIN_OVERLAP. The
    shape (small-set broadcast semi-join over an exploded n-gram stream) is
    the decontamination pass every training pipeline runs at full scale."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    ).persist()  # two consumers (eval set, corpus) — build shingles once
    is_eval = F.col("doc_id") % 97 == 0
    eval_sh = (
        d.filter(is_eval)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    corpus = d.filter(~is_eval).select("doc_id", F.explode("sh").alias("s"))
    hits = corpus.join(F.broadcast(eval_sh), "s").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return hits.select(
        "doc_id",
        "n_overlap",
        F.when(F.col("n_overlap") >= CONTAM_MIN_OVERLAP, 1)
        .otherwise(0)
        .cast("int")
        .alias("contaminated"),
    )


def q_emb_dedup_clusters(spark, sf_dir):
    """Embedding-space dedup clusters: the cosine-near-dup pairs (LSH-
    pruned, exactly verified) closed under transitivity — same connected-
    components operator as the text path, over the embedding modality."""
    from ..operators.concomp import connected_components

    pairs = q_emb_cosine_neardup(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(pairs, "vec_a", "vec_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        F.when(F.col("node") == F.col("component"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_canonical"),
    )


QUERIES = {
    "doc_token_count": q_doc_token_count,
    "doc_quality_score": q_doc_quality_score,
    "doc_lang_id": q_doc_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_repetition": q_doc_repetition,
    "doc_pii_screen": q_doc_pii_screen,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_dedup_index": q_doc_dedup_index,
    "doc_ngram_jaccard_pairs": q_doc_ngram_jaccard_pairs,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "emb_topk_cosine": q_emb_topk_cosine,
    "emb_lsh_buckets": q_emb_lsh_buckets,
    "emb_cosine_neardup": q_emb_cosine_neardup,
    "emb_ivf_topk": q_emb_ivf_topk,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_stratified_sample": q_doc_stratified_sample,
    "doc_contamination": q_doc_contamination,
    "emb_dedup_clusters": q_emb_dedup_clusters,
}

_W = _WORDS_SQL.format(c="text")
_SHW = _SHINGLES_SQL.format(w="w")
_STOP_IN = " OR ".join(f"x = '{s}'" for s in STOPWORDS)


# SQL mirror of _lsh_planes: np computed from the corpus row count, each
# of the 24 candidate planes gated on p < np (DuckDB can't vary loop
# length on data, so the expression is generated at max width and gated)
_LSH_NP_CTE = (
    "np_c AS (SELECT LEAST(24, GREATEST(8, "
    "CAST(CEIL(LOG2(GREATEST(count(*), 1) / 8.0)) AS INT))) AS np "
    "FROM embeddings)"
)


def _lsh_bucket_sql(band: int) -> str:
    """SQL mirror of _lsh_bucket_col(planes, band): the SAME literal
    coefficient arrays (_lsh_coef) inlined into list_dot_product — no
    formula translation between engines, just shared integers. The dot
    is exact in the DOUBLE list_dot_product returns (|terms| ≤ 64·10⁶ ≪
    2^53)."""
    return " + ".join(
        "(CASE WHEN {p} < np AND list_dot_product(qv, [{cs}]::BIGINT[]) > 0"
        " THEN {bit} ELSE 0 END)".format(
            p=p,
            bit=1 << p,
            cs=",".join(str(c) for c in _lsh_coef(band * LSH_MAX_PLANES + p)),
        )
        for p in range(LSH_MAX_PLANES)
    )


_LSH_BUCKET_EXPR = _lsh_bucket_sql(0)

# banded explode: one SELECT per band, UNION ALL (the SQL mirror of
# _lsh_banded's posexplode) — expects CTEs q (vec_id, qv) and np_c
_LSH_BANDED_CTE = "nb AS (" + " UNION ALL ".join(
    f"""SELECT vec_id, qv,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(qv, x -> x * x)), (acc, v) -> acc + v) AS n2,
         {b} AS band, CAST(({_lsh_bucket_sql(b)}) AS INT) AS bucket
  FROM q, np_c"""
    for b in range(LSH_BANDS)
) + ")"


ORACLE_SQL = {
    "doc_token_count": f"""
SELECT doc_id,
       CAST(len({_W}) AS INT) AS n_words,
       CAST(len(list_distinct({_W})) AS INT) AS n_distinct_words,
       CAST(length(text) AS INT) AS n_chars_m
FROM documents
""",
    "doc_quality_score": f"""
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       CAST(n_stop AS INT) AS n_stop,
       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       CAST(length(text) - n_words + 1 AS DOUBLE) / n_words AS mean_word_len
FROM (
  SELECT doc_id, text,
         len({_W}) AS n_words,
         len(list_filter({_W}, x -> {_STOP_IN})) AS n_stop
  FROM documents
)
""",
    "doc_lang_id": f"""
SELECT doc_id, lang AS true_lang,
       CASE WHEN v_zh > greatest(v_en, v_de, v_es, v_fr) THEN 'zh'
            WHEN v_fr > greatest(v_en, v_de, v_es) THEN 'fr'
            WHEN v_es > greatest(v_en, v_de) THEN 'es'
            WHEN v_de > v_en THEN 'de'
            ELSE 'en' END AS pred_lang,
       CAST(greatest(v_en, v_de, v_es, v_fr, v_zh) AS INT) AS best_votes
FROM (
  SELECT doc_id, lang,
    len(list_filter({_W}, x -> x='the' OR x='a' OR x='fast' OR x='slow')) AS v_en,
    len(list_filter({_W}, x -> x='der' OR x='die' OR x='und' OR x='agg')) AS v_de,
    len(list_filter({_W}, x -> x='el' OR x='la' OR x='query' OR x='data')) AS v_es,
    len(list_filter({_W}, x -> x='le' OR x='la' OR x='window' OR x='order')) AS v_fr,
    len(list_filter({_W}, x -> x='de' OR x='shi' OR x='join' OR x='merge')) AS v_zh
  FROM documents
)
""",
    "doc_fingerprint": f"""
SELECT doc_id, CAST({_poly_hash_sql('text')} AS BIGINT) AS fp FROM documents
""",
    "doc_repetition": f"""
WITH tri AS (
  SELECT doc_id, unnest(list_transform(
           range(1, greatest(len({_W}) - 2, 0) + 1),
           i -> {_W}[i] || ' ' || {_W}[i+1] || ' ' || {_W}[i+2])) AS tri
  FROM documents
),
per_tri AS (SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT)   AS n_trigrams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(c) AS BIGINT)   AS max_freq,
       CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_frac
FROM per_tri GROUP BY doc_id
""",
    "doc_pii_screen": f"""
WITH aug AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 7 = 0
             THEN ' contact user' || doc_id || '@mail.example.com now'
           WHEN doc_id % 11 = 0
             THEN ' server at 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                  || ' port'
           WHEN doc_id % 13 = 0 THEN ' call 555' || doc_id || '01234 today'
           ELSE '' END AS text2
  FROM documents
),
r AS (
  SELECT doc_id, text2,
         regexp_replace(text2, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM aug
),
r2 AS (
  SELECT doc_id, text2, t1,
         regexp_replace(t1, '{_PII_IPV4}', '<IP>', 'g') AS t2
  FROM r
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{_PII_EMAIL}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{_PII_IPV4}')) AS INT)     AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{_PII_DIGITRUN}')) AS INT) AS n_digitrun,
       len(regexp_extract_all(text2, '{_PII_EMAIL}'))
         + len(regexp_extract_all(t1, '{_PII_IPV4}'))
         + len(regexp_extract_all(t2, '{_PII_DIGITRUN}')) > 0      AS has_pii,
       CAST(length(regexp_replace(t2, '{_PII_DIGITRUN}', '<NUM>', 'g')) AS INT)
         AS redacted_len
FROM r2
""",
    "doc_exact_dedup": """
SELECT md5(text) AS fp,
       CAST(min(doc_id) AS BIGINT) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
""",
    # the incremental index must converge to the one-shot batch answer
    "doc_dedup_index": """
SELECT md5(text) AS fp,
       CAST(min(doc_id) AS BIGINT) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
""",
    "doc_ngram_jaccard_pairs": f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL.format(w=_W)} AS shingles FROM documents
),
ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
keep AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= {NGRAM_DF_CAP}),
kept AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN keep USING (s)),
sized AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM kept GROUP BY 1),
ex AS (SELECT kept.doc_id, sized.n_sh, kept.s
       FROM kept JOIN sized USING (doc_id)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS n_inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter AS DOUBLE) / (na + nb - n_inter) AS jaccard
FROM inter
WHERE CAST(n_inter AS DOUBLE) / (na + nb - n_inter) >= {JACCARD_TAU}
""",
    "doc_minhash_lsh": f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL.format(w=_W)}) AS s FROM documents
),
keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {NGRAM_DF_CAP}),
shk AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
hashed AS (SELECT doc_id, {_poly_hash_sql('s')} AS h FROM shk),
ks AS (SELECT CAST(j AS INT) AS j, CAST(2*j+1 AS BIGINT) AS aj,
              CAST(j*7919+1 AS BIGINT) AS bj
       FROM range({MINHASH_K}) t(j)),
mh AS (
  SELECT doc_id, j, min((aj * h + bj) % {P}) AS mh
  FROM hashed CROSS JOIN ks GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(j // 4 AS INT) AS band,
         SUM(mh % {P} * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31
                          WHEN 2 THEN 961 ELSE 29791 END)) % {P} AS band_key
  FROM mh GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
    "doc_simhash": f"""
WITH words AS (
  SELECT doc_id, unnest({_W}) AS w FROM documents
),
hashed AS (SELECT doc_id, {_poly_hash_sql('w')} AS h FROM words),
contrib AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT CAST(j AS INT) AS j FROM range(16) t(j)) b
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(2 AS BIGINT) ** j ELSE 0 END) AS BIGINT)
         AS simhash
FROM contrib GROUP BY 1
""",
    "emb_topk_cosine": """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(qv, x -> x * x)), (a, v) -> a + v) AS n2
  FROM q
),
pairs AS (
  SELECT qq.vec_id AS query_id, nn.vec_id AS neighbor_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 65),
                i -> nn.qv[i] * qq.qv[i])), (a, v) -> a + v) AS DOUBLE)
           / sqrt(CAST(nn.n2 * qq.n2 AS DOUBLE)) AS cos
  FROM n nn CROSS JOIN (SELECT * FROM n WHERE vec_id < 10) qq
  WHERE nn.vec_id != qq.vec_id
)
SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM pairs
) WHERE rk <= 5
""",
    # the training CTE chain mirrors _ivf_train's iterations exactly:
    # assignment by integer d², element-wise `sum // count` update (DuckDB
    # `//` truncates toward zero like Spark `div`), empty cells coalesce to
    # their previous centroid
    "emb_ivf_topk": (lambda _dot: f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(qv, x -> x * x)), (acc, v) -> acc + v) AS n2
  FROM q
),
cents0 AS (SELECT vec_id AS cell, qv AS cv, n2 AS cn2 FROM n WHERE vec_id < {IVF_CELLS}),
{",".join(f'''
tasn{it} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT nn.vec_id, nn.qv, c.cell,
           row_number() OVER (PARTITION BY nn.vec_id
             ORDER BY nn.n2 + c.cn2 - 2 * {_dot('nn.qv', 'c.cv')}, c.cell) AS rk
    FROM n nn CROSS JOIN cents{it} c
  ) WHERE rk = 1
),
upd{it} AS (
  SELECT cell, i, CAST(sum(qv[i]) // count(*) AS BIGINT) AS cd
  FROM tasn{it}, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY cell, i
),
newc{it} AS (SELECT cell, list(cd ORDER BY i) AS cv2 FROM upd{it} GROUP BY cell),
cents{it + 1} AS (
  SELECT p.cell,
         coalesce(nc.cv2, p.cv) AS cv,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(coalesce(nc.cv2, p.cv), x -> x * x)),
           (acc, v) -> acc + v) AS cn2
  FROM cents{it} p LEFT JOIN newc{it} nc USING (cell)
)''' for it in range(IVF_ITERS))},
cents AS (SELECT * FROM cents{IVF_ITERS}),
asn AS (
  SELECT vec_id, qv, n2, cell FROM (
    SELECT nn.vec_id, nn.qv, nn.n2, c.cell,
           row_number() OVER (PARTITION BY nn.vec_id
             ORDER BY nn.n2 + c.cn2 - 2 * {_dot('nn.qv', 'c.cv')}, c.cell) AS rk
    FROM n nn CROSS JOIN cents c
  ) WHERE rk = 1
),
probes AS (
  SELECT query_id, pqv, qn2, cell FROM (
    SELECT s.vec_id AS query_id, s.qv AS pqv, s.n2 AS qn2, c.cell,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY s.n2 + c.cn2 - 2 * {_dot('s.qv', 'c.cv')}, c.cell) AS rk
    FROM n s CROSS JOIN cents c WHERE s.vec_id < 10
  ) WHERE rk <= {IVF_NPROBE}
)
SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           CAST({_dot('a.qv', 'p.pqv')} AS DOUBLE)
             / sqrt(CAST(a.n2 * p.qn2 AS DOUBLE)) AS cos
    FROM asn a JOIN probes p USING (cell)
    WHERE a.vec_id != p.query_id
  )
) WHERE rk <= 3
""")(
        lambda x, y: (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, 65), i -> {x}[i] * {y}[i])), "
            "(acc, v) -> acc + v)"
        )
    ),
    "emb_cosine_neardup": f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
{_LSH_NP_CTE},
{_LSH_BANDED_CTE}
SELECT DISTINCT vec_a, vec_b, cos FROM (
  SELECT aa.vec_id AS vec_a, bb.vec_id AS vec_b,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 65), i -> aa.qv[i] * bb.qv[i])),
              (acc, v) -> acc + v) AS DOUBLE)
           / sqrt(CAST(aa.n2 * bb.n2 AS DOUBLE)) AS cos
  FROM nb aa JOIN nb bb ON aa.band = bb.band AND aa.bucket = bb.bucket
                       AND aa.vec_id < bb.vec_id
) WHERE cos >= {EMB_NEARDUP_TAU}
""",
    "emb_lsh_buckets": f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
{_LSH_NP_CTE}
SELECT vec_id, CAST(({_LSH_BUCKET_EXPR}) AS INT) AS bucket
FROM q, np_c
""",
}

QUERIES["emb_lsh_topk"] = q_emb_lsh_topk

# oracle composes the (generated) banded bucket SQL with cosine ranking
ORACLE_SQL["emb_lsh_topk"] = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
{_LSH_NP_CTE},
{_LSH_BANDED_CTE},
pairs AS (
  SELECT DISTINCT qq.vec_id AS query_id, nn.vec_id AS neighbor_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 65),
                i -> nn.qv[i] * qq.qv[i])), (a, v) -> a + v) AS DOUBLE)
           / sqrt(CAST(nn.n2 * qq.n2 AS DOUBLE)) AS cos
  FROM nb nn JOIN (SELECT * FROM nb WHERE vec_id < 10) qq
    ON nn.band = qq.band AND nn.bucket = qq.bucket AND nn.vec_id != qq.vec_id
)
SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM pairs
) WHERE rk <= 3
"""

# transitive closure of the LSH candidate pairs via recursive CTE — exact
# at oracle scale; the Spark side is the O(log n)-round star algorithm
ORACLE_SQL["doc_dedup_clusters"] = f"""
WITH RECURSIVE cand AS ({ORACLE_SQL["doc_minhash_lsh"]}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION
  SELECT doc_b, doc_a FROM cand
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v != r.u
),
lab AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
)
SELECT lab.doc_id, lab.cluster_id, sizes.cluster_size,
       CAST(CASE WHEN lab.doc_id = lab.cluster_id THEN 1 ELSE 0 END AS INT)
         AS is_canonical
FROM lab JOIN sizes USING (cluster_id)
"""

ORACLE_SQL["emb_dedup_clusters"] = f"""
WITH RECURSIVE cand AS (
  SELECT vec_a, vec_b FROM ({ORACLE_SQL["emb_cosine_neardup"]})
),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM cand
  UNION
  SELECT vec_b, vec_a FROM cand
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v != r.u
),
lab AS (
  SELECT u AS vec_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
)
SELECT lab.vec_id, lab.cluster_id, sizes.cluster_size,
       CAST(CASE WHEN lab.vec_id = lab.cluster_id THEN 1 ELSE 0 END AS INT)
         AS is_canonical
FROM lab JOIN sizes USING (cluster_id)
"""

ORACLE_SQL["doc_stratified_sample"] = f"""
SELECT doc_id, lang,
       CAST((doc_id * {SAMPLE_A}) % 1000 AS BIGINT) AS sample_key
FROM documents
WHERE (doc_id * {SAMPLE_A}) % 1000 <
      (CASE {" ".join(f"WHEN lang = '{s}' THEN {r}" for s, r in SAMPLE_RATES.items())}
       ELSE {SAMPLE_DEFAULT_RATE} END)
"""

ORACLE_SQL["doc_contamination"] = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL.format(w=_W)} AS shingles FROM documents
),
eval_sh AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0
),
corpus AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 != 0
),
hits AS (
  SELECT corpus.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM corpus JOIN eval_sh USING (s) GROUP BY 1
)
SELECT doc_id, n_overlap,
       CAST(CASE WHEN n_overlap >= {CONTAM_MIN_OVERLAP} THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM hits
"""
