"""Deduplication operators for LLM training-data pipelines (SURVEY §7.4c).

Four dedup families over ``documents(doc_id, text, ...)``, each designed
so that NOTHING is ever all-pairs — candidate generation always goes
through an equi-join key (hash, shingle, band bucket, or signature
chunk), which is the only shape that survives 100 TB:

- **exact** — md5 text hash, group, keep min doc_id as canonical.
- **n-gram Jaccard** — 3-token shingles, inverted-index equi-join on
  shingle, exact Jaccard from intersection counts (same algebra as the
  inverted-index J3, operators/joins.py).
- **MinHash + LSH** — per-doc signature of H murmur3 min-hashes, banded
  into B buckets; candidates = docs sharing a band bucket; verified
  against exact Jaccard. Candidate cost is O(docs·B), never O(docs²).
- **SimHash** — 64-bit weighted token-hash signature via a pandas UDF;
  near-dup candidates share one of four 16-bit chunks (hamming-LSH),
  verified by ``bit_count`` hamming distance.

Scale notes (100 TB): the shingle/band/chunk joins shuffle on
high-cardinality uniform keys (hash values) — no skew by construction
except stop-shingles, which the distinct-per-doc step bounds. MinHash
signatures are 8·H bytes/doc regardless of doc length; banding keeps
the bucket join selective (P[candidate] ≈ 1-(1-j^r)^b). The exact
verify stage only ever sees candidate pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_REGEX
from ..registry import register
from .quantize import ppm_value
from ..sources import load_raw

#: Shingle width (tokens) for Jaccard/MinHash shingling.
SHINGLE_N = 3
#: Near-duplicate Jaccard threshold (fixture-calibrated: planted
#: near-dups sit ≥0.5, unrelated docs <0.1).
JACCARD_THRESHOLD = 0.5
#: MinHash signature size and banding (16 bands × 2 rows).
MINHASH_H = 32
MINHASH_BANDS = 16
#: SimHash hamming radius for near-dup candidates.
SIMHASH_MAX_HAMMING = 8

# --------------------------------------------------------------- shingles

def shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct n-token shingles per doc: tokenize (raw split — dedup
    wants surface text, stopwords included), slide an n-window via
    ``transform`` over token indices, explode, distinct.

    The token array is projected into its own column BEFORE the window
    ``transform``: an expression referenced inside a higher-order-
    function lambda is re-evaluated per element, so inlining the regex
    split there makes tokenization O(tokens²) per doc (measured 6-10×
    slower at sf0.1)."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    tok_df = docs.select("doc_id", toks.alias("ts"))
    # sequence(0, size-n) is inclusive → size-n+1 shingles; guard short
    # docs (sequence with start > stop would count DOWN, not be empty)
    sh = F.when(
        F.size("ts") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("ts") - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("ts"), i + k + 1) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tok_df.select("doc_id", F.explode(sh).alias("shingle")).distinct()


#: DuckDB twin of :func:`shingles` (3-token shingles, distinct per doc).
_SHINGLES_CTE = f"""sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM (
    SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM (
      SELECT doc_id, list_filter(
        string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'),
        t -> t <> '') AS ts
      FROM documents
    )
  ) WHERE i <= len(ts) - {SHINGLE_N - 1}
)"""


# ----------------------------------------------------------- exact dedup

@register(
    "dedup_exact",
    """SELECT doc_id, md5(text) AS text_hash,
       CAST(doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS BOOLEAN)
         AS canonical
FROM documents""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); the smallest doc_id in
    each hash group is canonical, the rest are drop candidates. One
    hash-partitioned window, no sort needed beyond the group."""
    docs = load_raw(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash")
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .withColumn("canonical", F.col("doc_id") == F.min("doc_id").over(w))
    )


# --------------------------------------------------- n-gram Jaccard dedup

_JACCARD_BODY = f"""SELECT i.d1 AS doc_a, i.d2 AS doc_b,
       CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
FROM (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
) i
JOIN (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id) s1 ON i.d1 = s1.doc_id
JOIN (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id) s2 ON i.d2 = s2.doc_id
WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= {JACCARD_THRESHOLD}"""


@register("dedup_ngram_jaccard", f"WITH {_SHINGLES_CTE}\n{_JACCARD_BODY}")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact shingle Jaccard ≥ threshold, computed via
    the inverted-index pattern: equi-join on shingle → intersection
    counts → ``|∩| / (n1 + n2 - |∩|)``. Only docs sharing ≥1 shingle
    ever pair up."""
    docs = load_raw(spark, sf_dir, "documents")
    # three consumers (sizes + both join sides), no cross-subtree CSE
    # in Catalyst - persist once, release after the small pair result
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        inter.join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n1")), "doc_a")
        .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n2")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    from .bsp import checkpoint_result

    return checkpoint_result(
        jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD), sh
    )


# ------------------------------------------------------ MinHash LSH dedup

#: Universal-hash modulus (Mersenne prime 2³¹−1) and pinned parameter
#: generators: a_i ∈ [1, P), b_i ∈ [0, P). The base value x is ONE
#: md5 per shingle parsed to a 60-bit int — murmur3 (``F.hash``) is
#: engine-private, and per-seed md5s cost 32× the hashing; 2-universal
#: ``(a_i·x + b_i) mod P`` gives independent-enough min-hashes from a
#: single digest, in exact BIGINT arithmetic both engines reproduce
#: ((P−1)·(P−1)+b < 2⁶³ — no overflow).
_MH_P = 2_147_483_647
_MH_MULT = 2_654_435_761


def _mh_a(i: int) -> int:
    return (_MH_MULT * (2 * i + 1)) % _MH_P or 1


def _mh_b(i: int) -> int:
    return (_MH_MULT * i + 40_503) % _MH_P


#: Spark / DuckDB twins of "md5(shingle) → 60-bit int mod P".
def _shingle_x(col: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % _MH_P
    )


_SHINGLE_X_SQL = f"CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {_MH_P}"


def minhash_signatures(sh: DataFrame, h: int = MINHASH_H) -> DataFrame:
    """H portable min-hashes per doc: ``min((a_i·x + b_i) mod P)`` over
    the per-shingle digest x. The digest is projected ONCE before the H
    aggregates (inlining it would md5 per aggregate); the signature is
    8·H bytes per doc regardless of document size."""
    based = sh.select("doc_id", _shingle_x(F.col("shingle")).alias("xm"))
    aggs = [
        F.min((F.lit(_mh_a(i)) * F.col("xm") + F.lit(_mh_b(i))) % _MH_P).alias(f"h{i}")
        for i in range(h)
    ]
    return based.groupBy("doc_id").agg(*aggs)


def _minhash_ctes() -> str:
    """CTE chain rebuilding the MinHash/LSH pipeline in DuckDB SQL:
    shingles → signatures (same seeded portable hashes) → 2-row band
    buckets → candidate pairs → Jaccard-verified pairs (``mh_pairs``).
    Shared by the pair oracle and the canonical-verdict oracle."""
    rpb = MINHASH_H // MINHASH_BANDS
    sig_cols = ",\n         ".join(
        f"MIN(({_mh_a(i)} * xm + {_mh_b(i)}) % {_MH_P}) AS h{i}"
        for i in range(MINHASH_H)
    )
    band_selects = "\n    UNION ALL\n    ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS bucket FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(h{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""{_SHINGLES_CTE},
sigsrc AS (
  SELECT doc_id, {_SHINGLE_X_SQL} AS xm FROM sh
),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM sigsrc GROUP BY doc_id
), banded AS (
    {band_selects}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), mh_pairs AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
  FROM (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
    GROUP BY c.doc_a, c.doc_b
  ) i
  JOIN (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id) s1 ON i.doc_a = s1.doc_id
  JOIN (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id) s2 ON i.doc_b = s2.doc_id
  WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= {JACCARD_THRESHOLD}
)"""


def _minhash_oracle() -> str:
    """Full DuckDB twin of the MinHash/LSH chain — the sketch pipeline
    is hash-compared end to end, not just rows-counted."""
    return f"""WITH {_minhash_ctes()}
SELECT doc_a, doc_b, jaccard FROM mh_pairs"""


@register("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (the 100 TB dedup path).

    signatures → band into ``MINHASH_BANDS`` buckets (band key =
    md5 of the band's rows) → equi-join on (band, bucket) → distinct
    candidate pairs → verify with exact shingle Jaccard ≥ threshold.
    The hash is the pinned portable one (:func:`_portable_hash`), so
    the ENTIRE sketch chain — signatures, banding, candidates, verify —
    is hash-compared against the DuckDB oracle, not just rows-counted.

    Correctness containment vs :func:`dedup_ngram_jaccard` is pytest-
    checked (tests/test_llm_ops.py): LSH output ⊆ exact output, with
    recall ≈ 1 at the fixture's threshold (2-row bands:
    P[candidate] = 1-(1-j²)^16 ≈ 0.999 at j=0.5)."""
    docs = load_raw(spark, sf_dir, "documents")
    # NOTE (r13): the shingle relation feeds FOUR independent subtrees
    # (signatures, sizes, both verify sides; 12 scans un-persisted — r12
    # scan audit) and r12 persisted it. Re-adjudicated paired in r13:
    # the persist MEASURED 1.8x slower (6.48 vs 3.58 s min-of-5) — the
    # cache write of the exploded shingle strings costs more than four
    # pruned re-runs of the cheap scan+explode chain. Reverted; at
    # 100 TB the fix is pipeline-level shingle/token-table reuse
    # (s19_token_table_reuse), not an in-query cache. OPTIMIZATION_r13.md.
    sh = shingles(docs)
    sig = minhash_signatures(sh)

    rows_per_band = MINHASH_H // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"h{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # verify candidates with exact Jaccard (candidate set is tiny)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a_sh = sh.alias("sa")
    b_sh = sh.alias("sb")
    inter = (
        candidates.join(a_sh, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            b_sh,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n1"))), "doc_a")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n2"))), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return out


# ---------------------------------------------------------- SimHash dedup

def simhash_udf():
    """64-bit SimHash via an Arrow-batched pandas UDF. md5-seeded token
    bits (deterministic across runs/engines), weighted by token count;
    the signature bit j is the sign of the weighted sum."""
    import hashlib

    from ..functions.text import token_counts

    def simhash(text: str | None) -> int:
        v = [0] * 64
        for tok, cnt in token_counts(text).items():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for j in range(64):
                v[j] += cnt if (h >> j) & 1 else -cnt
        sig = 0
        for j in range(64):
            if v[j] > 0:
                sig |= 1 << j
        # interpret as signed 64-bit for Spark LongType
        return sig - (1 << 64) if sig >= 1 << 63 else sig

    def batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.apply(simhash)

    return F.pandas_udf(batch, "long")


def _simhash_oracle() -> str:
    """DuckDB twin of the full SimHash chain. The signature is pure
    deterministic arithmetic (md5-derived 64-bit token hashes, weighted
    sign sums), so the oracle rebuilds it bit by bit in SQL: 64 sign-sum
    columns → 4 16-bit chunk values → OR-of-chunk-equality candidates →
    hamming as the count of disagreeing sign bits."""
    from ..functions.text import STOPWORDS

    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks_sql = (
        f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'), "
        f"t -> t <> '' AND t NOT IN ({stop}))"
    )
    v_cols = ",\n         ".join(
        f"COALESCE(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN cnt ELSE -cnt END), 0) AS v{j}"
        for j in range(64)
    )
    bit_cols = ", ".join(f"CAST(v{j} > 0 AS INTEGER) AS b{j}" for j in range(64))
    chunk_cols = ", ".join(
        "(" + " + ".join(f"b{16 * c + k} * {1 << k}" for k in range(16)) + f") AS c{c}"
        for c in range(4)
    )
    ham = " + ".join(f"CAST(a.b{j} <> b.b{j} AS INTEGER)" for j in range(64))
    return f"""WITH toks AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest({toks_sql}) AS t FROM documents)
  GROUP BY doc_id, t
), hb AS (
  SELECT doc_id, cnt, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h FROM toks
), v AS (
  SELECT d.doc_id,
         {v_cols}
  FROM documents d LEFT JOIN hb ON d.doc_id = hb.doc_id
  GROUP BY d.doc_id
), bits AS (
  SELECT doc_id, {bit_cols} FROM v
), chunks AS (
  SELECT doc_id, {chunk_cols} FROM bits
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.doc_id < b.doc_id
   AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT c.doc_a, c.doc_b, CAST({ham} AS INTEGER) AS hamming
  FROM cand c JOIN bits a ON a.doc_id = c.doc_a JOIN bits b ON b.doc_id = c.doc_b
)
WHERE hamming <= {SIMHASH_MAX_HAMMING}"""


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: signature → 4×16-bit chunk LSH (two
    signatures within hamming 8 of each other must agree on ≥1 of 4
    chunks... not guaranteed, but high-probability; pinned engine
    choice) → verify hamming ≤ SIMHASH_MAX_HAMMING via ``bit_count``.
    The md5-seeded signature is engine-portable, so the whole chain —
    signature bits, chunk buckets, candidates, hamming verify — is
    hash-compared against the DuckDB twin (:func:`_simhash_oracle`)."""
    docs = load_raw(spark, sf_dir, "documents")
    sig = docs.select("doc_id", simhash_udf()(F.col("text")).alias("sig"))

    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("sig"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for c in range(4)
        ]
    )
    chunked = sig.select("doc_id", "sig", F.explode(chunks).alias("cc")).select(
        "doc_id", "sig", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val")
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


# ---------------------------------------------------- incremental dedup

#: Incremental-dedup split: docs below are the existing corpus, docs at
#: or above are the incoming batch (id-based → deterministic fixture).
INCR_SPLIT_FRACTION = 0.8


@register(
    "dedup_incremental_exact",
    f"""WITH bounds AS (
  SELECT CAST(floor((MAX(doc_id) + 1) * {INCR_SPLIT_FRACTION}) AS BIGINT) AS split
  FROM documents
),
corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents, bounds WHERE doc_id < split
),
batch AS (
  SELECT doc_id, md5(text) AS text_hash FROM documents, bounds WHERE doc_id >= split
)
SELECT b.doc_id, b.text_hash,
       CAST(c.h IS NOT NULL AS BOOLEAN) AS dup_of_corpus,
       CAST(b.doc_id <> MIN(b.doc_id) OVER (PARTITION BY b.text_hash) AS BOOLEAN)
         AS dup_in_batch,
       CAST(c.h IS NULL AND b.doc_id = MIN(b.doc_id) OVER (PARTITION BY b.text_hash)
            AS BOOLEAN) AS keep
FROM batch b LEFT JOIN corpus c ON b.text_hash = c.h""",
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup — the production ingest shape: dedup an
    incoming BATCH against the already-ingested CORPUS (and within
    itself) without ever re-scoring the corpus against itself. Corpus
    side reduces to distinct hashes (one column, the only state the
    operator needs — at 100 TB this is the persisted "seen hashes"
    table, orders of magnitude smaller than the corpus); batch side
    left-joins it and window-dedups internally. A doc is kept iff its
    hash is unseen in the corpus AND it is the first holder of that
    hash within the batch. The join is equi on hash (uniform key, no
    skew); the corpus side never shuffles more than its distinct-hash
    projection."""
    from pyspark.sql import Window

    docs = load_raw(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return spark.createDataFrame(
            [],
            "doc_id long, text_hash string, dup_of_corpus boolean, "
            "dup_in_batch boolean, keep boolean",
        )
    split = int((max_id + 1) * INCR_SPLIT_FRACTION)
    hashed = docs.select("doc_id", F.md5("text").alias("text_hash"))
    corpus = (
        hashed.filter(F.col("doc_id") < split)
        .select(F.col("text_hash").alias("h"))
        .distinct()
    )
    batch = hashed.filter(F.col("doc_id") >= split)
    w = Window.partitionBy("text_hash")
    return (
        batch.join(corpus, batch.text_hash == corpus.h, "left")
        .withColumn("dup_of_corpus", F.col("h").isNotNull())
        .withColumn(
            "dup_in_batch", F.col("doc_id") != F.min("doc_id").over(w)
        )
        .withColumn(
            "keep", ~F.col("dup_of_corpus") & ~F.col("dup_in_batch")
        )
        .select("doc_id", "text_hash", "dup_of_corpus", "dup_in_batch", "keep")
    )


# ------------------------------------------------- decontamination flag

#: Benchmark-overlap decontamination: shingle width, benchmark-set
#: size (first N doc_ids play the held-out eval set), and the flag
#: threshold (≥2 distinct shared shingles — a single shared 5-gram is
#: chance collision territory on natural text; two are not).
CONTAM_N = 5
CONTAM_BENCH_DOCS = 25
CONTAM_MIN_HITS = 2

_CONTAM_SHINGLE_JOIN = " || ' ' || ".join(
    f"ts[i+{k}]" for k in range(CONTAM_N)
)


@register(
    "dedup_contamination_flag",
    f"""WITH t AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, {_CONTAM_SHINGLE_JOIN} AS shingle
  FROM (SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM t)
  WHERE i <= len(ts) - {CONTAM_N - 1}
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < {CONTAM_BENCH_DOCS}
)
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) >= {CONTAM_MIN_HITS} AS BOOLEAN) AS contaminated
FROM sh a JOIN bench b ON a.shingle = b.shingle
WHERE a.doc_id >= {CONTAM_BENCH_DOCS}
GROUP BY a.doc_id""",
)
def dedup_contamination_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test **decontamination** — flag training docs that overlap
    a held-out benchmark set (the standard n-gram membership check run
    before every serious pretraining job; overlap leaks eval answers
    into the training set). Benchmark shingles reduce to a distinct
    one-column set — like the incremental-dedup corpus state, this is
    the persisted artifact at 100 TB (benchmarks are tiny; the set
    broadcasts). Training docs inverted-index-join it on shingle; a doc
    is contaminated at ``CONTAM_MIN_HITS`` distinct shared
    ``CONTAM_N``-grams. Emits only docs with ≥1 hit (the audit list),
    counting each shared shingle once."""
    docs = load_raw(spark, sf_dir, "documents")
    sh = shingles(docs, CONTAM_N)
    bench = (
        sh.filter(F.col("doc_id") < CONTAM_BENCH_DOCS)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= CONTAM_BENCH_DOCS)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            (F.count("*") >= CONTAM_MIN_HITS).alias("contaminated"),
        )
    )


# ---------------------------------------------------- fuzzy title join

#: Levenshtein threshold for the blocked fuzzy title match.
FUZZY_MAX_DIST = 6


@register(
    "dedup_fuzzy_title_join",
    f"""WITH news AS (
  SELECT doc_id AS news_id,
         array_to_string(string_split(text, ' ')[1:4], ' ') AS title
  FROM documents
)
SELECT a.news_id AS news_a, b.news_id AS news_b,
       a.title AS title_a, b.title AS title_b,
       CAST(levenshtein(a.title, b.title) AS INTEGER) AS distance
FROM news a JOIN news b
  ON string_split(a.title, ' ')[1] = string_split(b.title, ' ')[1]
 AND a.news_id < b.news_id
WHERE levenshtein(a.title, b.title) <= {FUZZY_MAX_DIST}""",
)
def dedup_fuzzy_title_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Blocked fuzzy-match join**: news titles within Levenshtein
    distance ``FUZZY_MAX_DIST``, candidates restricted to pairs sharing
    the FIRST TOKEN — the classic blocking key that turns an O(n²)
    edit-distance join into per-block pair spaces (same discipline as
    every other candidate generator in this module: never all-pairs).
    Levenshtein is exact integer output in both engines, so the whole
    chain hash-matches. At 100 TB the block key graduates to a cheaper
    surrogate (length band × first-token hash) and blocks cap their
    pair budget; the edit distance only ever runs inside blocks."""
    from ..sources import news

    n = news(spark, sf_dir).select(
        "news_id",
        "title",
        F.element_at(F.split(F.col("title"), " "), 1).alias("blk"),
    )
    a = n.alias("a")
    b = n.alias("b")
    dist = F.levenshtein(F.col("a.title"), F.col("b.title"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.news_id") < F.col("b.news_id")),
        )
        .filter(dist <= FUZZY_MAX_DIST)
        .select(
            F.col("a.news_id").alias("news_a"),
            F.col("b.news_id").alias("news_b"),
            F.col("a.title").alias("title_a"),
            F.col("b.title").alias("title_b"),
            dist.cast("int").alias("distance"),
        )
    )


# ------------------------------------------- cluster-canonical verdict

_CANONICAL_ORACLE = f"""WITH RECURSIVE {_minhash_ctes()},
mh_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN mh_edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       MIN(dst) AS canonical_id,
       (src = MIN(dst)) AS keep
FROM reach GROUP BY src"""


@register("dedup_neardup_canonical", _CANONICAL_ORACLE)
def dedup_neardup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END VERDICT: one row per document with its near-dup
    cluster's canonical id and a keep/drop flag — what a curation
    pipeline actually filters on (keep = smallest doc_id per cluster;
    every near-dup cluster survives exactly once).

    Composition: MinHash/LSH verified pairs (:func:`dedup_minhash_lsh`)
    → hash-min connected components over edge-endpoint docs only
    (``operators.similarity.hash_min_components``) → left-join the
    corpus back (singletons are their own canonical). The oracle
    rebuilds the same thing independently: the full SQL MinHash chain
    plus a recursive-CTE transitive closure.

    Scale: the pair job and the propagation loop are the two 100 TB
    paths already analyzed (SCALE.md dedup / components); the verdict
    join is corpus-sized but shuffle-free on the corpus side when the
    label set broadcasts (AQE decides)."""
    from .similarity import hash_min_components

    docs = load_raw(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = hash_min_components(pairs, "doc_a", "doc_b")
    return (
        docs.select("doc_id")
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("canonical_id"),
            (F.col("doc_id") == F.coalesce("comp", F.col("doc_id"))).alias(
                "keep"
            ),
        )
    )


# ---------------------------------------------- chunk-level dup ratio

@register(
    "dedup_chunk_ratio",
    """WITH chunks AS (
  SELECT doc_id, md5(chunk_text) AS h
  FROM (
    SELECT doc_id,
           array_to_string(ts[s + 1 : s + 64], ' ') AS chunk_text
    FROM (
      SELECT doc_id, ts, unnest(generate_series(0, len(ts) - 1, 48)) AS s
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS ts
            FROM documents)
      WHERE len(ts) > 0
    )
  )
), freq AS (
  SELECT h, COUNT(*) AS n FROM chunks GROUP BY h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       ROUND(SUM(CASE WHEN f.n > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
         AS dup_ratio
FROM chunks c JOIN freq f ON c.h = f.h
GROUP BY doc_id""",
)
def dedup_chunk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication signal (the C4/RefinedWeb-style
    paragraph-dedup statistic): per document, the fraction of its
    token-window chunks whose exact text also occurs elsewhere in the
    corpus (or repeats within the doc). High ``dup_ratio`` flags
    boilerplate-heavy or template documents that document-level dedup
    misses — the standard curation filter between exact-doc dedup and
    MinHash near-dup.

    Pipeline: the `ts_chunk_documents` chunker → md5 per chunk →
    corpus-frequency join on the hash → per-doc ratio. Hash keys are
    uniform, so the frequency shuffle is skew-free by construction; at
    100 TB the chunk hashes are the same state table
    `dedup_incremental_exact` maintains, so the ratio can be computed
    incrementally against yesterday's corpus."""
    from .textstats import CHUNK_SIZE, CHUNK_STRIDE  # pinned geometry
    from ..functions.text import TOKEN_SPLIT_REGEX

    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    base = (
        load_raw(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"))
        .filter(F.size("ts") > 0)
    )
    chunks = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - 1, F.lit(CHUNK_STRIDE)),
                lambda s: F.slice(F.col("ts"), s + 1, CHUNK_SIZE),
            )
        ).alias("ck"),
    ).select("doc_id", F.md5(F.array_join("ck", " ")).alias("h"))
    freq = chunks.groupBy("h").agg(F.count("*").alias("n"))
    dup = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            F.round(
                F.sum(dup.cast("double")) / F.count("*"), 6
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------- text vs embedding agreement

def _method_agreement_oracle() -> str:
    # Registration order: similarity.py loads after this module, so
    # pull its registrations in explicitly before reading the registry.
    from . import similarity  # noqa: F401

    from ..registry import _REGISTRY

    text_sql = _REGISTRY["dedup_ngram_jaccard"].oracle
    emb_sql = _REGISTRY["sim_neardup_pairs_exact"].oracle
    return f"""WITH text_pairs AS (
{text_sql}
), emb_pairs AS (
{emb_sql}
), t AS (SELECT doc_a, doc_b FROM text_pairs),
e AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM emb_pairs),
b AS (SELECT doc_a, doc_b FROM t INTERSECT SELECT doc_a, doc_b FROM e)
SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_text,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_embedding,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_both,
       ROUND(CAST((SELECT COUNT(*) FROM b) AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM t) + (SELECT COUNT(*) FROM e)
                      - (SELECT COUNT(*) FROM b), 0), 6)
         AS method_jaccard"""


@register("dedup_method_agreement", _method_agreement_oracle())
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Near-dup method agreement**: one row comparing the pair sets
    flagged by textual n-gram Jaccard (`dedup_ngram_jaccard`) and by
    embedding cosine (`sim_neardup_pairs_exact`), with the Jaccard of
    the two METHODS' verdicts — the calibration read before trusting
    either method alone on a new corpus (high agreement → either
    suffices; low → the corpus has paraphrase-style near-dups only
    embeddings see, or surface-copy dups only shingles see).
    ``vec_id`` is read as the embedding of the same-numbered document
    (the fixtures' row-aligned convention). Component oracles are
    embedded verbatim, so the report cannot drift from the dedup
    operators it compares.

    Plan: both pair relations are candidate-generation-then-verify
    (never all-pairs); the agreement adds three bounded-size set
    aggregates on top."""
    text = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    emb = sim_neardup_pairs_exact_pairs_view(spark, sf_dir)
    both = text.intersect(emb)
    n_t, n_e, n_b = text.count(), emb.count(), both.count()
    denom = n_t + n_e - n_b
    return spark.createDataFrame(
        [(n_t, n_e, n_b, round(n_b / denom, 6) if denom else None)],
        "n_text long, n_embedding long, n_both long, method_jaccard double",
    )


def sim_neardup_pairs_exact_pairs_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_a, doc_b) projection of the embedding near-dup pairs, with
    vec ids read as doc ids (row-aligned fixture convention)."""
    from .similarity import sim_neardup_pairs_exact

    return sim_neardup_pairs_exact(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )


# -------------------------------------- effective-token dedup report

def _effective_tokens_oracle() -> str:
    from .textstats import _TOKENS_SQL

    return f"""WITH RECURSIVE {_minhash_ctes()},
mh_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN mh_edges e ON r.dst = e.src
),
verdict AS (
  SELECT src AS doc_id, (src = MIN(dst)) AS keep FROM reach GROUP BY src
),
tok AS (
  SELECT doc_id, source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN v.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(t.n_tokens) AS BIGINT) AS raw_tokens,
       CAST(SUM(CASE WHEN v.keep THEN t.n_tokens ELSE 0 END) AS BIGINT)
         AS effective_tokens,
       CAST(CAST(FLOOR((CAST(SUM(CASE WHEN v.keep THEN t.n_tokens ELSE 0 END) AS DOUBLE) / SUM(t.n_tokens)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS retention
FROM tok t JOIN verdict v ON t.doc_id = v.doc_id
GROUP BY t.source"""


@register("dedup_effective_tokens", _effective_tokens_oracle())
def dedup_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Effective-token budget after dedup**, per source: raw token
    count vs tokens surviving the near-dup canonical verdict, with the
    retention ratio. THE number a pretraining data plan is built on —
    a source contributing 1B raw tokens at 40% retention funds fewer
    training steps than a 500M-token source at 95%, and this relation
    is how that call gets made (and how epoching/mixture weights are
    renormalized after dedup).

    Composition of verified relations only: the canonical keep/drop
    verdict (:func:`dedup_neardup_canonical`) joined to per-doc token
    counts, rolled up per source (≤ |sources| groups). Oracle rebuilds
    the full chain independently (MinHash CTEs + recursive closure +
    DuckDB-side tokenization)."""
    from ..sources import load_raw as _load
    from .textstats import _tokens

    docs = _load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    verdict = dedup_neardup_canonical(spark, sf_dir).select("doc_id", "keep")
    kept_tokens = F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(F.lit(0)))
    return (
        tok.join(verdict, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("raw_tokens"),
            kept_tokens.cast("long").alias("effective_tokens"),
            ppm_value(
                kept_tokens.cast("double") / F.sum("n_tokens")
            ).alias("retention"),
        )
    )


# ------------------------------------------------- containment dedup

#: Directed-containment threshold (|A∩B| / |smaller|). Calibrated like
#: JACCARD_THRESHOLD: planted near-dups sit ≥0.9, unrelated <0.1.
CONTAIN_THRESHOLD = 0.6


@register(
    "dedup_containment",
    f"""WITH {_SHINGLES_CTE},
i AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT i.d1 AS doc_a, i.d2 AS doc_b,
       CASE WHEN s1.n <= s2.n THEN i.d1 ELSE i.d2 END AS contained_doc,
       ROUND(CAST(i.inter AS DOUBLE) / LEAST(s1.n, s2.n), 6) AS containment,
       ROUND(CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter), 6) AS jaccard,
       CAST(CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter)
            < {JACCARD_THRESHOLD} AS BOOLEAN) AS jaccard_missed
FROM i JOIN s s1 ON i.d1 = s1.doc_id JOIN s s2 ON i.d2 = s2.doc_id
WHERE CAST(i.inter AS DOUBLE) / LEAST(s1.n, s2.n) >= {CONTAIN_THRESHOLD}""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Containment dedup** — directed near-dup detection by
    ``|A∩B| / |smaller set|`` over the same distinct-shingle relation
    as :func:`dedup_ngram_jaccard`. Containment catches what Jaccard
    structurally cannot: a short document pasted inside a much longer
    one has Jaccard ≈ |A|/|B| → 0 but containment ≈ 1 — the dominant
    duplication mode in web corpora (boilerplate-wrapped articles,
    quoted reposts, documentation mirrors). Emits both metrics plus
    the ``jaccard_missed`` flag: rows only containment caught.

    Plan: identical inverted-index candidate generation (equi-join on
    shingle — only docs sharing ≥1 shingle ever pair), two broadcast-
    size joins against per-doc set sizes, threshold pushdown on the
    aggregated pair relation. At 100 TB the shingle join is the same
    banded-LSH upgrade path as the Jaccard form (MinHash respects
    containment after the size-ratio correction), so candidate cost
    never becomes all-pairs."""
    docs = load_raw(spark, sf_dir, "documents")
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n2"))
    contain = F.col("inter") / F.least("n1", "n2")
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(s1, "doc_a")
        .join(s2, "doc_b")
        .filter(contain >= CONTAIN_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("n1") <= F.col("n2"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
            F.round(contain, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
            (jac < JACCARD_THRESHOLD).alias("jaccard_missed"),
        )
    )


# --------------------------------------------- LSH band-tuning curve

#: The (bands, rows-per-band) operating points swept over the H=32
#: signature; (MINHASH_BANDS, 2) is the production configuration.
BAND_SWEEP = ((32, 1), (MINHASH_BANDS, MINHASH_H // MINHASH_BANDS), (8, 4))


def _capture_at_threshold(bands: int, rpb: int) -> float:
    """The S-curve capture probability 1−(1−t^r)^b at t = the verify
    threshold, pinned to 6 dp as a shared literal so neither engine
    computes a float pow at runtime."""
    return round(1.0 - (1.0 - JACCARD_THRESHOLD**rpb) ** bands, 6)


def _band_tuning_oracle() -> str:
    per_cfg = []
    selects = []
    for bands, rpb in BAND_SWEEP:
        band_selects = "\n    UNION ALL\n    ".join(
            "SELECT doc_id, {b} AS band, md5({key}) AS bucket FROM sig".format(
                b=b,
                key=" || ',' || ".join(
                    f"CAST(h{b * rpb + r} AS VARCHAR)" for r in range(rpb)
                ),
            )
            for b in range(bands)
        )
        per_cfg.append(
            f"""banded_{bands} AS (
    {band_selects}
), cand_{bands} AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded_{bands} a JOIN banded_{bands} b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""
        )
        per_cfg.append(
            f"""counts_{bands} AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_{bands}) AS n_candidates,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_{bands} c
          JOIN true_pairs t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
           AS n_verified,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM true_pairs) AS n_true
)"""
        )
        selects.append(
            f"""SELECT CAST({bands} AS INTEGER) AS bands,
       CAST({rpb} AS INTEGER) AS rows_per_band,
       n_candidates, n_verified, n_true,
       ROUND(CAST(n_verified AS DOUBLE) / NULLIF(n_true, 0), 6) AS recall,
       ROUND(CAST(n_verified AS DOUBLE) / NULLIF(n_candidates, 0), 6)
         AS precision,
       CAST({_capture_at_threshold(bands, rpb)} AS DOUBLE)
         AS capture_at_threshold
FROM counts_{bands}"""
        )
    return (
        f"""WITH {_SHINGLES_CTE},
sigsrc AS (
  SELECT doc_id, {_SHINGLE_X_SQL} AS xm FROM sh
),
sig AS (
  SELECT doc_id,
         """
        + ",\n         ".join(
            f"MIN(({_mh_a(i)} * xm + {_mh_b(i)}) % {_MH_P}) AS h{i}"
            for i in range(MINHASH_H)
        )
        + f"""
  FROM sigsrc GROUP BY doc_id
), true_pairs AS (
{_JACCARD_BODY}
), """
        + ",\n".join(per_cfg)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


@register("dedup_band_tuning_curve", _band_tuning_oracle())
def dedup_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**LSH band-tuning curve**: candidate volume, verified true
    pairs, recall, and precision of the MinHash index at each
    (bands × rows-per-band) split of the H=32 signature, against the
    exact shingle-Jaccard ground truth — the dedup twin of
    ``sim_nprobe_recall_curve``, answering "how many bands does THIS
    corpus need?" with data instead of the textbook S-curve (whose
    pinned capture probability at the verify threshold is emitted
    alongside for comparison). More bands → higher recall, more
    candidates to verify; the curve prices that trade.

    Plan: shingles and the 32-hash signatures are computed ONCE and
    persisted; each operating point re-bands the tiny signature
    relation (8·H bytes/doc), self-joins on (band, bucket), and
    reduces to ONE audit row via scalar-aggregate combines. The exact
    ground truth is the already-verified inverted-index Jaccard join —
    at 100 TB you'd swap it for a held-out sample, keeping the curve
    O(sample), while candidates stay LSH-bounded."""
    docs = load_raw(spark, sf_dir, "documents")
    sh = shingles(docs)
    sig = minhash_signatures(sh).persist()
    true_pairs = (
        dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").persist()
    )
    n_true = true_pairs.agg(
        F.count("*").cast("long").alias("n_true")
    )

    slices, cands = [], []
    for bands, rpb in BAND_SWEEP:
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{b * rpb + r}").cast("string")
                                for r in range(rpb)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        banded = sig.select("doc_id", F.explode(band_arr).alias("bb")).select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        cands.append(cand)
        n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
        n_ver = cand.join(true_pairs, ["doc_a", "doc_b"]).agg(
            F.count("*").cast("long").alias("n_verified")
        )
        slices.append(
            n_cand.crossJoin(n_ver)
            .crossJoin(n_true)
            .select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(rpb).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                "n_true",
                F.round(
                    F.col("n_verified").cast("double")
                    / F.nullif(F.col("n_true"), F.lit(0)),
                    6,
                ).alias("recall"),
                F.round(
                    F.col("n_verified").cast("double")
                    / F.nullif(F.col("n_candidates"), F.lit(0)),
                    6,
                ).alias("precision"),
                F.lit(_capture_at_threshold(bands, rpb))
                .cast("double")
                .alias("capture_at_threshold"),
            )
        )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    from .bsp import checkpoint_result

    return checkpoint_result(out, sig, true_pairs, *cands)


# ------------------------------------------------- n-gram novelty

@register(
    "dedup_ngram_novelty",
    f"""WITH {_SHINGLES_CTE},
firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(CAST(FLOOR((CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS novelty
FROM sh s JOIN firsts f ON f.shingle = s.shingle
GROUP BY s.doc_id""",
)
def dedup_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Marginal n-gram novelty** per document: the fraction of a
    doc's distinct shingles whose FIRST corpus occurrence (smallest
    doc_id — the deterministic stand-in for ingest order) is this doc.
    This is the diminishing-returns curve of adding more data, per
    row: novelty ≈ 1 is fresh content, novelty ≈ 0 is a re-hash of
    what the corpus already holds — the doc-level complement of the
    corpus-level effective-token budget (``dedup_effective_tokens``),
    and a rank key for "which docs actually grow the training set".
    Docs shorter than the shingle width have no shingles and are
    absent by construction (both engines).

    Plan: the same shingle-keyed shuffle as the inverted-index Jaccard
    join — one MIN per shingle, one join back on shingle, one per-doc
    aggregate; all map-side combinable, no pair explosion anywhere. At
    100 TB first-occurrence is computed per ingest batch against a
    Bloom/exact shingle ledger (``dedup_incremental_exact`` pattern);
    the batch form here is the ledger bootstrap."""
    docs = load_raw(spark, sf_dir, "documents")
    sh = shingles(docs)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
            ppm_value(
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(
                        0
                    )
                ).cast("double")
                / F.count("*")
            ).alias("novelty"),
        )
    )


# ------------------------------------------------ winnowing fingerprints

#: Winnowing window: one fingerprint is guaranteed out of every
#: WINNOW_W consecutive shingle hashes (MOSS / Schleimer et al. 2003).
WINNOW_W = 4
#: Minimum shared fingerprints for a reported candidate span match.
WINNOW_MIN_SHARED = 3
#: Position packing: key = h·2^20 + (2^20−1−pos). Caps positions at
#: 2^20 shingles per document — beyond that, chunk first (the corpus
#: pipeline does anyway).
_WIN_POS_BITS = 20
_WIN_POS_CAP = (1 << _WIN_POS_BITS) - 1


@register(
    "dedup_winnowing",
    f"""WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'), t -> t <> '')
    AS ts
  FROM documents
), possh AS (
  SELECT doc_id, i AS pos, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
           AS shingle
  FROM (SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM toks)
  WHERE i <= len(ts) - {SHINGLE_N - 1}
), hashed AS (
  SELECT doc_id, pos,
         ({_SHINGLE_X_SQL}) * {1 << _WIN_POS_BITS}
           + ({_WIN_POS_CAP} - pos) AS key,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
  FROM possh
), wins AS (
  SELECT doc_id,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {WINNOW_W - 1} FOLLOWING) AS sel
  FROM hashed
  QUALIFY pos <= n_sh - {WINNOW_W - 1}
), fp AS (
  SELECT DISTINCT doc_id,
         sel // {1 << _WIN_POS_BITS} AS fp_hash,
         {_WIN_POS_CAP} - (sel % {1 << _WIN_POS_BITS}) AS fp_pos
  FROM wins
), counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM (SELECT DISTINCT doc_id, fp_hash FROM fp) a
  JOIN (SELECT DISTINCT doc_id, fp_hash FROM fp) b
    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       ca.n_fp AS n_fp_a, cb.n_fp AS n_fp_b,
       ROUND(CAST(p.n_shared AS DOUBLE) / LEAST(ca.n_fp, cb.n_fp), 6)
         AS containment
FROM pairs p
JOIN counts ca ON ca.doc_id = p.doc_a
JOIN counts cb ON cb.doc_id = p.doc_b
WHERE p.n_shared >= {WINNOW_MIN_SHARED}""",
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Winnowing span-level dedup** (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS algorithm): sub-document copy detection, the granularity
    the doc-level MinHash/SimHash family can't see. Each document's
    3-token shingle hashes are *winnowed* — from every window of
    ``WINNOW_W`` consecutive hashes keep the minimum, rightmost on
    ties — guaranteeing any shared run of ≥ W+shingle−1 tokens shares
    at least one selected fingerprint, while storing only ~2/(W+1) of
    all shingles. Docs sharing ≥ 3 fingerprints report as candidate
    span matches with a containment score.

    Determinism trick: the (hash, rightmost-pos) window minimum packs
    into ONE integer key — ``h·2²⁰ + (2²⁰−1−pos)`` — so both engines
    run an identical plain ``MIN`` frame; no struct ordering, no
    argmin semantics to align.

    Scale: selection is a doc-bounded window over the shingle stream
    (one shuffle on doc_id); matching joins on fp_hash — bucketed
    candidate generation like LSH, never all-pairs. The stored index
    is the winnowed ~2/(W+1) fraction of shingles, which is the whole
    point of the algorithm at 100 TB."""
    from pyspark.sql import Window

    docs = load_raw(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    tok_df = docs.select("doc_id", toks.alias("ts"))
    sh = F.when(
        F.size("ts") >= SHINGLE_N,
        F.transform(
            F.sequence(F.lit(0), F.size("ts") - SHINGLE_N),
            lambda i: F.concat_ws(
                " ",
                *[
                    F.element_at(F.col("ts"), i + k + 1)
                    for k in range(SHINGLE_N)
                ],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    possh = tok_df.select(
        "doc_id", F.posexplode(sh).alias("pos0", "shingle")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")
    key = _shingle_x(F.col("shingle")) * (1 << _WIN_POS_BITS) + (
        _WIN_POS_CAP - F.col("pos")
    )
    hashed = possh.select(
        "doc_id",
        "pos",
        key.alias("key"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    wsel = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    wins = hashed.withColumn("sel", F.min("key").over(wsel)).filter(
        F.col("pos") <= F.col("n_sh") - (WINNOW_W - 1)
    )
    # four consumers (counts + the deduped hash relation feeding both
    # pair sides) over the winnowed fingerprints, no cross-subtree CSE:
    # un-persisted, the tokenize+shingle-hash+window chain executed 4x
    # (4 scans in plans/r12/dedup_winnowing_before.txt). Released after
    # the small pair result materializes (r12).
    fp = wins.select(
        "doc_id",
        (F.col("sel") / (1 << _WIN_POS_BITS)).cast("long").alias("fp_hash"),
        (_WIN_POS_CAP - F.col("sel") % (1 << _WIN_POS_BITS)).alias("fp_pos"),
    ).distinct().persist()
    counts = fp.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    fph = fp.select("doc_id", "fp_hash").distinct()
    a = fph.select(
        F.col("doc_id").alias("doc_a"), F.col("fp_hash").alias("h")
    )
    b = fph.select(
        F.col("doc_id").alias("doc_b"), F.col("fp_hash").alias("h")
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    ca = counts.select(
        F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a")
    )
    cb = counts.select(
        F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b")
    )
    out = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("n_fp_a"), F.col("n_fp_b")),
                6,
            ).alias("containment"),
        )
    )
    from .bsp import checkpoint_result

    return checkpoint_result(out, fp)


# ------------------------------------------------ boundary stitching

#: Tokens compared at each document boundary (suffix of A vs prefix of
#: B). Production crawls stitch on ~50-token boundaries; the fixture
#: vocabulary is 40 words, so 3 keeps the demo non-degenerate.
STITCH_K = 3


@register(
    "dedup_boundary_stitch",
    f"""WITH t AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'), x -> x <> '')
    AS ts
  FROM documents
), hs AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         array_to_string(ts[1:{STITCH_K}], ' ') AS head,
         array_to_string(ts[len(ts)-{STITCH_K}+1:len(ts)], ' ') AS tail
  FROM t WHERE len(ts) >= {STITCH_K}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.tail AS boundary,
       a.n_tokens AS n_tokens_a, b.n_tokens AS n_tokens_b
FROM hs a JOIN hs b ON a.tail = b.head AND a.doc_id <> b.doc_id""",
)
def dedup_boundary_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Shard-boundary stitching audit**: find document pairs where
    A's last ``STITCH_K`` tokens equal B's first ``STITCH_K`` — the
    signature of one logical document split across crawl shards /
    chunk boundaries (the complement of the chunker: chunks OVERLAP by
    construction; crawl shards shouldn't). Reported pairs are
    candidates for re-joining before dedup, since split halves defeat
    doc-level MinHash.

    Plan: one projection computes both boundary grams per doc (no
    explode — array slices), then a single equi-join on the boundary
    string — hash-partitioned by boundary gram, never all-pairs. At
    100 TB the gram would be a 50-token md5; the join shape is
    unchanged."""
    docs = load_raw(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    t = docs.select("doc_id", toks.alias("ts")).filter(
        F.size("ts") >= STITCH_K
    )
    hs = t.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.array_join(F.slice("ts", 1, STITCH_K), " ").alias("head"),
        F.array_join(
            F.slice("ts", F.size("ts") - STITCH_K + 1, STITCH_K), " "
        ).alias("tail"),
    )
    a = hs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_tokens").alias("n_tokens_a"),
        F.col("tail").alias("boundary"),
    )
    b = hs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_tokens").alias("n_tokens_b"),
        F.col("head").alias("boundary"),
    )
    return (
        a.join(b, "boundary")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "boundary", "n_tokens_a", "n_tokens_b"
        )
    )


# ------------------------------------- exact duplicated-span fraction

#: Span granularity (tokens) for exact substring dedup. Suffix-array
#: dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
#: Models Better") removes any repeated substring ≥ N tokens; the
#: fixed-L re-expression below detects every repeat of length ≥ L as a
#: run of duplicated L-gram anchors, which is the same span set at
#: L-token resolution (a repeat of length m ≥ L covers m-L+1
#: consecutive anchors whose interval union is exactly the span).
SPAN_L = 6

_SPAN_GRAMS_CTE = f"""g AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(ts[i:i+{SPAN_L}-1], ' ')) AS gh
  FROM (
    SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM (
      SELECT doc_id, list_filter(
        string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'),
        t -> t <> '') AS ts
      FROM documents
    )
  ) WHERE i <= len(ts) - {SPAN_L - 1}
)"""


@register(
    "dedup_duplicated_spans",
    f"""WITH {_SPAN_GRAMS_CTE},
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
hits AS (
  SELECT doc_id, pos, pos + {SPAN_L - 1} AS fin
  FROM g WHERE gh IN (SELECT gh FROM dup)
),
merged AS (
  SELECT doc_id,
         GREATEST(0, fin - GREATEST(pos - 1,
           COALESCE(MAX(fin) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
           AS covered
  FROM hits
),
n AS (
  SELECT doc_id, CAST(len(list_filter(
    string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'),
    t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT m.doc_id, n.n_tokens,
       CAST(SUM(m.covered) AS BIGINT) AS dup_tokens,
       ROUND(CAST(SUM(m.covered) AS DOUBLE) / n.n_tokens, 6) AS dup_frac
FROM merged m JOIN n ON m.doc_id = n.doc_id
GROUP BY m.doc_id, n.n_tokens""",
)
def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of tokens inside an exactly-duplicated span of
    ≥ ``SPAN_L`` tokens anywhere in the corpus (self-repeats included)
    — the fixed-granularity re-expression of suffix-array exact
    substring dedup (Lee et al. 2022), the curation signal behind
    "drop/trim documents that are mostly copied boilerplate".

    Plan, all Catalyst: (1) L-gram anchors built per row by a
    ``transform`` over token indices (compute, not a join) and keyed
    by md5 so the shuffle carries 32-byte digests, not L-token
    strings; (2) one md5-keyed hash aggregate finds anchors occurring
    ≥ 2 times corpus-wide (map-side combinable counts); (3) a
    semi-join marks each doc's hit positions; (4) the interval union
    |∪ [pos, pos+L-1]| is ONE doc-bounded running-max window — each
    hit contributes ``max(0, end - max(start-1, max_prev_end))``, the
    standard one-pass union-of-intervals scan, so overlapping anchors
    of a long repeat are never double-counted.

    Scale: anchors are O(total tokens) rows but reduce map-side; the
    only shuffles are the anchor-hash aggregate, the semi-join, and
    one doc_id window whose partitions are doc-sized. No pairwise
    relation is ever formed — corpus-wide duplication is detected by
    counting, not joining, which is what lets the suffix-array method
    run on trillion-token corpora and this plan scale the same way."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    t = load_raw(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("ts")
    )
    n = t.select("doc_id", F.size("ts").cast("long").alias("n_tokens"))
    grams = (
        t.filter(F.size("ts") >= SPAN_L)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - SPAN_L + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.array_join(F.slice("ts", i, SPAN_L), " ")
                        ).alias("gh"),
                    ),
                )
            ).alias("a"),
        )
        .select("doc_id", "a.pos", "a.gh")
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + SPAN_L - 1).alias("fin")
    )
    from pyspark.sql import Window

    prev_end = F.max("fin").over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = F.greatest(
        F.lit(0),
        F.col("fin")
        - F.greatest(F.col("pos") - 1, F.coalesce(prev_end, F.lit(0))),
    )
    return (
        hits.select("doc_id", covered.alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").cast("bigint").alias("dup_tokens"))
        .join(n, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            F.round(
                F.col("dup_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


# ------------------------------- prefix-filtered exact Jaccard join

_PFX_ORDERED_CTE = f"""o AS (
  SELECT s.doc_id, s.shingle,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY d.df, s.shingle) AS rk,
         COUNT(*) OVER (PARTITION BY s.doc_id) AS n
  FROM sh s JOIN (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle) d
    USING (shingle)
)"""


@register(
    "dedup_prefix_filter_join",
    f"""WITH {_SHINGLES_CTE},
{_PFX_ORDERED_CTE},
pfx AS (
  SELECT doc_id, shingle FROM o
  WHERE rk <= n - CEIL({JACCARD_THRESHOLD} * n) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pfx a JOIN pfx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_a
  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i), 6) AS jaccard
FROM inter i
JOIN sz s1 ON i.doc_a = s1.doc_id
JOIN sz s2 ON i.doc_b = s2.doc_id
WHERE CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i) >= {JACCARD_THRESHOLD}""",
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard similarity join at threshold
    ``JACCARD_THRESHOLD``, with PREFIX FILTERING (SSJoin/PPJoin family,
    Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) generating the
    candidates instead of the full inverted index: order each doc's
    shingles by ascending global document frequency (rarest first,
    ties by shingle text), keep only the first ``n - ⌈t·n⌉ + 1`` — two
    sets with Jaccard ≥ t MUST collide inside these prefixes, so
    joining prefixes alone loses no pair. Result set is therefore
    IDENTICAL to :func:`dedup_ngram_jaccard` (same shingles, same
    threshold; cross-checked in pytest) while joining a fraction of
    the index (977 vs 11,533 candidate pairs at sf0.01).

    Plan: df counts = one shingle-keyed hash aggregate; per-doc
    rank = doc-bounded window; prefix self-join on shingle; exact
    verification joins each candidate pair back to the two docs'
    shingle rows — cost scales with candidates, not with every
    colliding pair. Rarest-first ordering is what makes the prefixes
    selective: high-df boilerplate shingles never enter a prefix
    unless the doc is mostly boilerplate.

    Scale: the classic exact counterpart to MinHash-LSH
    (:func:`dedup_minhash_lsh` trades exactness for fixed-size
    signatures; this keeps exactness and prunes algebraically). Skew
    lever at 100 TB: a df cap on join keys (drop shingles with df >
    corpus fraction ε from prefixes of docs whose prefix has rarer
    entries) bounds the hottest bucket; AQE skew-join split covers
    the rest."""
    docs = load_raw(spark, sf_dir, "documents")
    # sh feeds FIVE independent subtrees (df counts, sizes, the ordered
    # ranking, both verify sides) with no cross-subtree CSE in Catalyst:
    # un-persisted this plan held 20 parquet scans / 54 exchanges
    # (plans/r12/dedup_prefix_filter_join_before.txt) — the whole
    # tokenize+shingle+distinct chain re-ran per consumer. pfx likewise
    # feeds both sides of the candidate self-join. Both released after
    # the (small) pair result materializes (operators/bsp.py).
    sh = shingles(docs).persist()
    from pyspark.sql import Window

    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sizes_pre = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # per-doc set size comes from the sizes aggregate (already needed
    # for verification) instead of a second doc-keyed COUNT window —
    # one window pass over the sh⋈df relation instead of two
    ordered = (
        sh.join(df_counts, "shingle")
        .join(sizes_pre, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
    )
    pfx = (
        ordered.filter(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n")) + 1
        )
        .select("doc_id", "shingle", "n")
        .persist()
    )
    # PPJoin length filter (r13, guide §3 pre-filter): J(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|), so J ≥ t requires min ≥ t·max — at
    # t = 1/2 exactly 2·least(n_a, n_b) ≥ greatest(n_a, n_b) in pure
    # integer arithmetic (no FP boundary risk). Pairs failing it can
    # never reach the threshold, so pruning them INSIDE the candidate
    # join changes no result (the final jaccard filter would drop them)
    # while the expensive per-candidate verify joins see fewer rows.
    cand = (
        pfx.alias("a")
        .join(
            pfx.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n")) * 2
                >= F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sizes = sizes_pre
    inter = (
        cand.join(sh.alias("s1"), F.col("s1.doc_id") == F.col("doc_a"))
        .join(
            sh.alias("s2"),
            (F.col("s2.doc_id") == F.col("doc_b"))
            & (F.col("s2.shingle") == F.col("s1.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    jac = (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("doc_a"), F.col("n").alias("n1")
                )
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("doc_b"), F.col("n").alias("n2")
                )
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard_raw",
            F.col("i").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("i")),
        )
    )
    out = jac.filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard")
    )
    from .bsp import checkpoint_result

    return checkpoint_result(out, sh, pfx)


# ------------------------------------------------ duplicated-span scrub

@register(
    "dedup_span_scrub",
    f"""WITH {_SPAN_GRAMS_CTE},
occ AS (
  SELECT gh, doc_id, pos,
         COUNT(*) OVER (PARTITION BY gh) AS c,
         ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rk
  FROM g
),
removals AS (
  SELECT doc_id, pos, pos + {SPAN_L} AS fin_excl
  FROM occ WHERE c >= 2 AND rk > 1
),
toks AS (
  SELECT doc_id, i, ts[i] AS tok
  FROM (
    SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM (
      SELECT doc_id, list_filter(
        string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'),
        t -> t <> '') AS ts
      FROM documents
    )
  )
),
sweep AS (
  SELECT doc_id, p, is_tok, tok,
         SUM(delta) OVER (PARTITION BY doc_id
                          ORDER BY p, is_tok
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS depth
  FROM (
    SELECT doc_id, pos AS p, 0 AS is_tok, 1 AS delta, NULL AS tok
      FROM removals
    UNION ALL
    SELECT doc_id, fin_excl AS p, 0 AS is_tok, -1 AS delta, NULL AS tok
      FROM removals
    UNION ALL
    SELECT doc_id, i AS p, 1 AS is_tok, 0 AS delta, tok FROM toks
  )
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS removed_tokens,
       md5(COALESCE(string_agg(CASE WHEN depth = 0 THEN tok END, ' '
           ORDER BY p), '')) AS scrubbed_md5
FROM sweep WHERE is_tok = 1
GROUP BY doc_id""",
)
def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of exact substring dedup: rebuild every document
    with all non-first occurrences of duplicated ≥ ``SPAN_L``-token
    spans removed (the corpus-wide first occurrence — smallest
    (doc_id, pos) — survives), Lee et al. 2022's actual
    transformation, not just the detection signal. Output is
    md5-verified: both engines must produce byte-identical scrubbed
    token streams.

    Plan: (1) anchor occurrences ranked per gram hash by (doc_id,
    pos) — one gh-keyed window — so "first stays" is a rank
    predicate; (2) removal intervals become ±1 boundary events and
    coverage is ONE doc-bounded sweep window (events sort before the
    token at the same position via the (p, is_tok) key; ends are
    exclusive at pos+L), the standard O(n log n) interval-stabbing
    scan with BIGINT depth state — never a tokens×intervals join;
    (3) surviving tokens re-join with a deterministic ordered
    aggregation.

    Scale: two doc_id-keyed shuffles (sweep + reassembly) and one
    gh-keyed window over O(total tokens) rows; the removal set is
    output-sized. Same no-pairwise-relation property as
    :func:`dedup_duplicated_spans` — duplication is resolved by
    ranking within gram-hash groups, not by joining documents."""
    toks_arr = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    t = load_raw(spark, sf_dir, "documents").select(
        "doc_id", toks_arr.alias("ts")
    )
    grams = (
        t.filter(F.size("ts") >= SPAN_L)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - SPAN_L + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.array_join(F.slice("ts", i, SPAN_L), " ")
                        ).alias("gh"),
                    ),
                )
            ).alias("a"),
        )
        .select("doc_id", "a.pos", "a.gh")
    )
    from pyspark.sql import Window

    wg = Window.partitionBy("gh")
    occ = grams.select(
        "doc_id",
        "pos",
        F.count("*").over(wg).alias("c"),
        F.row_number()
        .over(wg.orderBy("doc_id", "pos"))
        .alias("rk"),
    )
    removals = occ.filter((F.col("c") >= 2) & (F.col("rk") > 1)).select(
        "doc_id", "pos", (F.col("pos") + SPAN_L).alias("fin_excl")
    )
    toks = t.select(
        "doc_id", F.posexplode("ts").alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    starts = removals.select(
        "doc_id",
        F.col("pos").alias("p"),
        F.lit(0).alias("is_tok"),
        F.lit(1).alias("delta"),
        F.lit(None).cast("string").alias("tok"),
    )
    ends = removals.select(
        "doc_id",
        F.col("fin_excl").alias("p"),
        F.lit(0).alias("is_tok"),
        F.lit(-1).alias("delta"),
        F.lit(None).cast("string").alias("tok"),
    )
    trows = toks.select(
        "doc_id",
        F.col("i").alias("p"),
        F.lit(1).alias("is_tok"),
        F.lit(0).alias("delta"),
        "tok",
    )
    sweep = starts.unionByName(ends).unionByName(trows).withColumn(
        "depth",
        F.sum("delta").over(
            Window.partitionBy("doc_id")
            .orderBy("p", "is_tok")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    kept = sweep.filter(F.col("is_tok") == 1)
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum((F.col("depth") > 0).cast("int"))
        .cast("bigint")
        .alias("removed_tokens"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("depth") == 0,
                                    F.struct("p", "tok"),
                                )
                            )
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                ),
                F.lit(""),
            )
        ).alias("scrubbed_md5"),
    )


# ------------------------------------------------ incremental LSH dedup

@register(
    "dedup_incremental_lsh",
    f"""WITH {_minhash_ctes()},
spl AS (
  SELECT CAST(floor((MAX(doc_id) + 1) * {INCR_SPLIT_FRACTION}) AS BIGINT)
    AS s
  FROM documents
),
cross_pairs AS (
  -- batch ids all exceed corpus ids, so mh_pairs' doc_a<doc_b order
  -- puts the corpus doc in doc_a for every straddling pair
  SELECT p.doc_b AS doc_id, p.doc_a AS match_id,
         ROUND(p.jaccard, 6) AS j
  FROM mh_pairs p CROSS JOIN spl
  WHERE p.doc_b >= spl.s AND p.doc_a < spl.s
),
best AS (
  SELECT doc_id, match_id, j,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY j DESC, match_id) AS rn
  FROM cross_pairs
),
batch AS (
  SELECT doc_id FROM documents CROSS JOIN spl WHERE doc_id >= spl.s
)
SELECT b.doc_id,
       CAST(m.match_id IS NULL AS BOOLEAN) AS is_new,
       m.match_id AS nearest_corpus_doc,
       m.j AS best_jaccard
FROM batch b
LEFT JOIN (SELECT * FROM best WHERE rn = 1) m USING (doc_id)""",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup — the production ingest shape for
    the fuzzy path, completing :func:`dedup_incremental_exact` (exact
    hashes) with MinHash-LSH: band an incoming batch's signatures and
    probe the stored corpus index's buckets, never pairing the corpus
    against itself and never the batch against itself. Per batch doc:
    is it new, and if not which corpus doc is its nearest near-dup
    (highest exact-verified Jaccard, ties to the smallest id,
    quantized at 6 dp before ranking).

    The corpus side's persisted state is its banded bucket table
    (MINHASH_BANDS rows of 32-byte digests per doc — like the exact
    op's "seen hashes", orders of magnitude smaller than the corpus)
    plus its shingle index for verification. Candidates = batch
    buckets ⋈ index buckets; verification joins only candidate pairs.

    Scale: batch-sized work against index-sized lookups — the
    (band, bucket) equi-join touches only colliding buckets, exact
    verification only candidate pairs; the corpus is never rescanned
    pairwise. The split is the pinned INCR_SPLIT_FRACTION id boundary
    shared with the exact op."""
    docs = load_raw(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return spark.createDataFrame(
            [],
            "doc_id long, is_new boolean, nearest_corpus_doc long, "
            "best_jaccard double",
        )
    split = int((max_id + 1) * INCR_SPLIT_FRACTION)

    # NOTE (r12): sh feeds signatures, sizes and both verify sides,
    # but unlike dedup_minhash_lsh the persist+checkpoint variant
    # MEASURED ~1.7x slower here (smaller batch-side work, same fixed
    # cache cost) — reverted; see OPTIMIZATION_r12.md.
    sh = shingles(docs)
    sig = minhash_signatures(sh)
    rows_per_band = MINHASH_H // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"h{b * rows_per_band + r}").cast(
                                "string"
                            )
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    idx_b = banded.filter(F.col("doc_id") < split).select(
        F.col("doc_id").alias("match_id"), "band", "bucket"
    )
    bat_b = banded.filter(F.col("doc_id") >= split)
    candidates = (
        bat_b.join(idx_b, ["band", "bucket"])
        .select("doc_id", "match_id")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        candidates.alias("c")
        .join(sh.alias("sa"), F.col("c.doc_id") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("c.match_id") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy(
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.match_id").alias("match_id"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("did"), F.col("n").alias("n1")
                )
            ),
            F.col("doc_id") == F.col("did"),
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("mid"), F.col("n").alias("n2")
                )
            ),
            F.col("match_id") == F.col("mid"),
        )
        .withColumn(
            "jraw",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jraw") >= JACCARD_THRESHOLD)
        .select("doc_id", "match_id", F.round("jraw", 6).alias("j"))
    )
    from pyspark.sql import Window

    best = jac.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("j").desc(), F.col("match_id")
            )
        ),
    ).filter(F.col("rn") == 1)
    batch_ids = docs.filter(F.col("doc_id") >= split).select("doc_id")
    return batch_ids.join(best, "doc_id", "left").select(
        "doc_id",
        F.col("match_id").isNull().alias("is_new"),
        F.col("match_id").alias("nearest_corpus_doc"),
        F.col("j").alias("best_jaccard"),
    )


# ------------------------------------------------ dedup funnel report

def _funnel_oracle() -> str:
    tok = (
        "CAST(len(list_filter(string_split_regex(lower(text), "
        f"'{TOKEN_SPLIT_REGEX}'), t -> t <> '')) AS BIGINT)"
    )
    return f"""WITH toks AS (
  SELECT doc_id, {tok} AS nt, md5(text) AS h FROM documents
), exact_keep AS (
  SELECT doc_id, nt,
         doc_id = MIN(doc_id) OVER (PARTITION BY h) AS keep
  FROM toks
), near AS (
  SELECT doc_id, keep FROM (
{_CANONICAL_ORACLE}
  ) q
)
SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS docs_kept,
       CAST(SUM(nt) AS BIGINT) AS tokens_kept
FROM toks
UNION ALL
SELECT 'exact', CAST(COUNT(*) AS BIGINT), CAST(SUM(nt) AS BIGINT)
FROM exact_keep WHERE keep
UNION ALL
SELECT 'neardup', CAST(COUNT(*) AS BIGINT), CAST(SUM(nt) AS BIGINT)
FROM near JOIN toks USING (doc_id) WHERE near.keep"""


@register("dedup_funnel_report", _funnel_oracle())
def dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Dedup funnel**: documents and tokens surviving each dedup
    stage — raw → exact (first holder of the text hash) → near-dup
    canonical (smallest id per MinHash-LSH component) — the one-table
    answer to "how much corpus does dedup actually buy", composed
    from the verified stage operators with their oracles nested
    verbatim. Monotone by construction: an exact duplicate shares
    every shingle with its sibling, so exact-dropped docs are always
    near-dup-dropped too.

    Scale: the near-dup leg dominates (see
    :func:`dedup_neardup_canonical`); the funnel adds one hash window
    and three count aggregates."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX),
        lambda t: t != "",
    )
    base = load_raw(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("nt"),
        F.md5("text").alias("h"),
    )
    exact = base.withColumn(
        "keep",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("h")),
    )
    near = dedup_neardup_canonical(spark, sf_dir).select("doc_id", "keep")
    raw_row = base.agg(
        F.lit("raw").alias("stage"),
        F.count("*").cast("bigint").alias("docs_kept"),
        F.sum("nt").cast("bigint").alias("tokens_kept"),
    )
    exact_row = exact.filter("keep").agg(
        F.lit("exact").alias("stage"),
        F.count("*").cast("bigint").alias("docs_kept"),
        F.sum("nt").cast("bigint").alias("tokens_kept"),
    )
    near_row = (
        near.filter("keep")
        .join(base, "doc_id")
        .agg(
            F.lit("neardup").alias("stage"),
            F.count("*").cast("bigint").alias("docs_kept"),
            F.sum("nt").cast("bigint").alias("tokens_kept"),
        )
    )
    return raw_row.unionByName(exact_row).unionByName(near_row)


# --------------------------------- content-defined chunking dedup

#: Rolling-window width (tokens) for the CDC boundary test.
CDC_W = 4
#: Boundary divisor: a window ends a chunk when its 60-bit digest is
#: ≡ 0 (mod CDC_D), so the expected chunk length is ~CDC_D tokens.
CDC_D = 16

_CDC_HASH_SQL = (
    "CAST(('0x' || substr(md5(array_to_string("
    f"ts[e - {CDC_W - 1}:e], ' ')), 1, 15)) AS BIGINT) % {CDC_D} = 0"
)

_CDC_ORACLE = f"""WITH base AS (
  SELECT doc_id, list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_REGEX}'),
           t -> t <> '') AS ts
  FROM documents
), nonempty AS (
  SELECT doc_id, ts FROM base WHERE len(ts) > 0
), cut AS (
  SELECT doc_id, ts,
         list_sort(list_distinct(
           [CAST(0 AS BIGINT)]
           || list_filter(range(CAST({CDC_W} AS BIGINT),
                                CAST(len(ts) + 1 AS BIGINT)),
                          e -> {_CDC_HASH_SQL})
           || [CAST(len(ts) AS BIGINT)])) AS cuts
  FROM nonempty
), idx AS (
  SELECT doc_id, ts, cuts, unnest(range(1, len(cuts))) AS k FROM cut
), chunks AS (
  SELECT doc_id,
         md5(array_to_string(ts[cuts[k] + 1:cuts[k + 1]], ' ')) AS h,
         cuts[k + 1] - cuts[k] AS ln
  FROM idx
), freq AS (
  SELECT h, COUNT(*) AS n FROM chunks GROUP BY h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(CAST(FLOOR((SUM(CASE WHEN f.n > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
         AS dup_ratio,
       CAST(CAST(FLOOR((CAST(CAST(SUM(ln) AS BIGINT) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS avg_chunk_tokens
FROM chunks c JOIN freq f ON c.h = f.h
GROUP BY doc_id"""


@register("dedup_cdc_chunks", _CDC_ORACLE)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Content-defined-chunking dup ratio** (LBFS/rsync-family CDC —
    the one mainstream dedup family the fixed-stride chunkers can't
    express): a chunk boundary falls after token ``e`` exactly when
    the rolling ``CDC_W``-token window ending at ``e`` hashes to
    ``0 (mod CDC_D)``, so boundaries depend ONLY on local content.
    Insert a sentence at the top of a template document and every
    downstream chunk re-aligns and still matches its duplicate —
    where :func:`dedup_chunk_ratio`'s fixed stride shifts every
    window and reports near-zero overlap (the shift-robustness
    pytest plants exactly that pair). Per doc: chunk count, chunks
    whose exact text recurs anywhere in the corpus, dup ratio, and
    mean chunk length (expected ≈ CDC_D tokens).

    Spark plan: boundary detection is a pure array pipeline inside
    one projection — ``filter(sequence(W, |ts|))`` over the md5 window
    digest (the portable 60-bit scheme of
    :func:`minhash_signatures`), cuts assembled with
    ``array_sort∘array_distinct``, chunk strings sliced per span
    BEFORE the explode so no row ever carries the token array
    alongside a chunk. After the explode it is exactly the
    :func:`dedup_chunk_ratio` shape: md5-keyed frequency shuffle
    (uniform, skew-free), hash-keyed join back, per-doc aggregate —
    at 100 TB the chunk-hash relation is the same incremental state
    table the exact-dedup family maintains. The classic FastCDC
    min/max chunk bounds are a sequential fold over boundary
    candidates (each acceptance depends on the previous) — noted as
    the one refinement this parallel form deliberately omits.

    Reference parity: extends the reference's exact-text dedup
    semantics (no CDC exists there) — extension surface, not a port.
    """
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX),
        lambda t: t != "",
    )
    base = (
        load_raw(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"))
        .filter(F.size("ts") > 0)
    )

    def boundary(e: Column) -> Column:
        win = F.array_join(F.slice(F.col("ts"), e - (CDC_W - 1), CDC_W), " ")
        digest = F.conv(F.substring(F.md5(win), 1, 15), 16, 10).cast("long")
        return digest % CDC_D == 0

    # Guard the candidate range: for docs shorter than CDC_W tokens
    # there are no windows and no boundary candidates (the oracle's
    # range(W, len+1) is empty) — but Spark's sequence(4, size) counts
    # DOWNWARD when size < 4, and the descending candidates reach
    # slice start 0, which is an illegal slice start (crash on any 1-3
    # token doc; caught by the round-8 review's short-doc probe).
    ends = F.when(
        F.size("ts") >= CDC_W,
        F.filter(F.sequence(F.lit(CDC_W), F.size("ts")), boundary),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.array_sort(
        F.array_distinct(
            F.concat(F.array(F.lit(0)), ends, F.array(F.size("ts")))
        )
    )
    with_cuts = base.withColumn("cuts", cuts)

    def span(k: Column) -> Column:
        a = F.element_at(F.col("cuts"), k)
        b = F.element_at(F.col("cuts"), k + 1)
        return F.struct(
            F.md5(F.array_join(F.slice(F.col("ts"), a + 1, b - a), " ")).alias("h"),
            (b - a).cast("long").alias("ln"),
        )

    chunks = with_cuts.select(
        "doc_id",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("cuts") - 1), span)
        ).alias("c"),
    ).select("doc_id", F.col("c.h").alias("h"), F.col("c.ln").alias("ln"))
    freq = chunks.groupBy("h").agg(F.count("*").alias("n"))
    dup = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            ppm_value(F.sum(dup.cast("double")) / F.count("*")).alias(
                "dup_ratio"
            ),
            ppm_value(
                F.sum("ln").cast("double") / F.count("*")
            ).alias("avg_chunk_tokens"),
        )
    )


# ------------------------------------------------ line-level dedup

#: Line geometry for the corpus-frequency boilerplate filter:
#: NON-overlapping LINE_SIZE-token segments (the fixture corpus has no
#: newlines, so "lines" are fixed segments; on real text the split
#: would be '\n' and everything downstream is unchanged).
LINE_SIZE = 16

#: A line is boilerplate when its exact text occurs in at least this
#: many DISTINCT documents.
BOILER_MIN_DOCS = 2


@register(
    "dedup_line_level",
    f"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{{TOKEN_SPLIT_REGEX}}'),
                     t -> t <> '') AS ts
  FROM documents
),
lines AS (
  SELECT doc_id, s,
         array_to_string(ts[s + 1 : s + {LINE_SIZE}], ' ') AS line,
         md5(array_to_string(ts[s + 1 : s + {LINE_SIZE}], ' ')) AS h
  FROM (
    SELECT doc_id, ts,
           unnest(generate_series(0, len(ts) - 1, {LINE_SIZE})) AS s
    FROM toks WHERE len(ts) > 0
  )
),
freq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN nd >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(CAST(FLOOR((SUM(CASE WHEN nd >= {BOILER_MIN_DOCS} THEN 1.0 ELSE 0.0 END) / COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS removed_ratio,
       md5(COALESCE(string_agg(CASE WHEN nd < {BOILER_MIN_DOCS} THEN line END,
                               ' ' ORDER BY s), '')) AS kept_md5
FROM lines l JOIN freq f ON l.h = f.h
GROUP BY doc_id""".replace("{TOKEN_SPLIT_REGEX}", TOKEN_SPLIT_REGEX),
)
def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Line-level dedup** (the CCNet / RefinedWeb boilerplate
    filter): every line whose exact text occurs in >= {BOILER_MIN_DOCS}
    DISTINCT documents is removed from ALL of them — including the
    first occurrence — and each document is rebuilt from its surviving
    lines in order. This is the corpus-frequency REMOVAL policy that
    neither existing scrub expresses: `dedup_span_scrub` keeps the
    corpus-wide first copy of a duplicated span (exact-substring
    dedup), and `dedup_chunk_ratio` only reports a duplication signal
    over overlapping windows. Navigation chrome, cookie banners and
    shared headers appear in every page of a site — removing every
    copy, not all-but-one, is what the production filter does.
    Output is md5-verified: both engines must rebuild byte-identical
    scrubbed token streams.

    Plan: non-overlapping {LINE_SIZE}-token lines in one projection
    (zero shuffle), a distinct-doc count per line hash (uniform md5
    keys — skew-free), a hash join back, and one doc-keyed ordered
    reassembly. At 100 TB the line-frequency relation is the same
    maintained state table as `dedup_incremental_exact`'s, so the
    filter runs incrementally per ingest batch; the reassembly
    shuffle is bounded by document length, never corpus size."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    base = (
        load_raw(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"))
        .filter(F.size("ts") > 0)
    )
    lines = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - 1, F.lit(LINE_SIZE)),
                lambda s: F.array_join(
                    F.slice(F.col("ts"), s + 1, LINE_SIZE), " "
                ),
            )
        ).alias("p", "line"),
    ).withColumn("h", F.md5("line"))
    freq = lines.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    boiler = F.col("nd") >= BOILER_MIN_DOCS
    kept = F.when(~boiler, F.struct("p", "line"))
    return (
        lines.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(boiler.cast("long")).alias("n_removed"),
            ppm_value(
                F.sum(boiler.cast("double")) / F.count("*")
            ).alias("removed_ratio"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept)),
                        lambda x: x["line"],
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
    )
