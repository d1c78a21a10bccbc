#!/usr/bin/env python3
"""Generate graft/SplitOracle.scala: the DuckDB oracle for ts_hash_split.

Spark's xxhash64(BIGINT doc_id) (seed 42) is reimplemented in pure SQL
(scripts/xxh64_sql.py), bucketed pmod 100, and mapped through the
80/10/10 cumulative boundaries — the exact logic of
graft.ops.Sampling.splitColumn.

Usage: python3 scripts/gen_split_oracle.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xxh64_sql import xxh64_long, signed  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src/main/scala/graft/SplitOracle.scala")


def bucket_cte():
    """The single source of the (doc_id, bucket) SQL — every oracle
    that needs the Spark-compatible bucket composes this CTE body, so a
    seed/denominator change can never desynchronize them.
    """
    h = signed(xxh64_long("doc_id", "CAST(42 AS HUGEINT)"))
    return f"""SELECT doc_id,
    (((({h}) % 100) + 100) % 100) AS bucket
  FROM documents"""


def hash_cte():
    """(doc_id, hv) — the RAW signed Spark xxhash64(doc_id) (seed 42);
    the priority key of Sampling.sampleKPerGroup's deterministic
    per-group sample (rank = position in (hv, doc_id) order)."""
    h = signed(xxh64_long("doc_id", "CAST(42 AS HUGEINT)"))
    return f"""SELECT doc_id, ({h}) AS hv
  FROM documents"""


def jl_sign_cte(dim=64, out_dim=32):
    """(j, i, s) — the Johnson-Lindenstrauss sign matrix of
    graft.sim.Projection.jlSigns: s = +1 if xxhash64(j*dim + i, seed 42)
    is even else -1 (parity of the signed hash's low bit)."""
    h = signed(xxh64_long("pid", "CAST(42 AS HUGEINT)"))
    return f"""SELECT CAST(pid // {dim} AS BIGINT) AS j,
    CAST(pid % {dim} AS BIGINT) AS i,
    CASE WHEN ((({h}) % 2) + 2) % 2 = 0 THEN CAST(1.0 AS DOUBLE)
         ELSE CAST(-1.0 AS DOUBLE) END AS s
  FROM (SELECT unnest(generate_series(0, {dim * out_dim - 1})) AS pid)"""


def word_bucket_cte(buckets=64):
    """(w, b) over the documents corpus' distinct \\s+-lowercase
    vocabulary: b = pmod(xxhash64(w, seed 42), buckets) — the hashed
    unigram feature bucket of graft.text.Dsir.wordBucket."""
    from xxh64_sql import xxh64_str
    h = signed(xxh64_str("w", "CAST(42 AS HUGEINT)"))
    return f"""SELECT w, (((({h}) % {buckets}) + {buckets}) % {buckets}) AS b
  FROM (SELECT DISTINCT unnest(list_filter(string_split_regex(
      lower(text), '\\s+'), t -> length(t) > 0)) AS w FROM documents)"""


def vec_hash_cte():
    """(vec_id, hv) over embeddings — the RAW signed Spark
    xxhash64(vec_id) (seed 42); the hash-ranked k-means seeding
    priority (graft.sim.KMeans.seedCentroids: seeds = k smallest
    (hv, vec_id))."""
    h = signed(xxh64_long("vec_id", "CAST(42 AS HUGEINT)"))
    return f"""SELECT vec_id, ({h}) AS hv
  FROM embeddings"""


def cms_bucket_cte(depth=4, width=1024):
    """(w, bs) over the documents corpus' distinct \\s+-lowercase
    vocabulary: bs[i+1] = pmod(xxhash64(w, seed i), width) for
    i in 0..depth-1 — the Count-Min Sketch row buckets of
    graft.sketch.CountMin (signed pmod, exactly Spark's)."""
    from xxh64_sql import xxh64_str_seeds
    multi = xxh64_str_seeds("w", depth)
    sg = signed("xH")
    return f"""SELECT w, list_transform({multi},
      xH -> (((({sg}) % {width}) + {width}) % {width})) AS bs
  FROM (SELECT DISTINCT unnest(list_filter(string_split_regex(
      lower(text), '\\s+'), t -> length(t) > 0)) AS w FROM documents)"""


def key_bucket_cte(table, keycol, depth=4, width=1024):
    """(w, bs) over a table's distinct CAST(key AS VARCHAR) values:
    the Count-Min row buckets of graft.sketch.CountMin when sketching
    a join key column (seeds 0..depth-1, signed pmod — identical to
    cms_bucket_cte's convention)."""
    from xxh64_sql import xxh64_str_seeds
    multi = xxh64_str_seeds("w", depth)
    sg = signed("xH")
    return f"""SELECT w, list_transform({multi},
      xH -> (((({sg}) % {width}) + {width}) % {width})) AS bs
  FROM (SELECT DISTINCT CAST({keycol} AS VARCHAR) AS w FROM {table}
        WHERE {keycol} IS NOT NULL)"""


def event_id_hash_cte():
    """(u) — UNSIGNED Spark xxhash64(event_id) (seed 42) over events;
    the HyperLogLog register hash (graft.sketch.HyperLogLog: idx = top
    8 bits of u, rho from the low 56)."""
    h = xxh64_long("event_id", "CAST(42 AS HUGEINT)")
    return f"""SELECT ({h}) AS u
  FROM events WHERE event_id IS NOT NULL"""


def user_id_hash_cte():
    """(u) — UNSIGNED Spark xxhash64(user_id) (seed 42) over events,
    same role as eventIdHashCte."""
    h = xxh64_long("user_id", "CAST(42 AS HUGEINT)")
    return f"""SELECT ({h}) AS u
  FROM events WHERE user_id IS NOT NULL"""


def event_id_day_hash_cte():
    """(day_us, u) — UNSIGNED Spark xxhash64(event_id) (seed 42) keyed
    by the event's UTC day; the per-window KMV sketch hash
    (graft.streaming.StreamingPipeline.streamingKmvDistinct — the
    1-day window start IS the UTC day under the pinned UTC session)."""
    h = xxh64_long("event_id", "CAST(42 AS HUGEINT)")
    return f"""SELECT epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP))
      AS day_us, ({h}) AS u
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL"""


def event_row_hash_cte():
    """(u, value, user_id) — UNSIGNED Spark xxhash64(event_id) (seed
    42) with the row's predicate columns; the KMV/theta sketch hash
    (graft.sketch.Kmv — sketches are the k smallest distinct u, set
    operations compare retained u below the common theta)."""
    h = xxh64_long("event_id", "CAST(42 AS HUGEINT)")
    return f"""SELECT ({h}) AS u, value, user_id
  FROM events WHERE event_id IS NOT NULL"""


def user_id_day_hash_cte():
    """(day_us, u) — UNSIGNED Spark xxhash64(user_id) (seed 42) with
    the event's UTC day as epoch micros; the per-window HyperLogLog
    register hash (graft.sketch.HyperLogLog.groupedEstimate over
    date_trunc('day', ts))."""
    h = xxh64_long("user_id", "CAST(42 AS HUGEINT)")
    return f"""SELECT epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP))
      AS day_us, ({h}) AS u
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL"""


def ts_hash_split_sql():
    return f"""WITH b AS ({bucket_cte()})
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM b ORDER BY doc_id"""


def salted_bucket_cte(denom=1000000):
    """(doc_id, sbucket) for the SALTED hash family
    (Sampling.hashSample / temperatureMix: xxhash64(lit(0L), id)):
    Spark chains the two children, so the effective seed for the id
    hash is hashLong(0, 42) = 13194218611613725804 (unsigned mod 2^64;
    constant precomputed with the same bit-verified SQL XXH64)."""
    h = signed(xxh64_long("doc_id", "CAST(13194218611613725804 AS HUGEINT)"))
    return f"""SELECT doc_id,
    (((({h}) % {denom}) + {denom}) % {denom}) AS sbucket
  FROM documents"""


def ts_domain_mix_sql(alpha=0.5, target_fraction=0.5, denom=1000000):
    """graft.ops.Sampling.temperatureMix over lang: per-domain counts,
    q_d = n^alpha / sum (folded over domains SORTED BY LANG, matching the
    Spark sort_array fold order), threshold = round(min(1, tf*N*q_d/n)
    * denom), acceptance by the salted bucket. All literals cast to
    DOUBLE (DuckDB decimals would round differently from Spark's double
    literals); the expression tree mirrors temperatureMix's exactly."""
    a = "CAST(0.5 AS DOUBLE)"
    tf = "CAST(0.5 AS DOUBLE)"
    assert alpha == 0.5 and target_fraction == 0.5, "literals are pinned"
    pows = (f"list_reduce(list_prepend(0.0, list_transform("
            f"list(CAST(n AS DOUBLE) ORDER BY lang), x -> pow(x, {a}))), "
            f"(fa, fe) -> fa + fe)")
    tot = (f"list_reduce(list_prepend(0.0, "
           f"list(CAST(n AS DOUBLE) ORDER BY lang)), (fa, fe) -> fa + fe)")
    return f"""WITH sb AS ({salted_bucket_cte(denom)}),
dc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
zt AS (SELECT {pows} AS z, {tot} AS total FROM dc),
mx AS (SELECT lang, CAST(round(least(CAST(1.0 AS DOUBLE),
      (({tf} * zt.total) * (pow(CAST(n AS DOUBLE), {a}) / zt.z)) / n)
    * {denom}) AS BIGINT) AS mix_threshold
  FROM dc, zt)
SELECT d.doc_id, d.lang, mx.mix_threshold
FROM documents d JOIN mx ON mx.lang = d.lang JOIN sb ON sb.doc_id = d.doc_id
WHERE sb.sbucket < mx.mix_threshold
ORDER BY d.doc_id"""


def ts_strat_sample_sql():
    return f"""WITH b AS ({bucket_cte()})
SELECT b.doc_id AS doc_id, lang
FROM b JOIN documents d ON b.doc_id = d.doc_id
WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 30
                         WHEN 'de' THEN 20 WHEN 'fr' THEN 20
                         ELSE 10 END
ORDER BY b.doc_id"""


def esc(sql):
    return sql.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def emit_scala(path):
    src = f"""package graft

/** GENERATED by scripts/gen_split_oracle.py — do not edit by hand.
  *
  * DuckDB oracles built on the pure-SQL Spark xxhash64 (seed 42):
  *  - tsHashSplit: pmod-100 bucketing, 80/10/10 split boundaries
  *    (graft.ops.Sampling.splitColumn).
  *  - tsStratSample: per-lang keep thresholds over the same bucket
  *    (graft.ops.Sampling.stratifiedSample).
  */
object SplitOracle {{
  val tsHashSplit: String = "{esc(ts_hash_split_sql())}"
  val tsStratSample: String = "{esc(ts_strat_sample_sql())}"
  val tsDomainMix: String = "{esc(ts_domain_mix_sql())}"
  /** Reusable CTE body (doc_id, bucket) for composite-pipeline oracles. */
  val bucketCte: String = "{esc(bucket_cte())}"
  /** Reusable CTE body (doc_id, hv): the raw signed xxhash64 priority. */
  val hashCte: String = "{esc(hash_cte())}"
  /** Reusable CTE body (j, i, s): the 32x64 JL sign matrix (the k-dim
    * matrix for any k <= 32 is its j < k prefix). */
  val jlSignCte: String = "{esc(jl_sign_cte())}"
  /** Reusable CTE body (w, b): pmod-64 hashed unigram feature bucket
    * over the documents vocabulary (graft.text.Dsir.wordBucket). */
  val wordBucketCte: String = "{esc(word_bucket_cte())}"
  /** Reusable CTE body (vec_id, hv): the raw signed xxhash64 seeding
    * priority over embeddings (graft.sim.KMeans). */
  val vecHashCte: String = "{esc(vec_hash_cte())}"
  /** Reusable CTE body (w, bs): depth-4 width-1024 Count-Min row
    * buckets over the documents vocabulary (graft.sketch.CountMin,
    * seeds 0..3, signed pmod). */
  val cmsBucketCte: String = "{esc(cms_bucket_cte())}"
  /** Reusable CTE body (u): unsigned xxhash64(event_id) over events
    * (graft.sketch.HyperLogLog). */
  val eventIdHashCte: String = "{esc(event_id_hash_cte())}"
  /** Reusable CTE body (w, bs): Count-Min buckets of lineitem's
    * distinct l_orderkey strings (graft.sketch.CountMin join-size
    * estimate). */
  val lineitemKeyBucketCte: String =
    "{esc(key_bucket_cte('lineitem', 'l_orderkey'))}"
  /** Reusable CTE body (w, bs): Count-Min buckets of orders' distinct
    * o_orderkey strings. */
  val ordersKeyBucketCte: String =
    "{esc(key_bucket_cte('orders', 'o_orderkey'))}"
  /** Reusable CTE body (u): unsigned xxhash64(user_id) over events
    * (graft.sketch.HyperLogLog). */
  val userIdHashCte: String = "{esc(user_id_hash_cte())}"
  /** Reusable CTE body (day_us, u): unsigned xxhash64(user_id) keyed
    * by the event's UTC day (graft.sketch.HyperLogLog.groupedEstimate). */
  val userIdDayHashCte: String = "{esc(user_id_day_hash_cte())}"
  /** Reusable CTE body (u, value, user_id): unsigned xxhash64(event_id)
    * with the row's predicate columns (graft.sketch.Kmv). */
  val eventRowHashCte: String = "{esc(event_row_hash_cte())}"
  /** Reusable CTE body (day_us, u): unsigned xxhash64(event_id) keyed
    * by the event's UTC day (StreamingPipeline.streamingKmvDistinct). */
  val eventIdDayHashCte: String = "{esc(event_id_day_hash_cte())}"
}}
"""
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    emit_scala(OUT)
