#!/usr/bin/env python3
"""Generate DuckDB oracle SQL for the hash-driven dedup queries
(dd_minhash, dd_simhash, dd_drop_near_dups, dd_stream_neardup_batch)
and emit them as a Scala
source (graft.DedupOracles) consumed by SparkEntry.oracleSql.

The hard part — Spark's seeded xxhash64, which drives candidate
generation — is reimplemented as pure SQL (scripts/xxh64_sql.py,
bit-verified against Spark vectors). Everything else mirrors
graft.dedup.Dedup semantics exactly:
  - minhash: distinct 3-gram shingles -> per-seed signed min of
    xxh64(shingle, seed 0..31) -> 16 bands of 2 rows -> buckets capped at
    64 sorted members -> pair dedup -> exact Jaccard >= 0.5
  - simhash: per-token xxh64(tok, 42) -> per-bit majority -> 4x16-bit
    chunk buckets (cap 64) -> hamming(xor) <= 6
  - drop_near_dups: the minhash pair list -> connected components
    (recursive-CTE transitive closure; clusters are tiny) -> keep min id
  - stream_neardup_batch: the streaming operator's batch twin — 8 bands
    of 4 rows, arrival order = id, row_number ring bound (<= 64),
    matching-slots/32 signature estimate >= 0.5

Validate against a Spark Verify dump, then emit:
    python3 scripts/gen_dedup_oracles.py /root/testdata/sf0.01 /tmp/verify_out01
"""
import sys

sys.path.insert(0, "scripts")
from xxh64_sql import xxh64_long, xxh64_str, xxh64_str_seeds, signed

TOKS = r"""
toks AS (
  SELECT doc_id AS id,
    list_filter(string_split_regex(trim(regexp_replace(lower(text),
      '[^a-z0-9\s]', '', 'g')), '\s+'), t -> length(t) > 0) AS tk
  FROM documents)"""

# distinct word 3-gram shingles over canonical tokens (WordShingles n=3)
SHINGLES = r"""
sh AS (
  SELECT id, list_distinct(CASE WHEN len(tk) >= 3 THEN
    list_transform(tk[1:len(tk)-2], (x, i) -> array_to_string(tk[i:i+2], ' '))
    ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM toks),
shf AS (SELECT * FROM sh WHERE len(sh) > 0)"""


def sigl_ctes():
    """CTE chain from documents to per-doc 32-slot minhash signatures
    (`sigl`) — shared by the batch LSH oracle and the streaming-twin
    oracle."""
    multi = xxh64_str_seeds("g", 32)
    sig_signed = signed("mh_u")
    return f"""{TOKS},{SHINGLES},
posting AS (SELECT id, unnest(sh) AS g FROM shf),
gs AS (SELECT DISTINCT g FROM posting),
ghash AS (SELECT g, {multi} AS hl FROM gs),
sigs AS (SELECT id, sd, min({sig_signed}) AS mh
  FROM (SELECT p.id, unnest(range(0, 32)) AS sd, unnest(h.hl) AS mh_u
        FROM posting p JOIN ghash h USING (g))
  GROUP BY id, sd),
sigl AS MATERIALIZED (SELECT id, list(mh ORDER BY sd) AS sig
  FROM sigs GROUP BY id)"""


def dd_stream_sql(horizon_s=3600):
    """Oracle for the STREAMING near-dup operator's batch twin
    (graft.streaming.StreamingNearDup.nearDupCandidates on a batch
    frame): 8 bands x 4 rows, arrival order = id (ts derived from it:
    ts = timestamp_seconds(doc_id), so an event-time gap in seconds IS
    the id gap), per-bucket bounded ring of 64 (pair emits iff fewer
    than 64 docs arrived between the partners in that bucket) AND the
    partners' event times within the horizon (match-time enforcement,
    default '1 hour' = 3600 s), verification by signature estimate
    (matching slots / 32) >= 0.5."""
    return f"""WITH {sigl_ctes()},
banded8 AS MATERIALIZED (SELECT id, sig, b, sig[4*b+1:4*b+4] AS slc
  FROM sigl, range(8) t(b)),
ranked AS (SELECT id, b, slc,
    row_number() OVER (PARTITION BY b, slc ORDER BY id) AS rn
  FROM banded8),
cand AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b
  FROM ranked a JOIN ranked b2 ON a.b = b2.b AND a.slc = b2.slc
  WHERE a.rn < b2.rn AND b2.rn - a.rn <= 64
    AND b2.id - a.id <= {horizon_s}),
est AS (SELECT id_a, id_b,
    len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0
      AS est_jaccard
  FROM cand JOIN sigl sa ON cand.id_a = sa.id
            JOIN sigl sb ON cand.id_b = sb.id)
SELECT id_a, id_b, est_jaccard FROM est
WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b"""


def minhash_pairs_ctes():
    """CTE chain from documents to minhash near-dup `mh_pairs`
    (id_a, id_b, jaccard >= 0.5)."""
    return f"""{sigl_ctes()},
banded AS (SELECT id, b, sig[2*b+1:2*b+2] AS slc
  FROM sigl, range(16) t(b)),
buckets AS (SELECT b, slc, list_sort(list(id))[1:64] AS members
  FROM banded GROUP BY b, slc HAVING count(*) > 1),
cand AS (SELECT DISTINCT m1 AS id_a, m2 AS id_b
  FROM buckets, unnest(members) u1(m1), unnest(members) u2(m2)
  WHERE m1 < m2),
mh_pairs AS (SELECT id_a, id_b,
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
  FROM cand JOIN shf a ON cand.id_a = a.id JOIN shf b ON cand.id_b = b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5)"""


def dd_minhash_sql():
    return (f"WITH {minhash_pairs_ctes()}\n"
            "SELECT id_a, id_b, jaccard FROM mh_pairs ORDER BY id_a, id_b")


def dd_incremental_sql():
    """Oracle for the incremental dedup operator
    (Dedup.minhashNearDupsAgainst): the batch partition (id % 4 == 0)
    probes the corpus partition's (id % 4 != 0) banded signature index —
    16 bands of 2 rows, corpus bucket members capped at the 64 smallest
    ids, SINGLE-member buckets kept (a lone corpus doc is a valid
    partner), verification by signature agreement (matching slots / 32)
    >= 0.5."""
    return f"""WITH {sigl_ctes()},
corpus AS (SELECT * FROM sigl WHERE id % 4 != 0),
batch AS (SELECT * FROM sigl WHERE id % 4 = 0),
cbanded AS (SELECT id, b, sig[2*b+1:2*b+2] AS slc FROM corpus, range(16) t(b)),
bbanded AS (SELECT id, b, sig[2*b+1:2*b+2] AS slc FROM batch, range(16) t(b)),
buckets AS (SELECT b, slc, list_sort(list(id))[1:64] AS members
  FROM cbanded GROUP BY b, slc),
cand AS (SELECT DISTINCT bb.id AS batch_id, m AS corpus_id
  FROM bbanded bb JOIN buckets USING (b, slc), unnest(members) u(m)),
est AS (SELECT batch_id, corpus_id,
    len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0
      AS est_jaccard
  FROM cand JOIN sigl sa ON cand.batch_id = sa.id
            JOIN sigl sb ON cand.corpus_id = sb.id)
SELECT batch_id, corpus_id, est_jaccard FROM est
WHERE est_jaccard >= 0.5 ORDER BY batch_id, corpus_id"""


def dd_incremental_verified_sql():
    """Oracle for the exact-verified incremental probe
    (Dedup.minhashNearDupsAgainstVerified): same banded probe as
    dd_incremental_minhash, threshold 3/32 with epsilon 2/32 (chosen so
    this corpus actually exercises the borderline band: the spurious
    band-collision pairs sit at est 2/32-3/32 with true Jaccard ~0.01).
    Pairs with est >= thr+eps pass on the estimate (jaccard = est);
    pairs with est in [thr-eps, thr+eps) are re-verified by exact
    shingle-set Jaccard and kept iff exact >= thr."""
    return f"""WITH {sigl_ctes()},
corpus AS (SELECT * FROM sigl WHERE id % 4 != 0),
batch AS (SELECT * FROM sigl WHERE id % 4 = 0),
cbanded AS (SELECT id, b, sig[2*b+1:2*b+2] AS slc FROM corpus, range(16) t(b)),
bbanded AS (SELECT id, b, sig[2*b+1:2*b+2] AS slc FROM batch, range(16) t(b)),
buckets AS (SELECT b, slc, list_sort(list(id))[1:64] AS members
  FROM cbanded GROUP BY b, slc),
cand AS (SELECT DISTINCT bb.id AS batch_id, m AS corpus_id
  FROM bbanded bb JOIN buckets USING (b, slc), unnest(members) u(m)),
est AS (SELECT batch_id, corpus_id,
    len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0
      AS est_jaccard
  FROM cand JOIN sigl sa ON cand.batch_id = sa.id
            JOIN sigl sb ON cand.corpus_id = sb.id),
verified AS (SELECT e.batch_id, e.corpus_id, e.est_jaccard,
    CASE WHEN e.est_jaccard >= 0.15625 THEN e.est_jaccard
         ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sh, b.sh))) END AS jaccard
  FROM est e JOIN shf a ON e.batch_id = a.id
             JOIN shf b ON e.corpus_id = b.id
  WHERE e.est_jaccard >= 0.03125)
SELECT batch_id, corpus_id, est_jaccard, jaccard FROM verified
WHERE jaccard >= 0.09375 ORDER BY batch_id, corpus_id"""


def dd_simhash_sql():
    tok_hash = xxh64_str("tok", "CAST(42 AS HUGEINT)")
    return f"""WITH {TOKS},
tokpost AS (SELECT id, unnest(tk) AS tok FROM toks),
dtok AS (SELECT DISTINCT tok FROM tokpost),
th AS (SELECT tok, CAST({tok_hash} AS UBIGINT) AS h FROM dtok),
bits AS (SELECT id, b, sum(CAST((CAST(h AS HUGEINT)
      // CAST(power(2, b) AS HUGEINT)) % 2 AS BIGINT)) AS cnt,
    count(*) AS n
  FROM tokpost JOIN th USING (tok), range(64) t(b)
  GROUP BY id, b),
fps0 AS (SELECT id, sum(CASE WHEN 2*cnt > n
    THEN CAST(power(2, b) AS HUGEINT) ELSE 0 END) AS fp_u
  FROM bits GROUP BY id),
fps AS (SELECT t.id, CAST(coalesce(f.fp_u, 0) AS HUGEINT) AS fp_u
  FROM toks t LEFT JOIN fps0 f ON t.id = f.id),
chunked AS (SELECT id, fp_u, c,
    (fp_u // CAST(power(65536, c) AS HUGEINT)) % 65536 AS cv
  FROM fps, range(4) t(c)),
buckets AS (SELECT c, cv, list_sort(list({{'id': id, 'fp_u': fp_u}}))[1:64] AS members
  FROM chunked GROUP BY c, cv HAVING count(*) > 1),
cand AS (SELECT DISTINCT m1.id AS id_a, m1.fp_u AS fpa,
    m2.id AS id_b, m2.fp_u AS fpb
  FROM buckets, unnest(members) u1(m1), unnest(members) u2(m2)
  WHERE m1.id < m2.id),
ham AS (SELECT id_a, id_b, bit_count(xor(CAST(fpa AS UBIGINT),
    CAST(fpb AS UBIGINT))) AS hamming FROM cand)
SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
FROM ham WHERE hamming <= 6 ORDER BY id_a, id_b"""


def dd_drop_sql():
    return f"""WITH RECURSIVE {minhash_pairs_ctes()},
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM mh_pairs
  UNION SELECT id_b, id_a FROM mh_pairs),
reach(u, v) AS (SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS id, least(u, min(v)) AS component
  FROM reach GROUP BY u)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE component < id)
ORDER BY doc_id"""


def dd_keep_best_sql():
    """Quality-priority survivor selection (Dedup.dropNearDupsKeepBest):
    the same transitive-closure components as dd_drop_near_dups, but the
    survivor per component is the member maximizing n_chars (ties to the
    smallest id) instead of the minimum id."""
    return f"""WITH RECURSIVE {minhash_pairs_ctes()},
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM mh_pairs
  UNION SELECT id_b, id_a FROM mh_pairs),
reach(u, v) AS (SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS id, least(u, min(v)) AS component
  FROM reach GROUP BY u),
best AS (SELECT id FROM (
    SELECT c.id, row_number() OVER (PARTITION BY c.component
      ORDER BY d.n_chars DESC, c.id) AS rn
    FROM comp c JOIN documents d ON d.doc_id = c.id)
  WHERE rn = 1)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp) OR doc_id IN (SELECT id FROM best)
ORDER BY doc_id"""


def dd_group_split_sql():
    """Leakage-safe group-aware split (Sampling.groupAwareSplit over the
    near-dup component id): the transitive-closure components of the
    minhash pair list label each doc with its cluster's min member id
    (singletons are their own group); the 80/10/10 split label is then
    the seed-42 xxhash64 of the COMPONENT pmod 100 — every cluster
    member lands in the same split (the eval-decontamination
    discipline; splitting by row id would leak near-identical text
    across train/test)."""
    h = signed(xxh64_long("component", "CAST(42 AS HUGEINT)"))
    return f"""WITH RECURSIVE {minhash_pairs_ctes()},
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM mh_pairs
  UNION SELECT id_b, id_a FROM mh_pairs),
reach(u, v) AS (SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS id, least(u, min(v)) AS component
  FROM reach GROUP BY u),
wc AS (SELECT doc_id, COALESCE(c.component, doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
gb AS (SELECT doc_id, component,
    (((({h}) % 100) + 100) % 100) AS bucket
  FROM wc)
SELECT doc_id, CAST(component AS BIGINT) AS component,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM gb ORDER BY doc_id"""


def validate(sf_dir, verify_dir, allow_missing=()):
    import glob

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ok = True
    for name, sql in [("dd_minhash", dd_minhash_sql()),
                      ("dd_simhash", dd_simhash_sql()),
                      ("dd_drop_near_dups", dd_drop_sql()),
                      ("dd_keep_best", dd_keep_best_sql()),
                      ("dd_incremental_minhash", dd_incremental_sql()),
                      ("dd_incremental_verified", dd_incremental_verified_sql()),
                      ("dd_stream_neardup_batch", dd_stream_sql()),
                      ("dd_group_split", dd_group_split_sql())]:
        import time
        if not glob.glob(f"{verify_dir}/{name}/*.parquet"):
            # a freshly-added query has no dump yet on the first generator
            # run (the Scala oracle must exist before Verify can emit it).
            # Skipping is allowed ONLY for queries explicitly named via
            # --allow-missing — a missing dump for an established query
            # means the Verify run is broken/stale and must FAIL the
            # validation, not silently weaken it.
            if name in allow_missing:
                print(f"{name}: SKIPPED (no dump; explicitly allowed)")
            else:
                ok = False
                print(f"{name}: FAILED (no dump under {verify_dir}/{name}; "
                      "pass --allow-missing=<name> only for a new query)")
            continue
        t0 = time.time()
        d = con.sql(sql).df()
        s = pd.concat([pd.read_parquet(f) for f in
                       sorted(glob.glob(f"{verify_dir}/{name}/*.parquet"))])
        s = s[sorted(s.columns)].reset_index(drop=True)
        d = d[sorted(d.columns)].reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(s, d, check_exact=True)
            print(f"{name}: EXACT MATCH ({len(s)} rows, {time.time()-t0:.1f}s)")
        except AssertionError as e:
            ok = False
            print(f"{name}: MISMATCH {str(e)[:300]}")
            print(" spark:", s.head(5).to_dict("records"))
            print(" duck :", d.head(5).to_dict("records"))
    return ok


def emit_scala(path):
    def esc(sql):
        return sql.replace("\\", "\\\\").replace('"', '\\"').replace(
            "\n", "\\n")
    body = "\n\n".join(
        f'  val {name}: String = "{esc(sql)}"'
        for name, sql in [("ddMinhash", dd_minhash_sql()),
                          ("ddSimhash", dd_simhash_sql()),
                          ("ddDropNearDups", dd_drop_sql()),
                          ("ddKeepBest", dd_keep_best_sql()),
                          ("ddIncrementalMinhash", dd_incremental_sql()),
                          ("ddIncrementalVerified",
                           dd_incremental_verified_sql()),
                          ("ddStreamNearDupBatch", dd_stream_sql()),
                          ("ddGroupSplit", dd_group_split_sql())])
    src = f"""package graft

/** GENERATED by scripts/gen_dedup_oracles.py — do not edit by hand.
  *
  * DuckDB oracle SQL for the hash-driven dedup queries. Spark's seeded
  * xxhash64 (the candidate generator) is reimplemented in pure SQL
  * (HUGEINT mod-2^64 arithmetic; bit-verified against Spark vectors from
  * Test/runMain graft.HashVectors), so the DuckDB side reproduces
  * signatures, LSH buckets, and survivor sets of graft.dedup.Dedup
  * exactly.
  */
object DedupOracles {{
{body}
}}
"""
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    allow = ()
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--allow-missing="):
            allow = tuple(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    verify_dir = args[1] if len(args) > 1 else "/tmp/verify_out01"
    if validate(sf_dir, verify_dir, allow):
        emit_scala("src/main/scala/graft/DedupOracles.scala")
    else:
        sys.exit(1)
