#!/usr/bin/env python3
"""Generate DuckDB oracle SQL for the ANN similarity queries
(sim_lsh_topk, sim_ivf_topk) and emit graft.SimOracles.

Both queries are deterministic given the implementation's hash-derived
randomness (LSH hyperplanes: xxhash64(plane, dim); IVF centroid sample:
the nCentroids smallest xxhash64(vec_id)); with scripts/xxh64_sql.py
those hashes are reproducible in DuckDB, and every float reduction
(projection, L2, dot, norm) folds left-to-right exactly like Spark's
aggregate/zip_with HOFs, so cosines are bit-equal.

Validate against a Spark Verify dump, then emit:
    python3 scripts/gen_sim_oracles.py /root/testdata/sf0.01 /tmp/verify_out01
"""
import sys

sys.path.insert(0, "scripts")
from xxh64_sql import xxh64_int, xxh64_long, let, signed

LMAX = "CAST(9223372036854775807 AS DOUBLE)"


def fold0(items):
    """Left fold from 0.0 — Spark aggregate(…, lit(0.0), (a,v) -> a+v)."""
    return f"list_reduce(list_prepend(0.0, {items}), (fa, fe) -> fa + fe)"


def cosine(a, b):
    dot = fold0(f"list_transform({a}, (cx, ci) -> cx * ({b})[ci])")
    na = f"sqrt({fold0(f'list_transform({a}, cx -> cx * cx)')})"
    nb = f"sqrt({fold0(f'list_transform({b}, cx -> cx * cx)')})"
    return f"({dot}) / (({na}) * ({nb}))"


def plane_matrix(planes):
    """4 x dim matrix of scaled hyperplane components, hashed ONCE per
    (plane, dim) in a one-row CTE: component = signed(xxh64(i, seed_p))
    as double / Long.MaxValue, seed_p = xxh64_int(p, 42)."""
    comp = (f"CAST({signed(xxh64_int('(pi - 1)', xxh64_int('pp', '42')))}"
            f" AS DOUBLE) / {LMAX}")
    return (f"list_transform(range(0, {planes}), pp -> "
            f"list_transform(range(1, pdim + 1), pi -> {comp}))")


def bucket(vec, planes):
    proj = fold0(f"list_transform({vec}, (bx, bi) -> bx * pm[bp + 1][bi])")
    return (f"list_sum(list_transform(range(0, {planes}), bp -> "
            f"CASE WHEN ({proj}) >= 0 THEN CAST(power(2, bp) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END))")


def bucket_t(vec, planes):
    """Per-table bucket: table tt uses plane rows tt*planes .. tt*planes+planes-1
    of the shared plane matrix (mirrors Similarity.lshTableBucket)."""
    proj = fold0(f"list_transform({vec}, (bx, bi) -> "
                 f"bx * pm[tt * {planes} + bp + 1][bi])")
    return (f"list_sum(list_transform(range(0, {planes}), bp -> "
            f"CASE WHEN ({proj}) >= 0 THEN CAST(power(2, bp) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END))")


def sim_lsh_sql(planes=4, tables=16, k=5):
    """Multi-table (amplified) LSH: candidate when bucket-equal in ANY of
    the `tables` hash tables; distinct candidates scored exactly."""
    return f"""WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pmt AS MATERIALIZED (SELECT {let("pdim", "(SELECT max(len(v)) FROM emb)",
                    plane_matrix(planes * tables))} AS pm),
bk AS MATERIALIZED (SELECT vec_id, v, tt, {bucket_t("v", planes)} AS bucket
  FROM emb, pmt, range(0, {tables}) tr(tt)),
qk AS (SELECT vec_id AS query_id, tt, bucket FROM bk WHERE vec_id < 8),
cand AS (SELECT DISTINCT q.query_id, c.vec_id
  FROM bk c JOIN qk q ON c.tt = q.tt AND c.bucket = q.bucket
  WHERE c.vec_id <> q.query_id),
scored AS (SELECT cand.query_id, cand.vec_id,
    {cosine("c.v", "q.v")} AS cosine
  FROM cand JOIN emb c ON c.vec_id = cand.vec_id
    JOIN emb q ON q.vec_id = cand.query_id),
r AS (SELECT query_id, vec_id, cosine, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 6) AS cos6, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k} ORDER BY query_id, rank"""


def l2f(v, c):
    """Squared L2 folded left-to-right from 0.0 over `v`'s indices —
    Similarity.l2 / the NearestCells kernel order."""
    return fold0(
        f"list_transform({v}, (dx, di) -> (dx - ({c})[di]) * (dx - ({c})[di]))")


def quantizer_prefix(n_centroids=16, refine_sample=256, lloyd_iters=2,
                     emb_where="", with_assigned=True,
                     emb_select=None, samp_table="emb"):
    """Shared CTE chain replicating Similarity.ivfCentroids + the corpus
    cell assignment (`assigned`: vec_id, v, cell):
    (1) samp — the refine_sample corpus rows with the smallest
        (xxh64(vec_id), vec_id), in that order;
    (2) s1..sN — farthest-point seed selection over samp (each step
        appends the samp row maximizing its min squared distance to the
        seeds so far, ties to the earliest row);
    (3) cl1..clL — Lloyd passes: assign each samp row to its nearest
        centroid (ties to the lowest cell), then per-position means
        accumulated in samp order (fold from 0.0, one divide); an empty
        cell keeps its previous centroid.
    Every float reduction folds exactly like the Scala driver loop, so
    the refined centroids — and the cell assignments and everything
    downstream — are bit-equal. Used by both sim_ivf_sql (probe join)
    and dd_semantic_sql (cell-scoped near-dup pairs)."""
    idh = signed(xxh64_long("vec_id", "42"))
    l2 = fold0("list_transform(v, (dx, di) -> (dx - cv[di]) * (dx - cv[di]))")
    mind = (f"list_reduce(list_transform(sp.seeds, sd -> {l2f('smp.v', 'sd')}),"
            " (ma, mb) -> least(ma, mb))")
    # every step CTE is MATERIALIZED: s{k} references s{k-1} twice, and
    # an inlined (non-materialized) chain would re-evaluate each level
    # per reference — 2^15 evaluations of s1 by the last seed
    fps = ["s1 AS MATERIALIZED (SELECT [(SELECT v FROM samp WHERE srn = 1)]"
           " AS seeds)"]
    for s in range(2, n_centroids + 1):
        fps.append(
            f"s{s} AS MATERIALIZED (SELECT list_append(sp.seeds, "
            f"(SELECT smp.v FROM samp smp, s{s-1} sp "
            f"ORDER BY {mind} DESC, smp.srn LIMIT 1)) AS seeds "
            f"FROM s{s-1} sp)")
    lloyd = [f"cl0 AS MATERIALIZED (SELECT seeds AS cents "
             f"FROM s{n_centroids})"]
    for it in range(1, lloyd_iters + 1):
        dl = f"list_transform(cp.cents, cc -> {l2f('smp.v', 'cc')})"
        mean = ("list_transform(range(1, len(vs[1]) + 1), ci -> "
                + fold0("list_transform(vs, sv -> sv[ci])") + " / n)")
        lloyd.append(
            f"as{it} AS MATERIALIZED (SELECT smp.srn, smp.v, "
            f"list_position({dl}, list_aggregate({dl}, 'min')) - 1 AS cell "
            f"FROM samp smp, cl{it-1} cp)")
        lloyd.append(
            f"mn{it} AS MATERIALIZED (SELECT cell, "
            f"list(v ORDER BY srn) AS vs, "
            f"count(*) AS n FROM as{it} GROUP BY cell)")
        lloyd.append(
            f"cl{it} AS MATERIALIZED (SELECT list(cv ORDER BY cell) AS cents "
            f"FROM ("
            f"SELECT mc AS cell, COALESCE(m.mv, cp.cents[mc + 1]) AS cv "
            f"FROM cl{it-1} cp CROSS JOIN range(0, {n_centroids}) t(mc) "
            f"LEFT JOIN (SELECT cell, {mean} AS mv FROM mn{it}) m "
            f"ON m.cell = mc))")
    quantizer = ",\n".join(fps + lloyd)
    # returned WITHOUT the leading "WITH" so callers can choose plain
    # WITH (probe/pair queries) or WITH RECURSIVE (the prune endpoint's
    # transitive closure)
    tail = "" if not with_assigned else f""",
cdist AS MATERIALIZED (SELECT e.vec_id, e.v, c.cell, {l2} AS d
  FROM emb e CROSS JOIN cent c),
assigned AS (SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell, row_number() OVER (
      PARTITION BY vec_id ORDER BY d, cell) AS rn FROM cdist)
  WHERE rn = 1)"""
    emb_sql = emb_select or ("SELECT vec_id, CAST(embedding AS "
                             f"DOUBLE[]) AS v FROM embeddings{emb_where}")
    return f"""emb AS (
  {emb_sql}),
samp AS MATERIALIZED (SELECT v,
    row_number() OVER (ORDER BY idh, vec_id) AS srn
  FROM (SELECT v, vec_id, {idh} AS idh FROM {samp_table})
  QUALIFY row_number() OVER (ORDER BY idh, vec_id) <= {refine_sample}),
{quantizer},
cent AS MATERIALIZED (SELECT mc AS cell, cents[mc + 1] AS cv
  FROM cl{lloyd_iters} CROSS JOIN range(0, {n_centroids}) t(mc)){tail}"""


def pq_prefix(m=8, k_per_sub=16, dim=64, refine_sample=256,
              lloyd_iters=2, include_emb=True, residual=False):
    """Namespaced per-subspace quantizer chains (graft.sim.Pq): ONE
    shared hash-deterministic sample (full vectors), then for each
    subspace j a farthest-point + Lloyd chain over the v[lo:hi] slices
    — the same pinned folds as quantizer_prefix — ending in p{j}cl{L}
    (the codebook list), plus `codes` (vec_id, v, codes[]) assigning
    every corpus row its per-subspace nearest codebook entry.
    Returns (cte_body, [codebook CTE names], subdim).

    With residual=True (graft.sim.Pq.pqCodebooksResidual /
    ivfAdcIndex — true IVFADC), the quantizer_prefix CTEs (samp, cent,
    assigned) must already be in scope: the sample rows are replaced by
    their coarse residuals x − centroid(cell(x)) before slicing
    (nearest cell by (squared-L2 asc, cell asc), the NearestCells
    order), the chains train on those, and `codes` encodes each corpus
    row's residual — emitting (vec_id, cell, codes)."""
    sub = dim // m
    idh = signed(xxh64_long("vec_id", "42"))
    emb_cte = ("""emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
""" if include_emb and not residual else "")
    if residual:
        # sample residuals: assign each samp row to its nearest coarse
        # centroid (same fold + tie-break as the kernel), subtract
        samp0 = f"""sdist AS MATERIALIZED (SELECT s.srn, s.v, c.cell,
    {l2f('s.v', 'c.cv')} AS d
  FROM samp s CROSS JOIN cent c),
samp0 AS MATERIALIZED (SELECT sa.srn,
    list_transform(sa.v, (rx, ri) -> rx - ct.cv[ri]) AS v
  FROM (SELECT srn, v, cell FROM (
      SELECT srn, v, cell, row_number() OVER (
        PARTITION BY srn ORDER BY d, cell) AS rn FROM sdist)
    WHERE rn = 1) sa
  JOIN cent ct USING (cell))"""
    else:
        samp0 = f"""samp0 AS MATERIALIZED (SELECT v,
    row_number() OVER (ORDER BY idh, vec_id) AS srn
  FROM (SELECT v, vec_id, {idh} AS idh FROM emb)
  QUALIFY row_number() OVER (ORDER BY idh, vec_id) <= {refine_sample})"""
    parts = [emb_cte + samp0]
    mind = (f"list_reduce(list_transform(sp.seeds, sd -> "
            f"{l2f('smp.v', 'sd')}), (ma, mb) -> least(ma, mb))")
    cents = []
    for j in range(m):
        ns = f"p{j}"
        lo, hi = j * sub + 1, (j + 1) * sub
        parts.append(f"{ns}samp AS MATERIALIZED "
                     f"(SELECT v[{lo}:{hi}] AS v, srn FROM samp0)")
        parts.append(f"{ns}s1 AS MATERIALIZED (SELECT "
                     f"[(SELECT v FROM {ns}samp WHERE srn = 1)] AS seeds)")
        for s in range(2, k_per_sub + 1):
            parts.append(
                f"{ns}s{s} AS MATERIALIZED (SELECT list_append(sp.seeds, "
                f"(SELECT smp.v FROM {ns}samp smp, {ns}s{s-1} sp "
                f"ORDER BY {mind} DESC, smp.srn LIMIT 1)) AS seeds "
                f"FROM {ns}s{s-1} sp)")
        parts.append(f"{ns}cl0 AS MATERIALIZED (SELECT seeds AS cents "
                     f"FROM {ns}s{k_per_sub})")
        for it in range(1, lloyd_iters + 1):
            dl = (f"list_transform(cp.cents, cc -> "
                  f"{l2f('smp.v', 'cc')})")
            mean = ("list_transform(range(1, len(vs[1]) + 1), ci -> "
                    + fold0("list_transform(vs, sv -> sv[ci])") + " / n)")
            parts.append(
                f"{ns}as{it} AS MATERIALIZED (SELECT smp.srn, smp.v, "
                f"list_position({dl}, list_aggregate({dl}, 'min')) - 1 "
                f"AS cell FROM {ns}samp smp, {ns}cl{it-1} cp)")
            parts.append(
                f"{ns}mn{it} AS MATERIALIZED (SELECT cell, "
                f"list(v ORDER BY srn) AS vs, count(*) AS n "
                f"FROM {ns}as{it} GROUP BY cell)")
            parts.append(
                f"{ns}cl{it} AS MATERIALIZED (SELECT "
                f"list(cv ORDER BY cell) AS cents FROM ("
                f"SELECT mc AS cell, COALESCE(mm.mv, cp.cents[mc + 1]) "
                f"AS cv FROM {ns}cl{it-1} cp "
                f"CROSS JOIN range(0, {k_per_sub}) t(mc) "
                f"LEFT JOIN (SELECT cell, {mean} AS mv FROM {ns}mn{it}) "
                f"mm ON mm.cell = mc))")
        cents.append(f"{ns}cl{lloyd_iters}")
    froms = ", ".join(f"{cents[j]} cp{j}" for j in range(m))
    code_exprs = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        dl = (f"list_transform(cp{j}.cents, cc -> "
              f"{l2f(f'e.v[{lo}:{hi}]', 'cc')})")
        code_exprs.append(
            f"list_position({dl}, list_aggregate({dl}, 'min')) - 1")
    codes_list = "[" + ", ".join(code_exprs) + "]"
    if residual:
        # corpus residuals ride `assigned` (vec_id, v, cell) + cent;
        # codes carries the cell so the probe never re-joins assigned
        parts.append(
            "rv AS MATERIALIZED (SELECT a.vec_id, a.cell, "
            "list_transform(a.v, (rx, ri) -> rx - ct.cv[ri]) AS v "
            "FROM assigned a JOIN cent ct USING (cell))")
        parts.append(
            f"codes AS MATERIALIZED (SELECT e.vec_id, e.cell, "
            f"{codes_list} AS codes FROM rv e, {froms})")
    else:
        parts.append(
            f"codes AS MATERIALIZED (SELECT e.vec_id, e.v, "
            f"{codes_list} AS codes FROM emb e, {froms})")
    return ",\n".join(parts), cents, sub


def sim_pq_encode_sql(m=8, k_per_sub=16, dim=64, refine_sample=256,
                      lloyd_iters=2):
    """graft.sim.Pq.pqEncode exploded to (vec_id, subspace, code)."""
    prefix, _, _ = pq_prefix(m, k_per_sub, dim, refine_sample,
                             lloyd_iters)
    return f"""WITH {prefix}
SELECT vec_id, CAST(u.j AS BIGINT) AS subspace,
  CAST(codes[u.j + 1] AS BIGINT) AS code
FROM codes, unnest(range(0, {m})) AS u(j)
ORDER BY vec_id, subspace"""


def sim_pq_topk_sql(m=8, k_per_sub=16, dim=64, k=5, over_fetch=8,
                    refine_sample=256, lloyd_iters=2):
    """graft.sim.Pq.pqTopK: ADC-cosine coarse top-(k*over_fetch) over
    the codes (ip and |recon| read the codebook lists exactly like the
    engine's literals — subspace partials summed ascending), exact
    rerank of the candidates, both rankings (cosine DESC, vec_id)."""
    prefix, cents, sub = pq_prefix(m, k_per_sub, dim, refine_sample,
                                   lloyd_iters)
    froms = ", ".join(f"{cents[j]} cp{j}" for j in range(m))
    dot_terms, rn_terms = [], []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        entry = f"cp{j}.cents[c.codes[{j + 1}] + 1]"
        dot_terms.append("(" + fold0(
            f"list_transform(q.qv[{lo}:{hi}], "
            f"(ax, ai) -> ax * ({entry})[ai])") + ")")
        rn_terms.append("(" + fold0(
            f"list_transform({entry}, xx -> xx * xx)") + ")")
    ip = " + ".join(dot_terms)
    rn2 = " + ".join(rn_terms)
    qn = f"sqrt({fold0('list_transform(q.qv, xx -> xx * xx)')})"
    return f"""WITH {prefix},
q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM emb
  WHERE vec_id < 8),
sc AS (SELECT q.query_id, c.vec_id,
    CASE WHEN ({qn}) = 0 OR ({rn2}) = 0 THEN NULL
         ELSE ({ip}) / (({qn}) * sqrt({rn2})) END AS aprx
  FROM codes c, {froms}, q WHERE c.vec_id <> q.query_id),
co AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY aprx DESC, vec_id) AS rn
  FROM sc WHERE aprx IS NOT NULL AND NOT isnan(aprx))
  WHERE rn <= {k * over_fetch}),
rr AS (SELECT co.query_id, co.vec_id,
    {cosine('e.v', 'q.qv')} AS cosine
  FROM co JOIN emb e ON e.vec_id = co.vec_id
  JOIN q ON q.query_id = co.query_id),
r AS (SELECT query_id, vec_id, cosine, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr WHERE cosine IS NOT NULL AND NOT isnan(cosine))
SELECT query_id, vec_id, round(cosine, 6) AS cos6,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k} ORDER BY query_id, rank"""


def sim_ivf_sql(n_centroids=16, n_probe=8, k=5, refine_sample=256,
                lloyd_iters=2, extra_probes=4, rho=1.05):
    """Similarity.ivfTopK: the shared quantizer prefix, then each query
    probes its n_probe nearest cells — PLUS, with extra_probes > 0, up
    to that many boundary-fallback cells whose squared centroid distance
    is within rho x the n_probe-th (the d values on both engines come
    from the identical left fold, and d <= rho * dcut multiplies/compares
    the same doubles, so the adaptive selection is bit-equal) — and
    candidates are scored/ranked exactly."""
    ranked = f"""SELECT vec_id, v, cell, d, row_number() OVER (
      PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM cdist WHERE vec_id < 8"""
    if extra_probes > 0:
        probes = f"""pr AS MATERIALIZED (SELECT * FROM ({ranked})),
cut AS (SELECT vec_id, d * {rho!r} AS dcut FROM pr WHERE rn = {n_probe}),
probes AS (SELECT pr.vec_id AS query_id, pr.v AS qv, pr.cell
  FROM pr JOIN cut USING (vec_id)
  WHERE rn <= {n_probe}
     OR (rn <= {n_probe + extra_probes} AND pr.d <= dcut))"""
    else:
        probes = f"""probes AS (SELECT vec_id AS query_id, v AS qv, cell
  FROM ({ranked}) WHERE rn <= {n_probe})"""
    return f"""WITH {quantizer_prefix(n_centroids, refine_sample, lloyd_iters)},
{probes},
scored AS (SELECT p.query_id, a.vec_id, {cosine("a.v", "p.qv")} AS cosine
  FROM assigned a JOIN probes p USING (cell) WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, vec_id, cosine, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 6) AS cos6, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k} ORDER BY query_id, rank"""


def sim_ivfpq_sql(n_centroids=16, n_probe=8, extra_probes=4,
                  rho=1.05, m=8, k_per_sub=16, dim=64, k=5, over_fetch=8,
                  refine_sample=256, lloyd_iters=2):
    """graft.sim.Pq.ivfPqTopK — the two oracle-replayable halves
    composed: the shared IVF quantizer prefix (emb/samp/.../cdist/
    assigned) routes each query to its n_probe (+ adaptive boundary
    fallback) cells, the PQ prefix (emb skipped — shared) encodes every
    corpus row, in-cell candidates score by ADC cosine over the codes,
    and the top-(k*over_fetch) survivors rerank exactly. Every float
    fold is the pinned order both halves already pin, so the composed
    ranks are bit-equal."""
    pq_body, cents, sub = pq_prefix(m, k_per_sub, dim, refine_sample,
                                    lloyd_iters, include_emb=False)
    froms = ", ".join(f"{cents[j]} cp{j}" for j in range(m))
    dot_terms, rn_terms = [], []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        entry = f"cp{j}.cents[c.codes[{j + 1}] + 1]"
        dot_terms.append("(" + fold0(
            f"list_transform(p.qv[{lo}:{hi}], "
            f"(ax, ai) -> ax * ({entry})[ai])") + ")")
        rn_terms.append("(" + fold0(
            f"list_transform({entry}, xx -> xx * xx)") + ")")
    ip = " + ".join(dot_terms)
    rn2 = " + ".join(rn_terms)
    qn = f"sqrt({fold0('list_transform(p.qv, xx -> xx * xx)')})"
    ranked = f"""SELECT vec_id, v, cell, d, row_number() OVER (
      PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM cdist WHERE vec_id < 8"""
    if extra_probes > 0:
        probes = f"""pr AS MATERIALIZED (SELECT * FROM ({ranked})),
cut AS (SELECT vec_id, d * {rho!r} AS dcut FROM pr WHERE rn = {n_probe}),
probes AS (SELECT pr.vec_id AS query_id, pr.v AS qv, pr.cell
  FROM pr JOIN cut USING (vec_id)
  WHERE rn <= {n_probe}
     OR (rn <= {n_probe + extra_probes} AND pr.d <= dcut))"""
    else:
        probes = f"""probes AS (SELECT vec_id AS query_id, v AS qv, cell
  FROM ({ranked}) WHERE rn <= {n_probe})"""
    return f"""WITH {quantizer_prefix(n_centroids, refine_sample,
                                      lloyd_iters)},
{pq_body},
{probes},
sc AS (SELECT p.query_id, a.vec_id,
    CASE WHEN ({qn}) = 0 OR ({rn2}) = 0 THEN NULL
         ELSE ({ip}) / (({qn}) * sqrt({rn2})) END AS aprx
  FROM assigned a JOIN probes p USING (cell)
  JOIN codes c ON c.vec_id = a.vec_id, {froms}
  WHERE a.vec_id <> p.query_id),
co AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY aprx DESC, vec_id) AS rn
  FROM sc WHERE aprx IS NOT NULL AND NOT isnan(aprx))
  WHERE rn <= {k * over_fetch}),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 8),
rr AS (SELECT co.query_id, co.vec_id,
    {cosine('e.v', 'q.qv')} AS cosine
  FROM co JOIN emb e ON e.vec_id = co.vec_id
  JOIN q ON q.query_id = co.query_id),
r AS (SELECT query_id, vec_id, cosine, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr WHERE cosine IS NOT NULL AND NOT isnan(cosine))
SELECT query_id, vec_id, round(cosine, 6) AS cos6,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k} ORDER BY query_id, rank"""


def sim_ivfadc_sql(n_centroids=16, n_probe=8, extra_probes=4,
                   rho=1.05, m=8, k_per_sub=16, dim=64, k=5, over_fetch=8,
                   refine_sample=256, lloyd_iters=2,
                   emb_select=None, samp_table="emb", pre_ctes=""):
    """graft.sim.Pq.ivfAdcTopK — TRUE IVFADC (residual encoding): the
    shared IVF quantizer prefix routes queries and assigns corpus
    cells, the residual PQ prefix trains codebooks on — and encodes —
    x − centroid(cell), and ADC scores against the reconstruction
    centroid + residual:
      ip  = dot(q, centroid) + Σ_j dot(q_j, cb_j[code_j])
      rn2 = |centroid|² + Σ_j (2·dot(centroid_j, cb_j[code_j]) +
            |cb_j[code_j]|²)
    Every fold is the pinned left fold both engines share: the engine
    bakes the cell/code cross terms as driver-computed plan literals
    with the same ascending accumulation this SQL does per row, so the
    doubles — and therefore ranks — are bit-equal. Sum order matches
    the engine's reduce: (centroid term, then ascending j),
    left-assoc."""
    pq_body, cents, sub = pq_prefix(m, k_per_sub, dim, refine_sample,
                                    lloyd_iters, include_emb=False,
                                    residual=True)
    froms = ", ".join(f"{cents[j]} cp{j}" for j in range(m))
    dot_terms, rn_terms = [], []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        entry = f"cp{j}.cents[c.codes[{j + 1}] + 1]"
        dot_terms.append("(" + fold0(
            f"list_transform(p.qv[{lo}:{hi}], "
            f"(ax, ai) -> ax * ({entry})[ai])") + ")")
        cross = fold0(f"list_transform(ct.cv[{lo}:{hi}], "
                      f"(ax, ai) -> ax * ({entry})[ai])")
        n2 = fold0(f"list_transform({entry}, xx -> xx * xx)")
        rn_terms.append(f"(({cross}) * 2.0 + ({n2}))")
    cn2 = "(" + fold0("list_transform(ct.cv, xx -> xx * xx)") + ")"
    ip = " + ".join(["p.ipc"] + dot_terms)
    rn2 = " + ".join([cn2] + rn_terms)
    qn = f"sqrt({fold0('list_transform(p.qv, xx -> xx * xx)')})"
    ipc = fold0("list_transform(pr.v, (ax, ai) -> ax * ct.cv[ai])")
    ranked = f"""SELECT vec_id, v, cell, d, row_number() OVER (
      PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM cdist WHERE vec_id < 8"""
    if extra_probes > 0:
        probes = f"""pr AS MATERIALIZED (SELECT * FROM ({ranked})),
cut AS (SELECT vec_id, d * {rho!r} AS dcut FROM pr WHERE rn = {n_probe}),
probes AS (SELECT pr.vec_id AS query_id, pr.v AS qv, pr.cell,
    {ipc} AS ipc
  FROM pr JOIN cut USING (vec_id) JOIN cent ct ON ct.cell = pr.cell
  WHERE rn <= {n_probe}
     OR (rn <= {n_probe + extra_probes} AND pr.d <= dcut))"""
    else:
        probes = f"""probes AS (SELECT rk.vec_id AS query_id, rk.v AS qv,
    rk.cell, {ipc.replace('pr.v', 'rk.v')} AS ipc
  FROM ({ranked}) rk JOIN cent ct ON ct.cell = rk.cell
  WHERE rn <= {n_probe})"""
    return f"""WITH {pre_ctes}{quantizer_prefix(n_centroids, refine_sample,
                                      lloyd_iters, emb_select=emb_select,
                                      samp_table=samp_table)},
{pq_body},
{probes},
sc AS (SELECT p.query_id, c.vec_id,
    CASE WHEN ({qn}) = 0 OR ({rn2}) <= 0 THEN NULL
         ELSE ({ip}) / (({qn}) * sqrt({rn2})) END AS aprx
  FROM codes c JOIN probes p ON p.cell = c.cell
  JOIN cent ct ON ct.cell = c.cell, {froms}
  WHERE c.vec_id <> p.query_id),
co AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY aprx DESC, vec_id) AS rn
  FROM sc WHERE aprx IS NOT NULL AND NOT isnan(aprx))
  WHERE rn <= {k * over_fetch}),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 8),
rr AS (SELECT co.query_id, co.vec_id,
    {cosine('e.v', 'q.qv')} AS cosine
  FROM co JOIN emb e ON e.vec_id = co.vec_id
  JOIN q ON q.query_id = co.query_id),
r AS (SELECT query_id, vec_id, cosine, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rr WHERE cosine IS NOT NULL AND NOT isnan(cosine))
SELECT query_id, vec_id, round(cosine, 6) AS cos6,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k} ORDER BY query_id, rank"""


def sim_ivfadc_incremental_sql(**kw):
    """graft.sim.Pq.updateIvfAdcIndex probed via ivfAdcTopKWithIndex:
    quantizers (coarse + residual codebooks) sample the ORIGINAL
    corpus (emb0 — the frozen pre-update models), while assignment,
    encoding, probing and reranking run over the MERGED corpus (every
    vec_id % 4 = 0 or % 6 = 0 row re-ingested with its embedding
    reversed). With frozen models the newest-wins merge equals a
    rebuild over the merged corpus, so this is exactly the ivfadc
    chain with the sample source overridden."""
    merged = ("SELECT vec_id, CASE WHEN vec_id % 4 = 0 OR vec_id % 6 = 0"
              " THEN list_reverse(CAST(embedding AS DOUBLE[]))"
              " ELSE CAST(embedding AS DOUBLE[]) END AS v FROM embeddings")
    pre = ("emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
           " FROM embeddings),\n")
    return sim_ivfadc_sql(emb_select=merged, samp_table="emb0",
                          pre_ctes=pre, **kw)


def emb_neardups_sql(planes=4, threshold=0.3, max_bucket=64):
    """Dedup.embeddingNearDups: pairs inside a sign-pattern bucket with
    exact cosine >= threshold (cosines bit-equal, so the filter is too).
    Norms are precomputed per vector, matching the Spark side. Buckets
    are CAPPED to their max_bucket smallest vec_ids, mirroring the Spark
    side's quadratic-pair guard (Similarity.cosineNearDups maxBucket)."""
    dot = fold0("list_transform(a.v, (cx, ci) -> cx * b.v[ci])")
    nrm = f"sqrt({fold0('list_transform(v, cx -> cx * cx)')})"
    return f"""WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pmt AS MATERIALIZED (SELECT {let("pdim", "(SELECT max(len(v)) FROM emb)",
                    plane_matrix(planes))} AS pm),
bk AS MATERIALIZED (SELECT vec_id, v, {nrm} AS nm,
    {bucket("v", planes)} AS bucket FROM emb, pmt),
cap AS MATERIALIZED (SELECT vec_id, v, nm, bucket FROM (
    SELECT vec_id, v, nm, bucket,
      row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn FROM bk)
  WHERE rn <= {max_bucket}),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ({dot}) / (a.nm * b.nm) AS cosine
  FROM cap a JOIN cap b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cos6 FROM p
WHERE cosine >= {threshold} ORDER BY id_a, id_b"""


def dd_semantic_sql(n_centroids=16, threshold=0.3, max_cell=64,
                    refine_sample=256, lloyd_iters=2):
    """Similarity.semanticNearDups (SemDeDup): the shared IVF quantizer
    prefix assigns every vector to its k-means cell, then pairs form
    only inside a cell (capped at the max_cell smallest vec_ids) and
    verify by exact cosine >= threshold. Norms are precomputed per
    vector, matching the Spark side."""
    dot = fold0("list_transform(a.v, (cx, ci) -> cx * b.v[ci])")
    nrm = f"sqrt({fold0('list_transform(v, cx -> cx * cx)')})"
    return f"""WITH {quantizer_prefix(n_centroids, refine_sample, lloyd_iters)},
an AS MATERIALIZED (SELECT vec_id, v, {nrm} AS nm, cell FROM assigned),
cap AS MATERIALIZED (SELECT vec_id, v, nm, cell FROM (
    SELECT vec_id, v, nm, cell,
      row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM an)
  WHERE rn <= {max_cell}),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ({dot}) / (a.nm * b.nm) AS cosine
  FROM cap a JOIN cap b ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cos6 FROM p
WHERE cosine >= {threshold} ORDER BY id_a, id_b"""


def dd_semantic_prune_sql(n_centroids=16, threshold=0.3, max_cell=64,
                          refine_sample=256, lloyd_iters=2):
    """The SemDeDup ENDPOINT (Dedup.keepBestSurvivors over
    Similarity.semanticNearDups pairs): transitive closure of the
    cell-scoped pair list, then per cluster keep the member maximizing
    the document quality column (n_chars via doc_id = vec_id, ties to
    the smallest id); unpaired rows survive untouched."""
    dot = fold0("list_transform(a.v, (cx, ci) -> cx * b.v[ci])")
    nrm = f"sqrt({fold0('list_transform(v, cx -> cx * cx)')})"
    return f"""WITH RECURSIVE {quantizer_prefix(n_centroids, refine_sample,
                                                lloyd_iters)},
an AS MATERIALIZED (SELECT vec_id, v, {nrm} AS nm, cell FROM assigned),
cap AS MATERIALIZED (SELECT vec_id, v, nm, cell FROM (
    SELECT vec_id, v, nm, cell,
      row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM an)
  WHERE rn <= {max_cell}),
p AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cap a JOIN cap b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ({dot}) / (a.nm * b.nm) >= {threshold}),
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM p
  UNION SELECT id_b, id_a FROM p),
reach(u, v) AS (SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS id, least(u, min(v)) AS component
  FROM reach GROUP BY u),
q AS (SELECT vec_id, n_chars FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id),
best AS (SELECT id FROM (
    SELECT c.id, row_number() OVER (PARTITION BY c.component
      ORDER BY q.n_chars DESC, c.id) AS rn
    FROM comp c JOIN q ON q.vec_id = c.id)
  WHERE rn = 1)
SELECT vec_id, n_chars FROM q
WHERE vec_id NOT IN (SELECT id FROM comp) OR vec_id IN (SELECT id FROM best)
ORDER BY vec_id"""


def dd_semantic_incremental_sql(n_centroids=16, threshold=0.3, max_cell=64,
                                refine_sample=256, lloyd_iters=2):
    """Similarity.semanticCellIndex + semanticNearDupsAgainst: the
    quantizer (deterministic sample, farthest-point seeds, Lloyd
    passes, cell assignment) is built from the CORPUS split only
    (vec_id % 4 <> 0) — the frozen index — and each batch row
    (vec_id % 4 = 0) is assigned to its nearest stored centroid, then
    verified by exact cosine against that single cell's max_cell
    smallest corpus members. Mirrors the batch form of the streaming
    probe: one equi-join, no state."""
    dot = fold0("list_transform(b.v, (cx, ci) -> cx * s.v[ci])")
    nrm = f"sqrt({fold0('list_transform(v, cx -> cx * cx)')})"
    l2 = fold0("list_transform(v, (dx, di) -> (dx - cv[di]) * (dx - cv[di]))")
    return f"""WITH {quantizer_prefix(n_centroids, refine_sample, lloyd_iters,
                                      emb_where=" WHERE vec_id % 4 <> 0")},
an AS MATERIALIZED (SELECT * FROM (
    SELECT vec_id, v, {nrm} AS nm, cell FROM assigned)
  WHERE nm > 0),
cap AS MATERIALIZED (SELECT vec_id, v, nm, cell FROM (
    SELECT vec_id, v, nm, cell,
      row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM an)
  WHERE rn <= {max_cell}),
bemb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 4 = 0),
bdist AS MATERIALIZED (SELECT bemb.vec_id, bemb.v, c.cell, {l2} AS d
  FROM bemb CROSS JOIN cent c),
bassign AS (SELECT * FROM (SELECT vec_id, v, {nrm} AS nm, cell FROM (
    SELECT vec_id, v, cell, row_number() OVER (
      PARTITION BY vec_id ORDER BY d, cell) AS rn FROM bdist)
  WHERE rn = 1) WHERE nm > 0),
p AS (SELECT b.vec_id AS batch_id, s.vec_id AS corpus_id,
    ({dot}) / (b.nm * s.nm) AS cosine
  FROM bassign b JOIN cap s ON b.cell = s.cell)
SELECT batch_id, corpus_id, round(cosine, 6) AS cos6 FROM p
WHERE cosine >= {threshold} ORDER BY batch_id, corpus_id"""


def validate(sf_dir, verify_dir):
    import glob
    import time

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ok = True
    for name, sql in [("sim_lsh_topk", sim_lsh_sql()),
                      ("sim_ivf_topk", sim_ivf_sql()),
                      ("sim_pq_encode", sim_pq_encode_sql()),
                      ("sim_pq_topk", sim_pq_topk_sql()),
                      ("sim_ivfpq_topk", sim_ivfpq_sql()),
                      ("sim_ivfadc_topk", sim_ivfadc_sql(k_per_sub=64, over_fetch=16)),
                      ("sim_ivfadc_incremental",
                       sim_ivfadc_incremental_sql(k_per_sub=64,
                                                  over_fetch=16)),
                      ("dd_embedding_neardups", emb_neardups_sql()),
                      ("dd_semantic", dd_semantic_sql()),
                      ("dd_semantic_prune", dd_semantic_prune_sql()),
                      ("dd_semantic_incremental", dd_semantic_incremental_sql())]:
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
            print(" spark:", s.head(6).to_dict("records"))
            print(" duck :", d.head(6).to_dict("records"))
    return ok


def emit_scala(path):
    def esc(sql):
        return sql.replace("\\", "\\\\").replace('"', '\\"').replace(
            "\n", "\\n")

    def lit(sql):
        # JVM class files cap string constants at 64 KB (modified
        # UTF-8): chunk long SQL into concatenated <=40k constants
        if len(sql) <= 40000:
            return f'"{esc(sql)}"'
        # Seq(...).mkString defeats scalac's constant folding of
        # "a" + "b" (which would recreate the oversized constant)
        chunks = [sql[i:i + 40000] for i in range(0, len(sql), 40000)]
        joined = ",\n    ".join(f'"{esc(c)}"' for c in chunks)
        return f"Seq({joined}).mkString"

    body = "\n\n".join(
        f'  val {name}: String = {lit(sql)}'
        for name, sql in [("simLshTopK", sim_lsh_sql()),
                          ("simIvfTopK", sim_ivf_sql()),
                          ("simPqEncode", sim_pq_encode_sql()),
                          ("simPqTopK", sim_pq_topk_sql()),
                          ("simIvfPqTopK", sim_ivfpq_sql()),
                          ("simIvfAdcTopK", sim_ivfadc_sql(k_per_sub=64, over_fetch=16)),
                          ("simIvfAdcIncremental",
                           sim_ivfadc_incremental_sql(k_per_sub=64,
                                                      over_fetch=16)),
                          ("ddEmbeddingNearDups", emb_neardups_sql()),
                          ("ddSemantic", dd_semantic_sql()),
                          ("ddSemanticPrune", dd_semantic_prune_sql()),
                          ("ddSemanticIncremental",
                           dd_semantic_incremental_sql()),
                          # the Similarity.ivfCentroids replay up to the
                          # (cell, cv) table — WITHOUT the leading WITH,
                          # for composition (sim_ivf_refined splices the
                          # distributed fixed-point rounds after it)
                          ("quantizerCentPrefix",
                           quantizer_prefix(with_assigned=False))])
    src = f"""package graft

/** GENERATED by scripts/gen_sim_oracles.py — do not edit by hand.
  *
  * DuckDB oracle SQL for the ANN similarity queries: the hash-derived
  * hyperplanes / centroid sample reproduce via the same pure-SQL XXH64
  * as the dedup oracles, and all float reductions fold in Spark's HOF
  * order, so cosines (and therefore ranks) are bit-equal.
  */
object SimOracles {{
{body}
}}
"""
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    verify_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out01"
    if validate(sf_dir, verify_dir):
        emit_scala("src/main/scala/graft/SimOracles.scala")
    else:
        sys.exit(1)
