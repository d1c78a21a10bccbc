package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Graph-signal operators over relational edge lists — the
  * link-structure quality signals of a web-scale curation pipeline
  * (PageRank/centrality is the classic spam-vs-authority feature on the
  * crawl graph; Common Crawl's own ranking releases are exactly this
  * computation). Edges are any (src, dst) DataFrame — near-dup pair
  * lists, co-occurrence pairs, hyperlinks — the generator-agnostic
  * decoupling the dedup tier's survivor policies established.
  *
  * Scale design:
  *  - each iteration is one equi-join of the (nodes-sized) rank frame
  *    against the edge list plus TWO hash aggregations — the two-level
  *    bounded fold below. The edge list is the big side and never
  *    re-derives: it is computed once, and every iteration's join
  *    shuffles only the rank frame against it.
  *  - iteration lineage is CUT per round (reliable checkpoint when a
  *    checkpoint dir is configured, local otherwise) — the CC-rounds
  *    discipline; without it each round would recompute every prior
  *    round.
  *  - per-destination contributions fold in a TWO-LEVEL deterministic
  *    order: in-edges bucket by `pmod(xxhash64(src), srcBuckets)` (a
  *    pure function of the source value), contributions fold
  *    src-ascending WITHIN a (dst, bucket) group, and the per-bucket
  *    partials fold bucket-ascending per dst. The float order is still
  *    fully pinned — bit-stable on any partitioning and reproducible
  *    cross-engine — but no aggregation buffer ever holds more than
  *    one bucket's in-edges (≈ in-degree / srcBuckets) or one dst's
  *    `srcBuckets` partials. A 10M-in-degree crawl-graph hub that
  *    would OOM a single per-dst collect_list spreads across
  *    `srcBuckets` groups on DIFFERENT tasks; the first-level
  *    aggregation also spills (sort-based fallback) because groups are
  *    fine-grained. This removes the old "caller must pre-aggregate a
  *    pathological hub" hatch.
  *
  * Determinism: N, out-degrees and in-edge multisets are integers; rank
  * updates are IEEE double ops in a pinned order — `(1−d)/N + d·Σ` with
  * Σ folded (bucket asc, src asc within bucket) — so results compare
  * EXACTLY (no rounding) against the DuckDB twin, which replays the
  * identical two-level fold (same xxhash64 buckets via the pure-SQL
  * XXH64 twin). `srcBuckets = 1` degenerates to the single global
  * src-ascending fold (the pre-bucketing contract).
  */
object GraphOps {

  /** Per-id-type kernel for the small-graph single-task fast path: the
    * SAME xxhash64(seed 42) Spark's `xxhash64(col)` computes for this
    * column type (so the bounded-fold bucket assignment — and with it
    * the pinned float order — is bit-identical on both paths), and the
    * SAME value ordering Spark's `sort_array` / struct `min` use
    * (UTF8String binary comparison for strings, numeric otherwise).
    */
  private sealed trait IdOps[T] extends Serializable {
    def hash(t: T): Long
    def ord: Ordering[T]
    /** Spark's `pmod(xxhash64(src), srcBuckets)`. */
    final def bucket(t: T, srcBuckets: Int): Int = {
      val m = hash(t) % srcBuckets
      (if (m < 0) m + srcBuckets else m).toInt
    }
  }
  private object LongIdOps extends IdOps[Long] {
    def hash(t: Long): Long =
      XxHash64Function.hash(java.lang.Long.valueOf(t), LongType, 42L)
    val ord: Ordering[Long] = Ordering.Long
  }
  private object IntIdOps extends IdOps[Int] {
    def hash(t: Int): Long =
      XxHash64Function.hash(java.lang.Integer.valueOf(t), IntegerType, 42L)
    val ord: Ordering[Int] = Ordering.Int
  }
  private object StringIdOps extends IdOps[String] {
    def hash(t: String): Long =
      XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
    // Spark compares strings as UTF8String — unsigned byte-wise — which
    // differs from java.lang.String's UTF-16 ordering on supplementary
    // characters; use the exact same comparison
    val ord: Ordering[String] = (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  /** The id types the local fast path reproduces bit-identically (the
    * hash kernel and ordering above are type-exact; other types fall
    * back to the iterative rounds — the CC gating contract).
    */
  private def localIdOps(t: DataType): Option[IdOps[_]] = t match {
    case LongType => Some(LongIdOps)
    case IntegerType => Some(IntIdOps)
    case StringType => Some(StringIdOps)
    case _ => None
  }

  /** PageRank with damping `d` over a simple directed graph, `iterations`
    * fixed rounds from the uniform start 1/N. Parallel edges collapse
    * (DISTINCT); null endpoints drop. DANGLING NODES (no out-edge) are
    * REJECTED — their mass would silently leak; undirected callers union
    * both edge directions (then none exist), directed callers add
    * self-loops or drop sinks explicitly.
    *
    * The REUSED frames (edge list + out-degrees, node list) are cut
    * once; the rank chain itself is linear — each round's frame feeds
    * exactly one consumer — so the whole iteration unrolls into ONE
    * lazy plan executed as a single job (no per-round materialization;
    * measured ~3× over eager per-round checkpoints). Past
    * `cutEvery` rounds the chain is cut anyway to bound plan size.
    *
    * Returns (node, pr) for every node.
    *
    * `srcBuckets` is the bounded-fold fan-out (the per-buffer cap is
    * ≈ max in-degree / srcBuckets): part of the determinism contract —
    * changing it changes the pinned float fold order (results differ
    * at ulp level), so it defaults to a fixed 1024 and the DuckDB twin
    * pins the same value. Keep it a power of two if you need the
    * unsigned-modulo oracle twin to match.
    *
    * `smallGraphEdges`: at or below this many (distinct, directed)
    * edges the whole iteration runs as ONE task replaying the identical
    * bucketed fold (see the fast-path section below) — bit-identical
    * scores, none of the per-round scheduling. 0 disables the fast
    * path; long/int/string node ids only (others always iterate).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      cutEvery: Int = 10, srcBuckets: Int = 1024,
      smallGraphEdges: Long = 1L << 20): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    require(cutEvery >= 1, s"cutEvery must be positive, got $cutEvery")
    require(srcBuckets >= 1 && srcBuckets <= (1 << 20),
      s"srcBuckets must be in [1, 2^20], got $srcBuckets")
    val e = cut(edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull)
      .distinct())
    val outDeg = e.groupBy(col("__s")).agg(count(lit(1)).as("__od"))
    val nodes = cut(e.select(col("__s").as("__n"))
      .union(e.select(col("__d").as("__n"))).distinct())

    // N and the dangling count in ONE action
    val stats = nodes
      .join(outDeg.select(col("__s").as("__n"), lit(1).as("__has")),
        Seq("__n"), "left")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__has").isNull, 1L).otherwise(0L)).as("__dg"))
      .head()
    val n = stats.getLong(0)
    require(n > 0L,
      "empty graph: no edges survive the null filter — nothing to rank")
    val nDangling = stats.getLong(1)
    require(nDangling == 0L,
      s"$nDangling dangling node(s) (no out-edge): their rank mass " +
        "would leak every iteration. Union both edge directions " +
        "(undirected graphs) or handle sinks explicitly.")
    // small-graph fast path: the edge list is already materialized
    // (cut), so the count is one cheap scan — the CC gating shape
    val idT = e.schema("__s").dataType
    if (smallGraphEdges > 0 && localIdOps(idT).isDefined &&
        e.count() <= smallGraphEdges)
      return rankLocalDispatch(e, idT, None, damping, iterations,
        srcBuckets)
    val base = (1.0 - damping) / n

    // the edge list annotated with per-source out-degree AND fold
    // bucket, computed once: every iteration joins only the rank frame
    // against this
    val eo = cut(e.join(outDeg, Seq("__s"))
      .withColumn("__b",
        pmod(xxhash64(col("__s")), lit(srcBuckets.toLong)).cast("int")))

    val pr0 = nodes.select(col("__n"),
      (lit(1.0) / n.toDouble).as("__pr"))
    val pr = iterateRanks(nodes.select(col("__n"), lit(base).as("__tp")),
      eo, pr0, iterations, damping, cutEvery)
    pr.select(col("__n").as("node"), col("__pr").as("pr"))
  }

  /** Seed-personalized PageRank — the TrustRank family (Gyöngyi et al.
    * 2004): random-walk-with-restart where the teleport lands on a
    * SEED set instead of uniformly, so rank mass measures proximity to
    * the seeds. With hand-vetted quality sites as seeds this is the
    * crawl-curation trust signal (spam sits far from every seed); with
    * known-spam seeds it is the inverse blacklist signal. Same
    * per-round shape, determinism contract (source-ordered folds,
    * EXACT doubles) and dangling-node rejection as [[pageRank]]; only
    * the start vector and teleport differ — 1/|S| on seeds, 0
    * elsewhere.
    *
    * `seeds` is any frame whose `seedCol` names graph nodes; seed
    * values that are not nodes of `edges` are rejected loudly (a
    * silently-dropped seed would skew every score). Returns (node, pr)
    * for every node; nodes unreachable from the seed set score 0.
    * `srcBuckets` and `smallGraphEdges` as in [[pageRank]] (the fast
    * path ships the validated seed set into the one task — bounded by
    * the node count, itself ≤ 2·smallGraphEdges).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iterations: Int, damping: Double = 0.85,
      cutEvery: Int = 10, srcBuckets: Int = 1024,
      smallGraphEdges: Long = 1L << 20): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    require(cutEvery >= 1, s"cutEvery must be positive, got $cutEvery")
    require(srcBuckets >= 1 && srcBuckets <= (1 << 20),
      s"srcBuckets must be in [1, 2^20], got $srcBuckets")
    val e = cut(edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull)
      .distinct())
    val outDeg = e.groupBy(col("__s")).agg(count(lit(1)).as("__od"))
    val nodes = cut(e.select(col("__s").as("__n"))
      .union(e.select(col("__d").as("__n"))).distinct())
    val sd = seeds.select(col(seedCol).as("__n"))
      .filter(col("__n").isNotNull).distinct()

    // N, dangling count, seed count, and stray-seed count in ONE action
    // over the node ∪ seed universe
    val stats = nodes.withColumn("__in_g", lit(1))
      .join(sd.withColumn("__in_s", lit(1)), Seq("__n"), "full_outer")
      .join(outDeg.select(col("__s").as("__n"), lit(1).as("__has")),
        Seq("__n"), "left")
      .agg(sum(coalesce(col("__in_g"), lit(0))).as("__n"),
        sum(when(col("__in_g").isNotNull && col("__has").isNull, 1L)
          .otherwise(0L)).as("__dg"),
        sum(when(col("__in_g").isNotNull && col("__in_s").isNotNull, 1L)
          .otherwise(0L)).as("__ns"),
        sum(when(col("__in_g").isNull, 1L).otherwise(0L)).as("__stray"))
      .head()
    require(!stats.isNullAt(0) && stats.getLong(0) > 0L,
      "empty graph: no edges survive the null filter — nothing to rank")
    val nDangling = stats.getLong(1)
    require(nDangling == 0L,
      s"$nDangling dangling node(s) (no out-edge): their rank mass " +
        "would leak every iteration. Union both edge directions " +
        "(undirected graphs) or handle sinks explicitly.")
    val nSeeds = stats.getLong(2)
    require(nSeeds > 0L, "no seed is a node of the graph — the " +
      "teleport vector would be all-zero")
    val nStray = stats.getLong(3)
    require(nStray == 0L,
      s"$nStray seed(s) are not nodes of the graph; drop them " +
        "explicitly (a silently-ignored seed would skew every score)")
    val idT = e.schema("__s").dataType
    if (smallGraphEdges > 0 && localIdOps(idT).isDefined &&
        e.count() <= smallGraphEdges)
      return rankLocalDispatch(e, idT, Some(sd), damping, iterations,
        srcBuckets)

    val eo = cut(e.join(outDeg, Seq("__s"))
      .withColumn("__b",
        pmod(xxhash64(col("__s")), lit(srcBuckets.toLong)).cast("int")))
    val seedBase = (1.0 - damping) / nSeeds
    // cut once: every iteration joins this frame, and without the cut
    // each round would re-run the seed distinct + membership join
    val nodesTp = cut(nodes
      .join(sd.withColumn("__in_s", lit(1)), Seq("__n"), "left")
      .select(col("__n"),
        when(col("__in_s").isNotNull, lit(seedBase)).otherwise(lit(0.0))
          .as("__tp"),
        when(col("__in_s").isNotNull, lit(1.0 / nSeeds))
          .otherwise(lit(0.0)).as("__pr")))
    val pr = iterateRanks(nodesTp.select(col("__n"), col("__tp")), eo,
      nodesTp.select(col("__n"), col("__pr")), iterations, damping,
      cutEvery)
    pr.select(col("__n").as("node"), col("__pr").as("pr"))
  }

  /** The shared power-iteration loop: per round, one equi-join of the
    * rank frame against the degree+bucket-annotated edge list `eo`
    * (columns __s, __d, __od, __b), then the TWO-LEVEL bounded fold —
    * src-ordered within each (dst, bucket) group, bucket-ordered
    * across the per-bucket partials — and the update
    * `tp(n) + damping · Σ`. `nodesTp` carries (__n, __tp) — the
    * per-node teleport mass; `pr0` carries (__n, __pr).
    *
    * Buffer bounds: level 1 holds one bucket's in-edge structs
    * (≈ in-degree / srcBuckets, spread across tasks by the (d, b)
    * shuffle key); level 2 holds ≤ srcBuckets partials per dst. The
    * level-2 shuffle carries at most srcBuckets rows per destination —
    * at crawl scale that is nodes-sized traffic, negligible next to
    * the edge-sized level-1 shuffle.
    */
  private def iterateRanks(nodesTp: DataFrame, eo: DataFrame,
      pr0: DataFrame, iterations: Int, damping: Double,
      cutEvery: Int): DataFrame = {
    var pr = pr0
    var i = 0
    while (i < iterations) {
      val contrib = eo
        .join(pr.select(col("__n").as("__s"), col("__pr")), Seq("__s"))
        .select(col("__d"), col("__s"), col("__b"),
          (col("__pr") / col("__od").cast("double")).as("__c"))
      // level 1: fold contributions in SOURCE order within the bucket
      val partials = contrib.groupBy(col("__d"), col("__b"))
        .agg(sort_array(collect_list(struct(col("__s"), col("__c"))))
          .as("__cs"))
        .select(col("__d"), col("__b"),
          aggregate(transform(col("__cs"), x => x("__c")), lit(0.0),
            (a, v) => a + v).as("__ps"))
      // level 2: fold the bucket partials in BUCKET order
      val sums = partials.groupBy(col("__d"))
        .agg(sort_array(collect_list(struct(col("__b"), col("__ps"))))
          .as("__bs"))
        .select(col("__d"),
          aggregate(transform(col("__bs"), x => x("__ps")), lit(0.0),
            (a, v) => a + v).as("__sm"))
      pr = nodesTp.join(sums, col("__n") === col("__d"), "left")
        .select(col("__n"),
          (col("__tp") + lit(damping) * coalesce(col("__sm"), lit(0.0)))
            .as("__pr"))
      i += 1
      if (i % cutEvery == 0 && i < iterations) pr = cut(pr)
    }
    pr
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — the cheap
    * community-detection pass a crawl-curation pipeline runs to group
    * pages/domains before per-community sampling. Labels start as the
    * node ids; each round EVERY node simultaneously adopts the most
    * frequent label among its in-neighbors, ties broken by the
    * SMALLEST label. The classic algorithm visits nodes in random
    * order — this engine never ships nondeterminism, so the
    * synchronous variant with a total tie order is the operator:
    * integer votes + (count desc, label asc) argmin make every round
    * bit-identical on any partitioning and cross-engine.
    *
    * Provide both edge directions for undirected semantics (the
    * [[pageRank]] convention); multi-edges collapse to simple edges.
    * A node with no in-edges keeps its current label. Node/label types
    * are PRESERVED (the pageRank convention — no silent stringify), so
    * "smallest label" means the node type's own ordering: numeric for
    * numeric ids, lexicographic for strings.
    *
    * Scale: per round one equi-join on the label frame plus two
    * partial-combinable hash aggregations ((node, label) vote counts,
    * then the per-node argmin via min over (−count, label) structs —
    * no ranking window, nothing row_number-sorts the vote table);
    * lineage cut every 3 rounds like the rank loops.
    * `smallGraphEdges` as in [[pageRank]] — at or below it the rounds
    * run as one task, labels identical (pure integer votes).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, smallGraphEdges: Long = 1L << 20): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    val e = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull)
      .distinct()
    val eo = cut(e)
    val idT = eo.schema("__s").dataType
    if (smallGraphEdges > 0 && localIdOps(idT).isDefined &&
        eo.count() <= smallGraphEdges)
      return labelPropDispatch(eo, idT, iterations)
    val nodes = cut(eo.select(col("__s").as("__n"))
      .union(eo.select(col("__d").as("__n"))).distinct())
    var lab = nodes.select(col("__n"), col("__n").as("__l"))
    var i = 0
    while (i < iterations) {
      val winners = eo
        .join(lab.select(col("__n").as("__s"), col("__l")), Seq("__s"))
        .groupBy(col("__d"), col("__l"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__d"))
        .agg(min(struct((-col("__c")).as("nc"), col("__l").as("l")))
          .as("__w"))
        .select(col("__d").as("__wd"), col("__w")("l").as("__wl"))
      lab = lab
        .join(winners, col("__n") === col("__wd"), "left")
        .select(col("__n"), coalesce(col("__wl"), col("__l")).as("__l"))
      i += 1
      if (i % 3 == 0 && i < iterations) lab = cut(lab)
    }
    lab.select(col("__n").as("node"), col("__l").as("community"))
  }

  /** In/out degree per node of the (collapsed) simple digraph — the
    * cheap first-pass graph profile. One aggregation per direction.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull)
      .distinct()
    val out = e.groupBy(col("__s").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("__d").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Per-node triangle counts of the UNDIRECTED simple graph induced
    * by the edge list (direction and parallel edges collapse; self
    * loops and null endpoints drop) — the classic graph-quality signal
    * (clustering coefficient numerator: link farms are triangle-dense,
    * organic link graphs are not). Output: one row per node of the
    * collapsed graph, `(node, deg, n_triangles)`, zero-filled for
    * triangle-free nodes; `sum(n_triangles) = 3 × |triangles|`.
    *
    * Scale design — degree-ordered wedge enumeration (the MapReduce
    * triangle-counting scheme of Suri–Vassilvitskii, WWW'11): every
    * edge orients from its lower endpoint to its higher endpoint under
    * the total order `(degree, node)`, wedges enumerate only at the
    * LOWER endpoint, and a wedge closes into a triangle iff its two
    * outer nodes are themselves an oriented edge (one equi-join on the
    * pair). Out-degree under this orientation is O(√m) regardless of
    * raw degree skew — a 10M-degree crawl-graph hub generates wedges
    * bounded by the number of its HIGHER-ordered neighbours, not
    * deg², so the wedge exchange survives the skew that kills the
    * naive per-node enumeration. Each triangle materializes exactly
    * once (its lowest-ordered vertex owns it); the per-node fan-out is
    * a constant ×3 explode on the (far smaller) triangle set.
    *
    * Determinism: pure integer counting over set semantics — exact on
    * any partitioning and cross-engine.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String, smallGraphEdges: Long = 1L << 20): DataFrame = {
    val s = col(srcCol)
    val d = col(dstCol)
    // collapse to the canonical undirected simple edge set (u < v);
    // CUT — e feeds the degree union (twice) and the orientation join,
    // so an uncut lineage recomputes the caller's edge derivation
    // (often itself a join) three times over
    val e = cut(edges
      .filter(s.isNotNull && d.isNotNull && s =!= d)
      .select(least(s, d).as("__u"), greatest(s, d).as("__v"))
      .distinct())
    // small-graph fast path (the rank/label-loop discipline): triangle
    // counting is pure integer arithmetic over set semantics, so the
    // one-task forward-orientation count is trivially identical to the
    // distributed wedge enumeration
    val idT = e.schema("__u").dataType
    if (smallGraphEdges > 0 && localIdOps(idT).isDefined &&
        e.count() <= smallGraphEdges)
      return triangleLocalDispatch(e, idT)
    val deg = e.select(col("__u").as("__n"))
      .unionAll(e.select(col("__v").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__deg"))
    // orient each edge low → high under the (degree, node) total order
    val du = deg.select(col("__n").as("__u"), col("__deg").as("__du"))
    val dv = deg.select(col("__n").as("__v"), col("__deg").as("__dv"))
    val lowFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("__u") < col("__v"))
    // CUT — the oriented edge list feeds both wedge sides AND the
    // closure probe (three consumers of the same two-join derivation)
    val o = cut(e.join(du, Seq("__u")).join(dv, Seq("__v"))
      .select(
        when(lowFirst, col("__u")).otherwise(col("__v")).as("__a"),
        when(lowFirst, col("__v")).otherwise(col("__u")).as("__b"),
        when(lowFirst, col("__dv")).otherwise(col("__du")).as("__bd")))
    // wedges at the low vertex, outer pair ordered by (degree, node)
    // so each wedge enumerates once and matches the edge orientation
    val w1 = o.select(col("__a"), col("__b").as("__x"),
      col("__bd").as("__xd"))
    val w2 = o.select(col("__a"), col("__b").as("__y"),
      col("__bd").as("__yd"))
    val wedges = w1.join(w2, Seq("__a"))
      .filter(col("__xd") < col("__yd") ||
        (col("__xd") === col("__yd") && col("__x") < col("__y")))
    val tri = wedges
      .join(o.select(col("__a").as("__x"), col("__b").as("__y")),
        Seq("__x", "__y"))
      .select(col("__a"), col("__x"), col("__y"))
    val perNode = tri
      .select(explode(array(col("__a"), col("__x"), col("__y")))
        .as("__n"))
      .groupBy(col("__n")).agg(count(lit(1)).as("__nt"))
    deg.join(perNode, Seq("__n"), "left")
      .select(col("__n").as("node"), col("__deg").as("deg"),
        coalesce(col("__nt"), lit(0L)).as("n_triangles"))
  }

  // ------------------------------------------------------------------
  // Small-graph single-task fast paths — the connectedComponents
  // discipline (graft.dedup.Dedup: count the materialized edge list
  // once; at or below `smallGraphEdges`, run the whole iteration as
  // ONE task) applied to the rank and label loops: on a 6.7k-node
  // graph the iterative path's per-round scheduling (3 joins + 2
  // aggregations + periodic checkpoints, ~6 rounds) costs ~30× the
  // arithmetic (measured r13: gr_labelprop 2.4 s vs 0.08 s of work).
  // The local replay is BIT-IDENTICAL: the same xxhash64 buckets, the
  // same (bucket asc, src asc) two-level float fold order, the same
  // IEEE ops — GraphFastPathSpec pins fast ≡ iterative exactly.
  // Above the bound (any real crawl graph) the rounds run unchanged;
  // the single task never holds more than `smallGraphEdges` edges.
  // ------------------------------------------------------------------

  /** One-task PageRank/personalized-PageRank replay. `seeds` None =
    * uniform teleport; Some(set) = the validated seed set (⊆ nodes,
    * already guaranteed by the caller's stray-seed check — the set is
    * bounded by the node count, itself ≤ 2·smallGraphEdges).
    */
  private def rankLocal[T: scala.reflect.ClassTag](e: DataFrame,
      ops: IdOps[T], seeds: Option[Set[T]], damping: Double,
      iterations: Int, srcBuckets: Int)(
      implicit enc: Encoder[T]): DataFrame = {
    implicit val tup2: Encoder[(T, T)] = Encoders.tuple(enc, enc)
    val outEnc: Encoder[(T, Double)] =
      Encoders.tuple(enc, Encoders.scalaDouble)
    val ds: Dataset[(T, T)] = e.select(col("__s"), col("__d")).as[(T, T)]
    ds.groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        implicit val o: Ordering[T] = ops.ord
        val edges = it.toArray
        val od = new scala.collection.mutable.HashMap[T, Long]()
        val nodesSet = new scala.collection.mutable.HashSet[T]()
        edges.foreach { case (s, d) =>
          od.update(s, od.getOrElse(s, 0L) + 1L)
          nodesSet += s; nodesSet += d
        }
        val nodes = nodesSet.toArray
        val n = nodes.length.toLong
        // one sort fixes BOTH fold orders: (dst asc, bucket asc within
        // dst, src asc within bucket) — exactly sort_array's struct
        // ordering at each of the two levels
        val sorted = edges
          .map { case (s, d) => (d, ops.bucket(s, srcBuckets), s) }
          .sorted(Ordering.Tuple3(o, Ordering.Int, o))
        val (tp, pr0): (T => Double, T => Double) = seeds match {
          case None =>
            val t = (1.0 - damping) / n
            val p = 1.0 / n.toDouble
            ((_: T) => t, (_: T) => p)
          case Some(sd) =>
            val ns = sd.size.toLong
            val t = (1.0 - damping) / ns
            val p = 1.0 / ns
            ((x: T) => if (sd(x)) t else 0.0,
              (x: T) => if (sd(x)) p else 0.0)
        }
        val pr = new scala.collection.mutable.HashMap[T, Double]()
        nodes.foreach(x => pr(x) = pr0(x))
        var i = 0
        while (i < iterations) {
          val sums = new scala.collection.mutable.HashMap[T, Double]()
          // linear replay of the two-level fold: level-1 partial per
          // (dst, bucket) folded src-ascending, added into the per-dst
          // accumulator at bucket boundaries (bucket-ascending)
          var j = 0
          while (j < sorted.length) {
            val d = sorted(j)._1
            var lvl2 = 0.0
            while (j < sorted.length && sorted(j)._1 == d) {
              val b = sorted(j)._2
              var lvl1 = 0.0
              while (j < sorted.length && sorted(j)._1 == d &&
                  sorted(j)._2 == b) {
                val s = sorted(j)._3
                lvl1 += pr(s) / od(s).toDouble
                j += 1
              }
              lvl2 += lvl1
            }
            sums(d) = lvl2
          }
          nodes.foreach(x =>
            pr(x) = tp(x) + damping * sums.getOrElse(x, 0.0))
          i += 1
        }
        nodes.iterator.map(x => (x, pr(x)))
      }(outEnc)
      .toDF("node", "pr")
  }

  /** One-task synchronous label propagation replay: integer votes, the
    * (count desc, label asc) winner via the type-exact ordering.
    */
  private def labelPropLocal[T: scala.reflect.ClassTag](e: DataFrame,
      ops: IdOps[T], iterations: Int)(
      implicit enc: Encoder[T]): DataFrame = {
    implicit val tup2: Encoder[(T, T)] = Encoders.tuple(enc, enc)
    val ds: Dataset[(T, T)] = e.select(col("__s"), col("__d")).as[(T, T)]
    ds.groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        val o = ops.ord
        val edges = it.toArray
        val nodesSet = new scala.collection.mutable.HashSet[T]()
        edges.foreach { case (s, d) => nodesSet += s; nodesSet += d }
        val nodes = nodesSet.toArray
        val lab = new scala.collection.mutable.HashMap[T, T]()
        nodes.foreach(x => lab(x) = x)
        var i = 0
        while (i < iterations) {
          val votes = new scala.collection.mutable.HashMap[T,
            scala.collection.mutable.HashMap[T, Long]]()
          edges.foreach { case (s, d) =>
            val m = votes.getOrElseUpdate(d,
              new scala.collection.mutable.HashMap[T, Long]())
            val l = lab(s)
            m.update(l, m.getOrElse(l, 0L) + 1L)
          }
          // synchronous adoption: winners computed entirely from the
          // previous round's labels before any update lands
          val winners = new scala.collection.mutable.HashMap[T, T]()
          votes.foreach { case (d, m) =>
            var bc = -1L
            var bl: Option[T] = None
            m.foreach { case (l, c) =>
              if (c > bc || (c == bc && o.lt(l, bl.get))) {
                bc = c; bl = Some(l)
              }
            }
            winners(d) = bl.get
          }
          winners.foreach { case (d, w) => lab(d) = w }
          i += 1
        }
        nodes.iterator.map(x => (x, lab(x)))
      }(tup2)
      .toDF("node", "community")
  }

  /** Type dispatch for the fast paths (the localIdOps gate guarantees
    * one of the three cases).
    */
  private def rankLocalDispatch(e: DataFrame, idT: DataType,
      seeds: Option[DataFrame], damping: Double, iterations: Int,
      srcBuckets: Int): DataFrame = idT match {
    case LongType => rankLocal[Long](e, LongIdOps,
      seeds.map(_.select(col("__n")).as[Long](Encoders.scalaLong)
        .collect().toSet), damping, iterations, srcBuckets)(
      scala.reflect.classTag[Long], Encoders.scalaLong)
    case IntegerType => rankLocal[Int](e, IntIdOps,
      seeds.map(_.select(col("__n")).as[Int](Encoders.scalaInt)
        .collect().toSet), damping, iterations, srcBuckets)(
      scala.reflect.classTag[Int], Encoders.scalaInt)
    case StringType => rankLocal[String](e, StringIdOps,
      seeds.map(_.select(col("__n")).as[String](Encoders.STRING)
        .collect().toSet), damping, iterations, srcBuckets)(
      scala.reflect.classTag[String], Encoders.STRING)
    case t => sys.error(s"rankLocalDispatch: ungated id type $t")
  }

  /** One-task triangle counting: the forward algorithm under the same
    * (degree, node) total order as the distributed wedge enumeration —
    * each triangle found once at its lowest-ordered vertex; pure
    * integer counting, so outputs are identical by construction.
    */
  private def triangleLocal[T: scala.reflect.ClassTag](e: DataFrame,
      ops: IdOps[T])(implicit enc: Encoder[T]): DataFrame = {
    implicit val tup2: Encoder[(T, T)] = Encoders.tuple(enc, enc)
    val outEnc: Encoder[(T, Long, Long)] =
      Encoders.tuple(enc, Encoders.scalaLong, Encoders.scalaLong)
    val ds: Dataset[(T, T)] = e.select(col("__u"), col("__v")).as[(T, T)]
    ds.groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        val o = ops.ord
        val edges = it.toArray
        // rank-compress nodes under the SAME (degree, node) total order
        // the distributed orientation uses; adjacency becomes primitive
        // int arrays so the intersection pass below never boxes
        val degM = new scala.collection.mutable.HashMap[T, Int]()
        edges.foreach { case (u, v) =>
          degM.update(u, degM.getOrElse(u, 0) + 1)
          degM.update(v, degM.getOrElse(v, 0) + 1)
        }
        val nodes = degM.keys.toArray.sorted(new Ordering[T] {
          def compare(a: T, b: T): Int = {
            val c = Integer.compare(degM(a), degM(b))
            if (c != 0) c else o.compare(a, b)
          }
        })
        val rank = new scala.collection.mutable.HashMap[T, Int]()
        var i = 0
        while (i < nodes.length) { rank(nodes(i)) = i; i += 1 }
        // forward (higher-rank) adjacency as SORTED int-rank arrays:
        // out-degree O(√m) under the orientation — the same skew bound
        // the distributed wedge enumeration relies on
        val fwdCnt = new Array[Int](nodes.length)
        edges.foreach { case (u, v) =>
          val ru = rank(u); val rv = rank(v)
          fwdCnt(math.min(ru, rv)) += 1
        }
        val fwd = Array.tabulate(nodes.length)(j => new Array[Int](fwdCnt(j)))
        val fill = new Array[Int](nodes.length)
        edges.foreach { case (u, v) =>
          val ru = rank(u); val rv = rank(v)
          val lo = math.min(ru, rv); val hi = math.max(ru, rv)
          fwd(lo)(fill(lo)) = hi; fill(lo) += 1
        }
        var j = 0
        while (j < fwd.length) { java.util.Arrays.sort(fwd(j)); j += 1 }
        // per oriented edge (a -> b), triangles = |fwd(a) ∩ fwd(b)|
        // (membership in both forward lists implies a < b < w): a
        // two-pointer merge over sorted primitive arrays
        val cnt = new Array[Long](nodes.length)
        var a = 0
        while (a < fwd.length) {
          val fa = fwd(a)
          var bi = 0
          while (bi < fa.length) {
            val b = fa(bi)
            val fb = fwd(b)
            var p = 0; var q = 0
            while (p < fa.length && q < fb.length) {
              val x = fa(p); val y = fb(q)
              if (x == y) {
                cnt(a) += 1L; cnt(b) += 1L; cnt(x) += 1L
                p += 1; q += 1
              } else if (x < y) p += 1
              else q += 1
            }
            bi += 1
          }
          a += 1
        }
        nodes.indices.iterator.map(r =>
          (nodes(r), degM(nodes(r)).toLong, cnt(r)))
      }(outEnc)
      .toDF("node", "deg", "n_triangles")
  }

  private def triangleLocalDispatch(e: DataFrame,
      idT: DataType): DataFrame = idT match {
    case LongType => triangleLocal[Long](e, LongIdOps)(
      scala.reflect.classTag[Long], Encoders.scalaLong)
    case IntegerType => triangleLocal[Int](e, IntIdOps)(
      scala.reflect.classTag[Int], Encoders.scalaInt)
    case StringType => triangleLocal[String](e, StringIdOps)(
      scala.reflect.classTag[String], Encoders.STRING)
    case t => sys.error(s"triangleLocalDispatch: ungated id type $t")
  }

  private def labelPropDispatch(e: DataFrame, idT: DataType,
      iterations: Int): DataFrame = idT match {
    case LongType =>
      labelPropLocal[Long](e, LongIdOps, iterations)(
        scala.reflect.classTag[Long], Encoders.scalaLong)
    case IntegerType =>
      labelPropLocal[Int](e, IntIdOps, iterations)(
        scala.reflect.classTag[Int], Encoders.scalaInt)
    case StringType =>
      labelPropLocal[String](e, StringIdOps, iterations)(
        scala.reflect.classTag[String], Encoders.STRING)
    case t => sys.error(s"labelPropDispatch: ungated id type $t")
  }

  private def cut(df: DataFrame): DataFrame =
    graft.ops.Lineage.cut(df)
}
