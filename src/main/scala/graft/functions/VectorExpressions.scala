package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._

/** Vector kernels for the similarity tier (same rationale as
  * HashExpressions: `aggregate(zip_with(...))` HOFs evaluate an
  * interpreted lambda per element; on a dot product inside a pair join
  * that overhead dominates). The loops accumulate LEFT-TO-RIGHT exactly
  * like the HOF fold they replace, so results are bit-identical and the
  * DuckDB oracles (which replicate that fold order) stay green.
  * Both expressions generate static calls into VectorKernels so they stay
  * inside whole-stage codegen (the nullable result is handled explicitly).
  */

/** Per-executor cache of the LSH hyperplane weight matrix. Weights depend
  * only on (plane index, element index) — never on the data — so they are
  * hashed once per executor and reused by every row: weights(i)(pp) =
  * XXH64.hashInt(i, seed(pp)) / Long.MaxValue, row-major in the element
  * index so the kernel's inner loop is a contiguous multiply-add. The
  * matrix grows on demand (copy-on-grow behind a volatile — the instance
  * rides the plan's reference array and is shared by all tasks in a JVM;
  * a race costs one redundant rebuild, never a wrong value). ~32 KB at
  * dim 64 × 64 planes.
  */
final class LshWeights(val seeds: Array[Long]) extends Serializable {
  def numPlanes: Int = seeds.length
  @transient @volatile private var w: Array[Array[Double]] =
    Array.empty[Array[Double]]

  def upTo(n: Int): Array[Array[Double]] = {
    val cur = w
    if (cur != null && cur.length >= n) return cur
    synchronized {
      val base = if (w == null) Array.empty[Array[Double]] else w
      if (base.length >= n) return base
      val target = math.max(n, math.max(64, base.length * 2))
      val grown = java.util.Arrays.copyOf(base, target)
      var i = base.length
      while (i < target) {
        val row = new Array[Double](seeds.length)
        var pp = 0
        while (pp < seeds.length) {
          row(pp) = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(i, seeds(pp)).toDouble / Long.MaxValue.toDouble
          pp += 1
        }
        grown(i) = row
        i += 1
      }
      w = grown
      grown
    }
  }
}

/** Static kernels shared by the interpreted and generated paths. */
object VectorKernels {
  /** Null on length mismatch or any null element (HOF zip_with parity). */
  def dot(x: ArrayData, y: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    if (leftFloat && rightFloat) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i) * y.getFloat(i); i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
    }
    java.lang.Double.valueOf(acc)
  }

  /** JL sign projection: per output coordinate, a left-to-right fold in
    * element order, one √k division at the end. Null (Java null return)
    * on length mismatch or any null element.
    */
  def jlProject(x: ArrayData, isFloat: Boolean,
      signs: Array[Array[Byte]]): ArrayData = {
    val d = signs(0).length
    if (x.numElements() != d) return null
    val k = signs.length
    val out = new Array[Double](k)
    // divide (not multiply-by-reciprocal): the oracle computes sm/sqrt(k)
    val sqrtK = math.sqrt(k.toDouble)
    var j = 0
    while (j < k) {
      val row = signs(j)
      var acc = 0.0
      var i = 0
      while (i < d) {
        if (x.isNullAt(i)) return null
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += (if (row(i) > 0) v else -v)
        i += 1
      }
      out(j) = acc / sqrtK
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All `tables` LSH sign-pattern bucket ids in ONE pass over the vector.
    * weight(pp, i) = hashInt(i, seed(pp)) / Long.MaxValue with
    * seed(pp) = hashInt(pp, 42) reproduces the SQL `xxhash64(lit(pp), i)`
    * composite hash bit-exactly (the DuckDB oracles replicate that hash in
    * pure SQL and pin it); the data-independent weight rows come from the
    * per-executor LshWeights cache, so the steady-state row cost is pure
    * multiply-adds. Accumulation per plane is left-to-right in element
    * order — identical to the `aggregate(zip_with(...))` HOF fold this
    * replaces. An empty vector or any null element yields bucket 0 for
    * every table (HOF parity: a null projection fails `proj >= 0` and
    * takes the otherwise(0) branch).
    */
  def lshBuckets(x: ArrayData, isFloat: Boolean, planes: Int,
      wc: LshWeights): ArrayData = {
    val n = x.numElements()
    val nP = wc.numPlanes
    val proj = new Array[Double](nP)
    var anyNull = n == 0
    val w = wc.upTo(n)
    var i = 0
    while (i < n && !anyNull) {
      if (x.isNullAt(i)) anyNull = true
      else {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val wi = w(i)
        var pp = 0
        while (pp < nP) {
          proj(pp) += v * wi(pp)
          pp += 1
        }
      }
      i += 1
    }
    val tables = nP / planes
    val out = new Array[Long](tables)
    if (!anyNull) {
      var t = 0
      while (t < tables) {
        var b = 0L
        var p = 0
        while (p < planes) {
          // !(x < 0), not (x >= 0): a NaN projection (NaN/Infinity vector
          // elements) must SET the bit — Spark SQL ordering puts NaN above
          // every value, so the HOF `when(proj >= 0, ...)` form set it too
          if (!(proj(t * planes + p) < 0)) b |= 1L << p
          p += 1
        }
        out(t) = b
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** The `m` nearest centroid cell ids by (squared-L2 distance asc, cell
    * asc) — every centroid distance computed in ONE pass over the vector
    * (the HOF form re-walked the vector once per centroid with an
    * interpreted lambda per element). Distance accumulation is
    * left-to-right per centroid, same order as the `aggregate(zip_with)`
    * fold. Returns null (not a misassignment) for a corrupt embedding —
    * null element or length mismatch with the centroids.
    */
  def nearestCells(x: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]], m: Int): ArrayData = {
    val n = x.numElements()
    val nc = cents.length
    if (nc == 0 || n == 0) return null
    if (cents(0).length != n) return null
    val d = new Array[Double](nc)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      var c = 0
      while (c < nc) {
        val diff = v - cents(c)(i)
        d(c) += diff * diff
        c += 1
      }
      i += 1
    }
    // SQL double ordering for the sort key: NaN greatest; squared sums
    // never produce -0.0 so primitive < suffices below NaN handling
    def before(a: Int, b: Int): Boolean = {
      val da = d(a); val db = d(b)
      if (da.isNaN) db.isNaN && a < b
      else if (db.isNaN) true
      else if (da != db) da < db
      else a < b
    }
    val k = math.min(m, nc)
    val idx = Array.tabulate(nc)(identity)
    // selection of the k smallest — nc is tiny (coarse quantizer)
    val out = new Array[Int](k)
    var s = 0
    while (s < k) {
      var best = s
      var j = s + 1
      while (j < nc) {
        if (before(idx(j), idx(best))) best = j
        j += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      out(s) = idx(s)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Boundary-fallback probe selection: the `nProbe` nearest cells by
    * (squared-L2, cell asc) PLUS up to `extra` additional cells whose
    * squared distance is within `rho` × the nProbe-th distance — the
    * cheap insurance for queries sitting near a cell boundary, where a
    * fixed-nProbe probe loses exactly the neighbors that straddle it.
    * A query far from any boundary pays nothing (no extra cells pass
    * the rho test); a boundary query widens its probe by at most
    * `extra`. Same null contract and distance fold order as
    * [[nearestCells]], so the DuckDB oracle reproduces the selection
    * bit-exactly (d <= rho * d_nProbe compares identically computed
    * doubles). A NaN nProbe-th distance admits no extras (NaN
    * comparisons are false).
    */
  def nearestCellsAdaptive(x: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]], nProbe: Int, extra: Int,
      rho: Double): ArrayData = {
    val n = x.numElements()
    val nc = cents.length
    if (nc == 0 || n == 0) return null
    if (cents(0).length != n) return null
    val d = new Array[Double](nc)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      var c = 0
      while (c < nc) {
        val diff = v - cents(c)(i)
        d(c) += diff * diff
        c += 1
      }
      i += 1
    }
    def before(a: Int, b: Int): Boolean = {
      val da = d(a); val db = d(b)
      if (da.isNaN) db.isNaN && a < b
      else if (db.isNaN) true
      else if (da != db) da < db
      else a < b
    }
    val kBase = math.min(nProbe, nc)
    val kMax = math.min(nProbe + extra, nc)
    val idx = Array.tabulate(nc)(identity)
    // selection of the kMax smallest, then trim extras by the rho rule
    var s = 0
    while (s < kMax) {
      var best = s
      var j = s + 1
      while (j < nc) {
        if (before(idx(j), idx(best))) best = j
        j += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      s += 1
    }
    val dCut = d(idx(kBase - 1)) * rho
    var k = kBase
    while (k < kMax && d(idx(k)) <= dCut) k += 1
    val out = new Array[Int](k)
    System.arraycopy(idx, 0, out, 0, k)
    new GenericArrayData(out)
  }

  /** Null on any null element. */
  def norm(x: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getFloat(i); acc += v * v; i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getDouble(i); acc += v * v; i += 1
      }
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }
}

/** Dot product of two array<double|float> columns (null if either is
  * null; elements assumed non-null, as produced by embedding casts).
  * Matches the HOF semantics it replaced: float×float multiplies in
  * FLOAT then widens into the double accumulator; any double operand
  * promotes the multiply to double.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // can return null even for non-null inputs (length mismatch, null elem)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  // HOF parity: zip_with pads length mismatches with nulls and a null
  // element nulls the whole aggregate — a truncated/corrupt embedding
  // must yield NULL (and get filtered), not a plausible prefix cosine
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorKernels.dot(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProduct = copy(left = l, right = r)
}

/** L2 norm of an array<double|float> column — sqrt of the left-to-right
  * sum of squares (float arrays square in FLOAT, like the HOF form).
  */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> argument, got " +
        other.catalogString)
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.norm(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nrm")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorKernels.norm($c, $isFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
}

/** All `tables` random-hyperplane LSH bucket ids of an embedding, as
  * array<long> of length `tables` — one vector pass for every
  * (table, plane) projection instead of planes·tables interpreted
  * `aggregate(zip_with(...))` folds per row (64 with the driver's
  * planes=4, tables=16 — the documented 100 TB scale-killer).
  */
case class LshBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  require(planes > 0 && planes < 64, s"planes must be in [1, 63], got $planes")
  require(tables > 0, s"tables must be positive, got $tables")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> argument, got " +
        other.catalogString)
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** seed(pp) = xxhash64-of-int(pp) with Spark's default seed 42 — the
    * first step of the SQL composite `xxhash64(lit(pp), i)`.
    */
  @transient private lazy val weights: LshWeights =
    new LshWeights(Array.tabulate(planes * tables)(pp =>
      XxHash64Function.hash(pp, IntegerType, 42L)))

  override def nullSafeEval(input: Any): Any =
    VectorKernels.lshBuckets(input.asInstanceOf[ArrayData], isFloat, planes,
      weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", weights,
      "graft.functions.LshWeights")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshBuckets($c, $isFloat, $planes, $wRef)")
  }

  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}

/** The `m` nearest coarse-quantizer cells of an embedding, as array<int>
  * ordered by (squared-L2 distance asc, cell asc) — all centroid
  * distances in one vector pass (the HOF form was one interpreted fold
  * per centroid). Null for a corrupt embedding (null element / length
  * mismatch): better to surface the row via a null-join drop than to
  * assign it a meaningless cell. Centroids are Seq (not Array) so the
  * case-class equality Catalyst uses for semanticEquals is structural.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], m: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "NearestCells requires at least one centroid")
  // the kernel validates the INPUT vector against centroid 0's length and
  // returns null for a mismatch; a ragged centroid set would instead blow
  // up mid-kernel — fail fast at construction with a clear message
  require(centroids.forall(_.size == centroids.head.size),
    s"NearestCells requires uniform centroid dimensions, got " +
      centroids.map(_.size).distinct.sorted.mkString("{", ", ", "}"))
  require(m > 0, s"m must be positive, got $m")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"
  // compact string form: the default flatArguments rendering prints the
  // centroid matrix itself, and plan stringification (one SQL-UI plan
  // description per AQE stage) then dominates driver time — see
  // [[CompactLiteral]]
  override def toString: String =
    s"$prettyName($child, cents[${centroids.length}x" +
      s"${centroids.head.length}], $m)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> argument, got " +
        other.catalogString)
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCells(input.asInstanceOf[ArrayData], isFloat, cents, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.VectorKernels.nearestCells($c, $isFloat, $centsRef, $m);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** [[NearestCells]] with the boundary-fallback probe rule
  * ([[VectorKernels.nearestCellsAdaptive]]): the `nProbe` nearest cells
  * plus up to `extra` cells within `rho` × the nProbe-th squared
  * distance. Kept as a separate expression so existing fixed-probe
  * plans (and their plan pins) are untouched.
  */
case class NearestCellsAdaptive(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int, extra: Int, rho: Double)
    extends UnaryExpression {
  require(centroids.nonEmpty,
    "NearestCellsAdaptive requires at least one centroid")
  require(centroids.forall(_.size == centroids.head.size),
    s"NearestCellsAdaptive requires uniform centroid dimensions, got " +
      centroids.map(_.size).distinct.sorted.mkString("{", ", ", "}"))
  require(nProbe > 0, s"nProbe must be positive, got $nProbe")
  require(extra >= 0, s"extra must be >= 0, got $extra")
  require(rho >= 1.0, s"rho must be >= 1.0, got $rho")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells_adaptive"
  // compact string form — see [[NearestCells.toString]]
  override def toString: String =
    s"$prettyName($child, cents[${centroids.length}x" +
      s"${centroids.head.length}], $nProbe, $extra, $rho)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> argument, got " +
        other.catalogString)
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCellsAdaptive(input.asInstanceOf[ArrayData],
      isFloat, cents, nProbe, extra, rho)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.VectorKernels.nearestCellsAdaptive($c, $isFloat,
         |    $centsRef, $nProbe, $extra, ${rho}D);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCellsAdaptive =
    copy(child = c)
}

/** Johnson–Lindenstrauss sign projection: out[j] = Σ_i v[i]·s[j][i] / √k,
  * each output coordinate folded LEFT-TO-RIGHT in element order (the
  * vec_dot discipline — bit-identical to the HOF fold and the DuckDB
  * oracle's `list(... ORDER BY i)` reduce). Null on a null element or a
  * length ≠ the sign matrix's row width. Generates a static kernel call
  * so it stays inside whole-stage codegen.
  */
case class JlProject(child: Expression, signs: Seq[Seq[Byte]])
    extends UnaryExpression {
  require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
    "sign matrix must be rectangular and non-empty")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jl_project"
  // compact string form — see [[NearestCells.toString]]
  override def toString: String =
    s"$prettyName($child, signs[${signs.length}x${signs.head.length}])"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val mat: Array[Array[Byte]] =
    signs.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    VectorKernels.jlProject(input.asInstanceOf[ArrayData], isFloat, mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("jlSigns", mat, "byte[][]")
    val f = isFloat
    val out = ctx.freshName("jlOut")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $out =
        graft.functions.VectorKernels.jlProject($c, $f, $matRef);
      if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): JlProject =
    copy(child = c)
}

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  def jlProject(vec: Column, signs: Array[Array[Byte]]): Column =
    GraftShims.column(JlProject(GraftShims.expression(vec),
      signs.map(_.toSeq).toSeq))

  def norm(a: Column): Column =
    GraftShims.column(L2Norm(GraftShims.expression(a)))

  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    GraftShims.column(LshBuckets(GraftShims.expression(vec), planes, tables))

  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], m: Int): Column =
    GraftShims.column(NearestCells(GraftShims.expression(vec), centroids, m))

  def nearestCellsAdaptive(vec: Column, centroids: Seq[Seq[Double]],
      nProbe: Int, extra: Int, rho: Double): Column =
    GraftShims.column(NearestCellsAdaptive(GraftShims.expression(vec),
      centroids, nProbe, extra, rho))
}
