package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Joins

/** SQL table-valued surface for the whole-relation join operators the
  * expression registry cannot carry (they produce a plan, not a column):
  *
  * {{{
  * SELECT * FROM asof_join('trades', 'quotes', 'ticker', 't', 't')
  * SELECT * FROM asof_join('trades', 'quotes', 'ticker', 't', 't',
  *                         'forward', 5000000)   -- direction, tolerance µs
  * SELECT * FROM range_join('events', 'ts', 'windows', 'w_start', 'w_end',
  *                          60)                  -- bucket seconds
  * SELECT * FROM range_join('events', 'ts', 'windows', 'w_start', 'w_end',
  *                          60, 'ticker')        -- + equi-keys
  * }}}
  *
  * Table arguments are names resolved against the calling session's
  * catalog (temp views included) at analysis time; key lists are
  * comma-separated. The plan each call returns IS the plan the Scala
  * operator builds — the one-shuffle union+window as-of formulation and
  * the bucket-exploded range join — so the SQL surface inherits the same
  * scale contract (no pair explosion, fan-out guard included;
  * SqlTableFunctionsSpec pins SQL-vs-Scala parity).
  *
  * Registered by [[graft.GraftExtensions]] alongside the scalar
  * expressions — via `withExtensions` (injectTableFunction) or
  * `GraftExtensions.register(spark)` on a live session.
  */
object TableFunctions {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def lng(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def keyList(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def arity(name: String, args: Seq[Expression], lo: Int,
      hi: Int): Unit =
    if (args.length < lo || args.length > hi)
      throw new IllegalArgumentException(
        s"$name expects $lo to $hi arguments, got ${args.length}")

  /** name -> builder, shape-compatible with both
    * `SparkSessionExtensions.injectTableFunction` and
    * `tableFunctionRegistry.createOrReplaceTempFunction`. The builder
    * runs on the driver during analysis: it resolves the named tables on
    * the active session, delegates to the Scala operator, and hands the
    * analyzed subplan to the outer query.
    */
  val registrations: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "asof_join" -> (args => {
      arity("asof_join", args, 5, 7)
      val spark = SparkSession.active
      val direction =
        if (args.length >= 6) str(args(5), "direction") else "backward"
      val tolerance =
        if (args.length == 7) Some(lng(args(6), "tolerance_us")) else None
      Joins.asofJoin(
        spark.table(str(args(0), "left table name")),
        spark.table(str(args(1), "right table name")),
        keyList(str(args(2), "key list")),
        str(args(3), "left time column"),
        str(args(4), "right time column"),
        direction, tolerance).queryExecution.analyzed
    }),
    "range_join" -> (args => {
      arity("range_join", args, 6, 7)
      val spark = SparkSession.active
      val extraKeys =
        if (args.length == 7) keyList(str(args(6), "key list")) else Nil
      Joins.rangeJoin(
        spark.table(str(args(0), "probe table name")),
        str(args(1), "probe time column"),
        spark.table(str(args(2), "interval table name")),
        str(args(3), "interval start column"),
        str(args(4), "interval end column"),
        lng(args(5), "bucket seconds"),
        extraKeys).queryExecution.analyzed
    }))
}
