package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSignature, SimHash64, WordShingles}

/** SQL surface for the engine's custom Catalyst expressions: register via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or on a
  * live session with `GraftExtensions.register(spark)`. Gives
  * `simhash64(arr)`, `minhash_signature(arr, n)`, `word_shingles(s, n)`
  * to pure-SQL users alongside the Column API (graft.functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => SimHash64(args.head)),
    "minhash_signature" -> (args =>
      MinHashSignature(args.head, intArg(args(1), "numHashes"))),
    "word_shingles" -> (args =>
      WordShingles(args.head, intArg(args(1), "n"))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
