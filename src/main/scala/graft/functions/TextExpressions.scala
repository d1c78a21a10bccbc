package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-scoring expressions (same rationale as
  * HashExpressions: the higher-order-function formulation re-walks the
  * token array once per language with an interpreted lambda per element;
  * at 100 TB that per-row overhead dominates the scan).
  */

/** Per-language marker-word scores of array<string> tokens: element i is
  * |tokens ∩ markers(i)| / max(|tokens|, 1) for the i-th language. A
  * token→language-bitmask hash lookup scores every language in ONE walk
  * of the array, instead of one filtered re-walk per language.
  *
  * `langs`/`markers` are parallel, in output order; a marker word may
  * belong to several languages (e.g. "la" in fr+es) — the bitmask
  * credits all of them.
  */
case class LangMarkerScores(child: Expression, langs: Seq[String],
    markers: Seq[Seq[String]]) extends UnaryExpression with CodegenFallback {
  require(langs.length == markers.length && langs.length <= 32,
    "one marker list per language, at most 32 languages")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lang_marker_scores"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got " +
            other.catalogString)
    }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val u = UTF8String.fromString(w)
        m.put(u, Integer.valueOf(m.getOrDefault(u, Integer.valueOf(0)).intValue() | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = lookup.getOrDefault(arr.getUTF8String(i), Integer.valueOf(0)).intValue()
        if (mask != 0) {
          var j = 0
          while (j < counts.length) {
            if ((mask & (1 << j)) != 0) counts(j) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    val denom = math.max(n, 1).toDouble
    new GenericArrayData(counts.map(_ / denom))
  }

  override protected def withNewChildInternal(c: Expression): LangMarkerScores =
    copy(child = c)
}

object TextFunctions {
  /** Column API for LangMarkerScores; `langMarkers` iterated in sorted
    * language order so the output array order is deterministic.
    */
  def langMarkerScores(tokens: Column,
      langMarkers: Map[String, Seq[String]]): Column = {
    val ordered = langMarkers.toSeq.sortBy(_._1)
    GraftShims.column(LangMarkerScores(GraftShims.expression(tokens),
      ordered.map(_._1), ordered.map(_._2)))
  }
}
