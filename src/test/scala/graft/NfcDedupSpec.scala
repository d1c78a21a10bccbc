package graft

import graft.dedup.Dedup
import graft.functions.UnicodeFunctions
import org.apache.spark.sql.functions._

/** Unicode-NFC exact-dedup canonicalization: composed vs decomposed
  * accents must land in the same fingerprint group (they do NOT under
  * the plain ASCII-strip fingerprint — that is the bug this closes).
  */
class NfcDedupSpec extends SparkTestBase {
  import spark.implicits._

  // the same content three ways; composed/decomposed render alike but
  // differ in bytes (00e9 vs 65+0301)
  private val composed = "résumé of the café engineer"
  private val decomposed = "résumé of the café engineer"
  private val ascii = "resume of the cafe engineer"

  test("nfc expression: composes decomposed text, fixpoint on NFC/ASCII, " +
      "null-safe, interpreted == codegen") {
    val df = Seq(Some(decomposed), Some(composed), Some(ascii), None)
      .toDF("s")
    val out = df.select(UnicodeFunctions.nfc(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some(composed)) // composed, not just unchanged
    assert(out(1) === Some(composed))
    assert(out(2) === Some(ascii))
    assert(out(3) === None)
    // interpreted path (no codegen) must agree bit-for-bit
    val interp = df.filter(col("s").isNotNull)
      .select(UnicodeFunctions.nfc(col("s")).as("n"))
    interp.queryExecution.executedPlan // force planning either way
    val viaEval = Seq(decomposed, composed, ascii).map { s =>
      graft.functions.NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        .eval(null).toString
    }
    assert(viaEval === Seq(composed, composed, ascii))
  }

  test("exactDupGroupsNfc merges unicode-form twins that the plain " +
      "fingerprint splits") {
    val docs = Seq(
      (1L, composed), (2L, decomposed), (3L, ascii),
      (4L, "unrelated text")).toDF("id", "text")
    // the plain fingerprint SPLITS the unicode-form pair 1/2: the
    // composed form's accented chars strip whole ("rsum ... caf"),
    // while the decomposed form keeps its base letters — which ALSO
    // makes 2 falsely alias the unaccented doc 3 ("resume ... cafe")
    val plain = Dedup.exactDupGroups(docs, "id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(plain === Set((1L, 1L), (2L, 2L), (4L, 1L)))
    val nfc = Dedup.exactDupGroupsNfc(docs, "id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // under NFC: 1 and 2 are byte-identical after composition; 3 stays
    // separate (accents are real content once composed: "rsum"/"caf"
    // vs "resume"/"cafe")
    assert(nfc === Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }
}
