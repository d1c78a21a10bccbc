package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE tokenizer training + application (graft.text.Bpe / BpeEncode). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("learnFromDict reproduces the textbook low/lower example") {
    // Sennrich et al.'s canonical dictionary: the most frequent pair
    // merges first, integer counts weighted by word frequency
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.learnFromDict(dict, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8,
    // (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3, (e,r)=2
    // ties at 9 -> codepoint-smallest pair (e,s)
    assert(merges(0).left == "e" && merges(0).right == "s" &&
      merges(0).freq == 9L)
    // round 2: (es,t)=9 wins
    assert(merges(1).left == "es" && merges(1).right == "t" &&
      merges(1).freq == 9L)
    // round 3: (l,o)=7 and (o,w)=7 top the rest ((w,est)=6, (n,e)=6,
    // (e,w)=6) -> tie to (l,o)
    assert(merges(2) == Bpe.Merge(2, "l", "o", 7L))
    // round 4: low=[lo,w], lower=[lo,w,e,r] -> (lo,w)=7 wins
    assert(merges(3) == Bpe.Merge(3, "lo", "w", 7L))
  }

  test("applyMergePass is the greedy non-overlapping left-to-right scan") {
    def p(s: String*) = s.toArray
    assert(Bpe.applyMergePass(p("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.applyMergePass(p("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
    assert(Bpe.applyMergePass(p("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    assert(Bpe.applyMergePass(p("x"), "a", "b").toSeq == Seq("x"))
    // a merged token never re-merges as the left side within the pass
    assert(Bpe.applyMergePass(p("aa", "a", "a"), "aa", "a").toSeq ==
      Seq("aaa", "a"))
  }

  test("learner stops when no pairs remain and caps at numMerges") {
    assert(Bpe.learnFromDict(Array(("a", 3L), ("b", 2L)), 5).isEmpty)
    val m = Bpe.learnFromDict(Array(("ab", 3L)), 5)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b")))
    assert(Bpe.learnFromDict(Array(("abcd", 1L)), 2).length == 2)
  }

  test("cpCompare matches UTF-8 byte order including supplementary chars") {
    val samples = Seq("a", "b", "ab", "abc", "é", "z", "😀",
      "�", "za", "")
    def byteLt(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8").map(_ & 0xff)
      val y = b.getBytes("UTF-8").map(_ & 0xff)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        if (x(i) != y(i)) return Integer.compare(x(i), y(i))
        i += 1
      }
      Integer.compare(x.length, y.length)
    }
    for (a <- samples; b <- samples)
      assert(Integer.signum(Bpe.cpCompare(a, b)) == Integer.signum(byteLt(a, b)),
        s"cpCompare('$a','$b')")
  }

  test("encode expression flattens per-word pieces in order, skips nulls") {
    val merges = Seq(Bpe.Merge(0, "a", "b", 0L), Bpe.Merge(1, "ab", "c", 0L))
    val df = Seq(
      (1L, Seq("abc", "ab", "x")),
      (2L, Seq.empty[String])
    ).toDF("id", "tk")
    val out = df.select(col("id"), Bpe.encode(col("tk"), merges).as("enc"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("abc", "ab", "x"))
    assert(out(2L) == Seq.empty)
    // merges apply in rank order: rank 0 fuses a+b everywhere, rank 1
    // then fuses ab+c
    val df2 = Seq((1L, Seq("abab", "cab"))).toDF("id", "tk")
    val out2 = df2.select(Bpe.encode(col("tk"), merges).as("enc"))
      .as[Seq[String]].head()
    assert(out2 == Seq("ab", "ab", "c", "ab"))
  }

  test("trainMerges + tokenFrequencies conserve characters and match " +
      "a sequential re-encode") {
    val d = docs("low low lower lowest", "newest newest widest low",
      "wider lower newest")
    val merges = Bpe.trainMerges(d, "text", numMerges = 8)
    assert(merges.length == 8)
    val freq = Bpe.tokenFrequencies(d, "text", merges)
      .as[(String, Long)].collect().toMap
    // character conservation: encoded tokens cover exactly the corpus
    val totalChars = d.as[(Long, String)].collect()
      .flatMap(_._2.split("\\s+")).filter(_.nonEmpty).map(_.length).sum
    assert(freq.map { case (t, n) => t.length * n }.sum == totalChars)
    // sequential model: encode every word with the driver-side pass
    val words = d.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val expect = words.flatMap { w =>
      var p = Bpe.splitCodepoints(w)
      merges.sortBy(_.rank).foreach(m =>
        p = Bpe.applyMergePass(p, m.left, m.right))
      p
    }.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    assert(freq == expect)
  }

  test("encode is repartition-invariant and cache-consistent") {
    val d = docs("aa ab aa ab ba", "ab aa ba ba aa")
    val merges = Bpe.trainMerges(d, "text", numMerges = 3)
    val one = Bpe.tokenFrequencies(d, "text", merges)
      .as[(String, Long)].collect().toMap
    val many = Bpe.tokenFrequencies(d.repartition(7), "text", merges)
      .as[(String, Long)].collect().toMap
    assert(one == many)
  }

  test("maxVocabWords caps the dictionary deterministically") {
    val d = docs("aa aa aa bb bb cc")
    // cap 2 keeps aa (3) and bb (2); cc is cut from the dictionary
    val capped = Bpe.trainMerges(d, "text", numMerges = 1,
      maxVocabWords = 2)
    assert(capped.head == Bpe.Merge(0, "a", "a", 3L))
    val full = Bpe.trainMerges(d, "text", numMerges = 1)
    assert(full.head == Bpe.Merge(0, "a", "a", 3L))
  }

  test("guards reject bad parameters") {
    val d = docs("a b")
    intercept[IllegalArgumentException](
      Bpe.trainMerges(d, "text", numMerges = 0))
    intercept[IllegalArgumentException](
      Bpe.trainMerges(d, "text", numMerges = 1, maxVocabWords = 0))
  }
}
