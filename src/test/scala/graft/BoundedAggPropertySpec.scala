package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BucketMember, SmallestKLongsAgg, SmallestKMembersAgg, TopKAgg}

/** Property tests for the bounded aggregators that guard the 100 TB
  * memory contract (SmallestK* bucket membership, TopKAgg ranking).
  * Their merge paths are exactly the code a unit example under-exercises:
  * Spark may split the input into any partitioning, partially reduce each
  * split, and merge the partials in any order. Here every sample is run
  * through a RANDOM chunking + random-order pairwise merge (plus empty
  * partials, which Spark produces for empty partitions) and compared to
  * an independently-written reference model:
  *  - SmallestK* ≡ distinct-sorted-take-k — for unique keys that is
  *    bit-identical to slice(sort_array(collect_list(...)), 1, k);
  *  - TopKAgg ≡ the ranking-window formulation over per-id best scores,
  *    including duplicate ids with perturbed score copies (AQE retry).
  * Raw ScalaCheck generators with fixed seeds (the scalatest bridge is
  * not in the offline dependency set), mirroring PropertySpec.
  */
class BoundedAggPropertySpec extends AnyFunSuite {

  /** Reduce random chunks (incl. empty ones) then merge partials in
    * random pair order — the space of executions Spark can choose.
    */
  private def simulate[I, B, O](
      agg: org.apache.spark.sql.expressions.Aggregator[I, B, O],
      items: List[I], rnd: scala.util.Random): O = {
    val chunks = scala.collection.mutable.ListBuffer[List[I]](Nil, Nil)
    var rest = items
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(rest.size)
      chunks += rest.take(n)
      rest = rest.drop(n)
    }
    var buffers = rnd.shuffle(chunks.toList)
      .map(c => c.foldLeft(agg.zero)(agg.reduce))
    while (buffers.size > 1) {
      val i = rnd.nextInt(buffers.size - 1)
      buffers = buffers.patch(i, List(agg.merge(buffers(i), buffers(i + 1))), 2)
    }
    agg.finish(buffers.head)
  }

  private def samples[T](gen: Gen[T], count: Int): Seq[(T, scala.util.Random)] =
    (1 to count).flatMap { i =>
      gen.apply(Gen.Parameters.default, Seed(4242L + i))
        .map(v => (v, new scala.util.Random(9000L + i)))
    }

  // ------------------------------------------------------- SmallestK*

  private val longsGen: Gen[(Int, List[Long])] = for {
    k <- Gen.choose(1, 10)
    n <- Gen.choose(0, 80)
    xs <- Gen.listOfN(n, Gen.choose(-100L, 100L)) // narrow range → dup-heavy
  } yield (k, xs)

  test("SmallestKLongsAgg ≡ slice(sort_array(collect_list)) on unique keys, " +
      "any partitioning") {
    samples(longsGen, 300).foreach { case ((k, xs0), rnd) =>
      val xs = xs0.distinct // the documented unique-keys contract
      val got = simulate(new SmallestKLongsAgg(k), rnd.shuffle(xs), rnd)
      assert(got == xs.sorted.take(k), s"k=$k xs=$xs")
    }
  }

  test("SmallestKLongsAgg dedups duplicate keys (documented deviation " +
      "from collect_list)") {
    samples(longsGen, 300).foreach { case ((k, xs), rnd) =>
      val got = simulate(new SmallestKLongsAgg(k), xs, rnd)
      assert(got == xs.distinct.sorted.take(k), s"k=$k xs=$xs")
    }
  }

  private val membersGen: Gen[(Int, List[BucketMember])] = for {
    k <- Gen.choose(1, 10)
    n <- Gen.choose(0, 60)
    ids <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    fps <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
  } yield (k, ids.distinct.zip(fps).map { case (i, f) => BucketMember(i, f) })

  test("SmallestKMembersAgg ≡ sorted-take-k on unique ids, any partitioning") {
    samples(membersGen, 300).foreach { case ((k, ms), rnd) =>
      val got = simulate(new SmallestKMembersAgg(k), rnd.shuffle(ms), rnd)
      val want = ms.sortBy(m => (m.id, m.fp)).take(k)
      assert(got == want, s"k=$k ms=$ms")
    }
  }

  // ---------------------------------------------------------- TopKAgg

  /** Spark SQL double ordering, re-derived independently of TopKAgg:
    * NaN greatest, -0.0 == 0.0.
    */
  private def scoreCmp(a: Double, b: Double): Int =
    if (a.isNaN && b.isNaN) 0
    else if (a.isNaN) 1
    else if (b.isNaN) -1
    else java.lang.Double.compare(a + 0.0, b + 0.0) match {
      case c if a == b => 0 // collapses -0.0 vs 0.0
      case c => c
    }

  /** The ranking-window formulation over per-id best scores: the model
    * TopKAgg must reproduce (window over pre-deduped candidates).
    */
  private def windowModel(cands: List[(Double, Long)],
      k: Int): List[(Double, Long)] = {
    val bestPerId = cands.groupBy(_._2).values.map(
      _.reduceLeft((x, y) => if (scoreCmp(y._1, x._1) > 0) y else x)).toList
    bestPerId.sortWith { (x, y) =>
      val c = scoreCmp(x._1, y._1)
      if (c != 0) c > 0 else x._2 < y._2
    }.take(k)
  }

  private val topkGen: Gen[(Int, List[(Double, Long)])] = for {
    k <- Gen.choose(1, 8)
    n <- Gen.choose(0, 50)
    cands <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 15L) // narrow id space → duplicate-heavy
      s <- Gen.choose(-1.0, 1.0)
    } yield (s, id))
    nDup <- Gen.choose(0, 10)
    // perturbed copies of existing candidates — the AQE-retry scenario
    // where a recomputed duplicate's score is not bit-identical
    dups = cands.take(nDup).map { case (s, id) => (s + 1e-3, id) }
  } yield (k, cands ++ dups)

  test("TopKAgg ≡ ranking-window model with duplicate/perturbed ids, " +
      "any partitioning") {
    samples(topkGen, 300).foreach { case ((k, cands), rnd) =>
      val got = simulate(new TopKAgg(k), rnd.shuffle(cands), rnd)
      val want = windowModel(cands, k)
      assert(got.map(_._2) == want.map(_._2), s"ids diverge: k=$k cands=$cands")
      got.zip(want).foreach { case (g, w) =>
        assert(scoreCmp(g._1, w._1) == 0,
          s"score diverges for id ${g._2}: ${g._1} vs ${w._1}")
      }
    }
  }

  test("charHist64 L1/2 lower-bounds levenshtein (the prune is lossless)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.HashKernels
    val strGen = for {
      n <- Gen.choose(0, 40)
      s <- Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', 'ß', '€')))
    } yield s.mkString
    samples(Gen.zip(strGen, strGen), 500).foreach { case ((a, b), _) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val l1 = HashKernels.longArrayL1(
        HashKernels.charHist64(ua), HashKernels.charHist64(ub))
      val ed = ua.levenshteinDistance(ub)
      assert(l1 <= 2L * ed, s"bound violated: l1=$l1 ed=$ed a='$a' b='$b'")
    }
  }

  test("TopKAgg edge ordering: NaN ranks first, -0.0 ties 0.0 on id") {
    val cands = List((0.0, 5L), (-0.0, 3L), (Double.NaN, 9L), (0.5, 1L))
    val rnd = new scala.util.Random(7L)
    val got = simulate(new TopKAgg(3), cands, rnd)
    assert(got.map(_._2) == List(9L, 1L, 3L)) // NaN first; -0.0==0.0 → id asc
  }
}
