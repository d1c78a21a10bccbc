package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Dump (seed, string, xxhash64) vectors for validating the DuckDB oracle's
  * SQL reimplementation of Spark's XXH64 (used by the minhash/simhash
  * dedup oracles). Run: Test/runMain graft.HashVectors
  */
object HashVectors {
  def main(args: Array[String]): Unit = {
    val strings = Seq("", "a", "ab", "abc", "abcd", "abcde", "spark graft",
      "0123456", "01234567", "012345678", "0123456789abcde",
      "0123456789abcdef", "0123456789abcdef0", "the quick brown fox",
      "0123456789abcdef0123456789abcde", "0123456789abcdef0123456789abcdef",
      "0123456789abcdef0123456789abcdef0",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z 0 1 2 3 4 5",
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor")
    val sb = new StringBuilder("seed\ts\th\n")
    for (s <- strings; seed <- (0 until 33) ++ Seq(42)) {
      val h = XxHash64Function.hash(UTF8String.fromString(s), StringType, seed.toLong)
      sb.append(s"$seed\t$s\t$h\n")
    }
    Files.writeString(Paths.get("/tmp/xxh_vectors.tsv"), sb.toString)
    println("wrote /tmp/xxh_vectors.tsv")
  }
}
