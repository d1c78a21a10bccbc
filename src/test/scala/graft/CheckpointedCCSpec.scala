package graft

import java.nio.file.Files

import graft.dedup.Dedup

/** Covers Dedup.cut's reliable-checkpoint branch — the path production
  * runs take after `sparkContext.setCheckpointDir(...)` (localCheckpoint
  * stores blocks with no replication; a long CC job on a real cluster
  * wants storage-backed checkpoints). Every other suite exercises only
  * the localCheckpoint branch because the shared session has no
  * checkpoint dir until this spec sets one. NOTE: the dir cannot be
  * unset on a live SparkContext, so suites running after this one also
  * use reliable checkpoints — behavior-identical, slightly slower, and
  * closer to production.
  */
class CheckpointedCCSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents under a configured (reliable) checkpoint dir") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    assert(spark.sparkContext.getCheckpointDir.isDefined)

    // chain 1-2-3-4 plus the separate pair 10-11. smallGraphEdges = 0
    // forces the iterative rounds: this spec exists to cover their
    // reliable-checkpoint branch, which the small-graph fast path
    // would otherwise bypass on a toy graph.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, smallGraphEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))

    // the rounds must actually have produced storage-backed checkpoints
    val produced = new java.io.File(dir).listFiles()
    assert(produced != null && produced.nonEmpty,
      s"no checkpoint data written under $dir")
  }
}
