package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC fold: the snapshot after N micro-batches equals the batch
  * fold of the same changelogs, across stops/restarts, and readers always
  * see a committed generation.
  */
class StreamUpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def snap(dir: String): Set[(Long, String, Double)] =
    StreamUpsert.currentSnapshot(spark, dir)
      .as[(Long, String, Double)].collect().toSet

  test("per-batch fold: upserts, deletes, and cross-batch overrides land in order") {
    val dir = tmp("upsert-snap")
    val ckpt = tmp("upsert-ckpt")
    val input = MemoryStream[(Long, Long, String, Double, String)](
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Double, String)],
      spark.sqlContext)
    val changes = input.toDF().toDF("k", "seq", "s", "v", "op")
    def runOnce(): Unit = {
      val q = StreamUpsert.start(changes, dir, ckpt,
        keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op",
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    // batch 1: inserts + an intra-batch seq race (seq 2 must win on k=1)
    input.addData((1L, 1L, "a1", 1.0, "U"), (1L, 2L, "a2", 2.0, "U"),
      (2L, 1L, "b", 3.0, "U"), (3L, 1L, "c", 4.0, "U"))
    runOnce()
    assert(snap(dir) == Set((1L, "a2", 2.0), (2L, "b", 3.0), (3L, "c", 4.0)))

    // batch 2 (same checkpoint, restarted query): update k=1, delete k=2
    input.addData((1L, 3L, "a3", 5.0, "U"), (2L, 2L, "b", 3.0, "D"))
    runOnce()
    assert(snap(dir) == Set((1L, "a3", 5.0), (3L, "c", 4.0)))

    // batch 3: delete-then-reinsert within one batch (seq order decides)
    input.addData((3L, 2L, "c", 4.0, "D"), (3L, 3L, "c2", 6.0, "U"), (4L, 1L, "d", 7.0, "U"))
    runOnce()
    assert(snap(dir) == Set((1L, "a3", 5.0), (3L, "c2", 6.0), (4L, "d", 7.0)))
  }

  test("only the current and previous generations are kept; marker names the current") {
    val dir = tmp("upsert-gens")
    val ckpt = tmp("upsert-gens-ckpt")
    val input = MemoryStream[(Long, Long, String, Double, String)](
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Double, String)],
      spark.sqlContext)
    val changes = input.toDF().toDF("k", "seq", "s", "v", "op")
    for (b <- 1 to 4) {
      input.addData((b.toLong, 1L, s"s$b", b.toDouble, "U"))
      val q = StreamUpsert.start(changes, dir, ckpt,
        keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op")
      q.awaitTermination()
    }
    assert(StreamUpsert.latestGen(spark, dir).contains("gen-3"))
    val gens = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(gens == Set("gen-2", "gen-3"), s"got $gens")
    assert(snap(dir).map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("time travel: retained history serves every as-of state") {
    val dir = tmp("upsert-tt")
    val ckpt = tmp("upsert-tt-ckpt")
    val input = MemoryStream[(Long, Long, String, Double, String)](
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Double, String)],
      spark.sqlContext)
    val changes = input.toDF().toDF("k", "seq", "s", "v", "op")
    val statesSeen = scala.collection.mutable.Map[Long, Set[(Long, String, Double)]]()
    def runOnce(): Unit = {
      val q = StreamUpsert.start(changes, dir, ckpt,
        keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op",
        retain = 10)
      q.awaitTermination()
    }
    input.addData((1L, 1L, "a", 1.0, "U"), (2L, 1L, "b", 2.0, "U"))
    runOnce(); statesSeen(0L) = snap(dir)
    input.addData((1L, 2L, "a2", 3.0, "U"))
    runOnce(); statesSeen(1L) = snap(dir)
    input.addData((2L, 2L, "b", 2.0, "D"), (3L, 1L, "c", 4.0, "U"))
    runOnce(); statesSeen(2L) = snap(dir)
    assert(StreamUpsert.history(spark, dir) == Seq(0L, 1L, 2L))
    // every retained generation replays its exact point-in-time state
    for ((id, want) <- statesSeen) {
      val got = StreamUpsert.snapshotAsOf(spark, dir, id)
        .as[(Long, String, Double)].collect().toSet
      assert(got == want, s"as-of $id")
    }
    // as-of between commits resolves to the newest generation <= id
    assert(StreamUpsert.snapshotAsOf(spark, dir, 99L)
      .as[(Long, String, Double)].collect().toSet == statesSeen(2L))
    intercept[IllegalStateException] {
      StreamUpsert.snapshotAsOf(spark, dir, -1L)
    }
    // default retain=2 still prunes (the original contract holds)
    val dir2 = tmp("upsert-tt2"); val ckpt2 = tmp("upsert-tt2-ckpt")
    val in2 = MemoryStream[(Long, Long, String, Double, String)](
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Double, String)],
      spark.sqlContext)
    val ch2 = in2.toDF().toDF("k", "seq", "s", "v", "op")
    for (b <- 1 to 4) {
      in2.addData((b.toLong, 1L, s"s$b", b.toDouble, "U"))
      val q = StreamUpsert.start(ch2, dir2, ckpt2,
        keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op")
      q.awaitTermination()
    }
    assert(StreamUpsert.history(spark, dir2) == Seq(2L, 3L))
  }

  test("marker loss recovers the newest committed generation, not a cold start") {
    val dir = tmp("upsert-recover")
    val ckpt = tmp("upsert-recover-ckpt")
    val input = MemoryStream[(Long, Long, String, Double, String)](
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Double, String)],
      spark.sqlContext)
    val changes = input.toDF().toDF("k", "seq", "s", "v", "op")
    def runOnce(): Unit = {
      val q = StreamUpsert.start(changes, dir, ckpt,
        keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op",
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    input.addData((1L, 1L, "a", 1.0, "U"), (2L, 1L, "b", 2.0, "U"))
    runOnce()
    input.addData((3L, 1L, "c", 3.0, "U"))
    runOnce()
    val before = snap(dir)
    assert(before.map(_._1) == Set(1L, 2L, 3L))

    // simulate the lost-marker window (operator deletion / legacy
    // delete-then-rename crash): the snapshot must still be readable and
    // the next batch must fold into the recovered base, not an empty one
    assert(new java.io.File(dir, "_latest").delete())
    assert(StreamUpsert.latestGen(spark, dir).contains("gen-1"))
    assert(snap(dir) == before)

    input.addData((4L, 1L, "d", 4.0, "U"), (2L, 2L, "b", 2.0, "D"))
    runOnce()
    assert(snap(dir) == Set((1L, "a", 1.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    // and the marker is re-established by the fold
    assert(StreamUpsert.latestGen(spark, dir).contains("gen-2"))
  }
}
