package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSource V2 user generator: bit-parity with UserGen (the same
  * derivation through the DataFrame surface), partition planning, column
  * pruning (incl. nested), and limit pushdown.
  */
class UsersSourceV2Spec extends SparkTestBase {
  import spark.implicits._

  private def read(n: Long, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.UsersSourceV2")
      .option("n", n.toString).option("numPartitions", parts.toString).load()

  private def scanOf(df: DataFrame): BatchScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }).flatMap(walk)
    walk(df.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  test("row-for-row parity with UserGen.users across partition counts") {
    val viaV2 = read(600, parts = 7)
      .select(to_json(struct(col("*"))).as("j")).as[String].collect().sorted
    val viaGen = UserGen.users(spark, 600)
      .select(to_json(struct(col("*"))).as("j")).as[String].collect().sorted
    assert(viaV2.length == 600)
    assert(viaV2.toSeq == viaGen.toSeq)
    // dirty-coordinate rule carried over: id % 97 = 0 rows are junk
    val junk = read(600).filter(col("location.coordinates.latitude") === "not-a-number").count()
    assert(junk == 7) // ids 0, 97, ..., 582
  }

  test("the id range splits into the requested number of input partitions") {
    assert(read(1000, parts = 7).rdd.getNumPartitions == 7)
    // never more partitions than rows
    assert(read(3, parts = 8).rdd.getNumPartitions <= 3)
  }

  test("column pruning reaches the scan, including nested fields") {
    val pruned = scanOf(read(100).select("email"))
    assert(pruned.scan.readSchema().fieldNames.toSeq == Seq("email"))

    val nested = scanOf(read(100).select(col("name.first")))
    val top = nested.scan.readSchema()
    assert(top.fieldNames.toSeq == Seq("name"))
    val sub = top.fields.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sub.fieldNames.toSeq == Seq("first"))
    // pruned read still yields the right values
    val firsts = read(10, parts = 2).select(col("name.first")).as[String].collect().toSet
    assert(firsts == (0 until 10).map(i => s"First$i").toSet)
  }

  test("ungrouped COUNT(*) is answered from source metadata — zero row generation") {
    // 50M rows: the description assertion below proves the scan swapped
    // to the pushed-count reader (generating 50M rows here would also be
    // unmissably slow, but wall-clock is not asserted — too flaky)
    val df = read(50000000, parts = 4)
    val counted = df.groupBy().count()
    assert(counted.as[Long].collect().head == 50000000L)
    assert(scanOf(counted).scan.description().contains("pushed-count"),
      "COUNT(*) must hit the pushed-aggregate scan")
    // grouped aggregates must NOT push (the source can't answer them)
    val grouped = read(100).groupBy("gender").count()
    assert(!scanOf(grouped).scan.description().contains("pushed-count"))
    assert(grouped.as[(String, Long)].collect().map(_._2).sum == 100L)
  }

  test("LIMIT is pushed down and caps the generated range at the source") {
    val limited = read(1000000, parts = 4).limit(5)
    assert(scanOf(limited).scan.description().contains("n=5"))
    assert(limited.count() == 5)
    // email is unique per id, so the 5 rows are ids 0..4
    assert(limited.select("email").as[String].collect().toSet ==
      (0 until 5).map(i => s"user$i@example.com").toSet)
  }
}
