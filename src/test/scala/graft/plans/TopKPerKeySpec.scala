package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k operator: row-identical to the rank-window
  * spelling, planned as partial→exchange→final bounded heaps with no
  * SortExec anywhere.
  */
class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private def sample = (1 to 400).map { i =>
    (i.toLong, s"g${i % 7}", (i * 37 % 101).toDouble)
  }.toDF("id", "grp", "score")

  test("row-identical to the row_number window form under a total order") {
    val top = TopKPerKey(sample, Seq("grp"),
      Seq(col("score").desc, col("id").asc), k = 3)
    val viaWindow = sample.withColumn("rn",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 3).drop("rn")
    assert(top.as[(Long, String, Double)].collect().toSet ==
      viaWindow.as[(Long, String, Double)].collect().toSet)
    // every group contributes exactly k rows
    val perGroup = top.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ == 3) && perGroup.size == 7)
  }

  test("k larger than the group keeps the whole group; keyless = global top-k") {
    val tiny = Seq((1L, "a", 5.0), (2L, "a", 1.0), (3L, "b", 9.0))
      .toDF("id", "grp", "score")
    val all = TopKPerKey(tiny, Seq("grp"), Seq(col("score").desc, col("id").asc), k = 10)
    assert(all.count() == 3)
    val global = TopKPerKey(tiny, Seq.empty, Seq(col("score").desc, col("id").asc), k = 2)
    assert(global.select("id").as[Long].collect().toSet == Set(3L, 1L))
  }

  test("plans as partial+final heap execs around one exchange, with no sort") {
    val df = TopKPerKey(sample, Seq("grp"), Seq(col("score").desc, col("id").asc), 3)
    df.collect() // finalize any adaptive re-planning before inspecting
    // walk INTO adaptive query stages (collect stops at stage boundaries)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }).flatMap(walk)
    val nodes = walk(df.queryExecution.executedPlan)
    val execs = nodes.collect { case t: TopKPerKeyExec => t }
    assert(execs.map(_.finalPhase).sorted == Seq(false, true), s"got $execs")
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 1)
    assert(nodes.collect { case s: SortExec => s }.isEmpty,
      "bounded heaps must not plan a sort")
  }

  test("key-only filters push through the node into the scan; value filters stay above") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val top = TopKPerKey(events, Seq("event_type"),
      Seq(col("value").desc, col("event_id").asc), 3)

    val keyFiltered = top.filter(col("event_type") === "click")
    val opt = keyFiltered.queryExecution.optimizedPlan
    // the Filter is gone from above the node …
    assert(!opt.isInstanceOf[LFilter], s"filter not pushed:\n$opt")
    // … and reached the parquet scan as a pushed predicate
    assert(keyFiltered.queryExecution.executedPlan.toString
      .contains("EqualTo(event_type,click)"), "predicate must reach PushedFilters")
    // semantics unchanged: equals filter-after-top-k
    assert(keyFiltered.count() == 3)

    // a value predicate must NOT move below the heaps
    val valueFiltered = top.filter(col("value") > 0)
    val optV = valueFiltered.queryExecution.optimizedPlan
    assert(optV.isInstanceOf[LFilter] &&
      optV.asInstanceOf[LFilter].child.isInstanceOf[TopKPerKey],
      s"value filter must stay above the node:\n$optV")
  }

  test("partial phase bounds what crosses the shuffle to keys-in-task x k") {
    // one partition holding every row: the partial heap must cut 400 rows
    // down to 7 groups x 3 before the exchange
    val one = sample.repartition(1)
    val top = TopKPerKey(one, Seq("grp"), Seq(col("score").desc, col("id").asc), 3)
    assert(top.count() == 21)
  }
}
