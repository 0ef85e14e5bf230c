package graft.operators

import graft.SparkTestBase

/** Bloom semi-join reduction: exact equivalence to the plain join under
  * any bloom sizing (false positives allowed, false negatives impossible),
  * and the prune actually prunes. */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def plain(): Set[(Long, Long, String, Double, Double)] = {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val dim = graft.sources.Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" < 0)
    ev.join(dim, ev("user_id") === dim("c_custkey"))
      .select($"event_id", $"user_id", $"c_name", $"c_acctbal", $"value")
      .as[(Long, Long, String, Double, Double)].collect().toSet
  }

  test("bloom-pruned join equals the plain join") {
    val got = BloomJoin.negBalanceActivity(spark, dir)
      .as[(Long, Long, String, Double, Double)].collect().toSet
    assert(got == plain())
    assert(got.nonEmpty, "dim filter must be non-vacuous at sf0.001")
  }

  test("a deliberately tiny (high-FP) bloom still yields the exact result") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val dim = graft.sources.Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" < 0)
      .select($"c_custkey", $"c_name", $"c_acctbal")
    // 64 bits for ~100 keys: almost every probe is a false positive —
    // the real join must still remove them all
    val got = BloomJoin.bloomPrunedJoin(ev, dim, "user_id", "c_custkey",
        expectedItems = 8, numBits = 64)
      .select($"event_id", $"user_id", $"c_name", $"c_acctbal", $"value")
      .as[(Long, Long, String, Double, Double)].collect().toSet
    assert(got == plain())
  }

  test("the scan-side prune drops non-matching fact rows before the join") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val dim = graft.sources.Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" < 0).select($"c_custkey")
    val bf = BloomJoin.buildBloom(dim, "c_custkey",
      expectedItems = 1000, numBits = 1 << 20)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    val pruned = ev.filter(Bridge.column(BloomFilterMightContain(
      Literal(bf, BinaryType),
      Bridge.expression(org.apache.spark.sql.functions.xxhash64($"user_id")))))
    val total = ev.count()
    val kept = pruned.count()
    val matched = plain().size
    assert(kept < total, s"bloom kept all $total rows — no reduction")
    assert(kept >= matched, "bloom must never drop a matching row")
  }

  test("with broadcast disabled (the at-scale shape) the prune still sits on the scan side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = BloomJoin.negBalanceActivity(spark, dir)
        .as[(Long, Long, String, Double, Double)].collect().toSet
      assert(got == plain())
      val plan = BloomJoin.negBalanceActivity(spark, dir)
        .queryExecution.executedPlan.toString
      // shuffle join (no broadcast available), and the might_contain
      // filter is still below the exchange — the rows die pre-shuffle
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "expected a shuffle join with broadcast disabled")
      assert(plan.contains("might_contain"), "bloom prune missing from the plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty dim side yields the empty join, not an error") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val dim = graft.sources.Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" < -1e18).select($"c_custkey", $"c_name", $"c_acctbal")
    assert(BloomJoin.bloomPrunedJoin(ev, dim, "user_id", "c_custkey").count() == 0L)
  }
}
