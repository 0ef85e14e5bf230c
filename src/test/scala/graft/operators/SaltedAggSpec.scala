package graft.operators

import graft.SparkTestBase

/** Salted two-phase aggregation must be value-identical to the plain
  * group-by — salting only changes row distribution, never results.
  */
class SaltedAggSpec extends SparkTestBase {
  import spark.implicits._

  test("salted count+sum equals plain groupBy, including a hot key") {
    val rng = new scala.util.Random(5)
    // 90% of rows on one hot key — the shape that motivates salting
    val rows = (1 to 2000).map { i =>
      val key = if (rng.nextDouble() < 0.9) 7L else rng.nextInt(50).toLong
      (key, rng.nextInt(10).toDouble) // integral doubles: sums are exact
    }
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sum"))
      .as[(Long, Long, Double)].collect().toSet
    val salted = SaltedAgg.countSumByKey(df, "k", "v")
      .as[(Long, Long, Double)].collect().toSet
    assert(salted == plain)
  }
}
