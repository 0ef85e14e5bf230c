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

  test("salted equi-join is row-identical to the plain join, including a hot key") {
    val rng = new scala.util.Random(11)
    val facts = (1 to 2000).map { i =>
      val key = if (rng.nextDouble() < 0.9) 7L else rng.nextInt(50).toLong
      (i.toLong, key, rng.nextInt(100).toDouble)
    }.toDF("fact_id", "k", "v")
    // dim with dup keys too (2 rows for key 7): join multiplicity must hold
    val dim = ((0L until 50L).map(k => (k, s"dim_$k")) :+ ((7L, "dim_7b")))
      .toDF("dk", "name")
    val plain = facts.join(dim, facts("k") === dim("dk"))
      .select("fact_id", "k", "name").as[(Long, Long, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    val salted = SaltedAgg.saltedEquiJoin(facts, dim, "k", "dk", salts = 8)
      .select("fact_id", "k", "name").as[(Long, Long, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }
}
