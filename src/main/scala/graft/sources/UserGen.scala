package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the data-acquisition stage as a Spark-native deterministic
  * generator.
  *
  * The reference's producer polls an HTTP API for one record per tick and
  * falls back to a synthetic record on failure
  * (dags/producer/kafka_streaming_service.py:113-130, fallback :37-59).
  * An HTTP poll is not a Spark source there either — it feeds Kafka. The
  * engine-side equivalent is this generator: nested randomuser-shaped
  * payloads derived purely from `spark.range(n)` + seeded hashes, so it is
  * deterministic, stateless, and scales to any n with no driver loop —
  * each executor materializes its own range slice.
  */
object UserGen {

  private val titles = Seq("Mr", "Ms", "Dr", "Mx")
  private val streets = Seq("High Street", "Station Road", "Main Street", "Park Avenue", "Mill Lane")
  private val cities = Seq("Springfield", "Riverton", "Lakeside", "Hillview", "Brookfield")
  private val countries = Seq("Utopia", "Erewhon", "Atlantis", "Arcadia")

  private def pick(options: Seq[String], h: Column): Column =
    element_at(array(options.map(lit): _*), (pmod(h, lit(options.size)) + 1).cast("int"))

  /** n nested user records. ~1/97 of coordinate strings are deliberately
    * non-numeric junk (exercises the safe-float → NULL path), mirroring
    * real API dirt the reference's `safe_float` exists for. */
  def users(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    // mask, not abs: abs(Long.MinValue) is still negative (the 2^-64 hash
    // edge), which would make pick()'s pmod index negative; clearing the
    // sign bit is total. UsersSourceV2's native reader masks identically.
    def h(salt: Int): Column = xxhash64(id, lit(seed), lit(salt)).bitwiseAND(lit(Long.MaxValue))

    val latRaw = when(pmod(id, lit(97)) === 0, lit("not-a-number"))
      .otherwise(format_string("%.4f", pmod(h(6), lit(180000)).cast("double") / 1000.0 - 90.0))
    val lonRaw = when(pmod(id, lit(89)) === 0, lit(""))
      .otherwise(format_string("%.4f", pmod(h(7), lit(360000)).cast("double") / 1000.0 - 180.0))

    spark.range(n).select(
      struct(
        pick(titles, h(1)).as("title"),
        concat(lit("First"), id).as("first"),
        concat(lit("Last"), pmod(h(2), lit(1000))).as("last"),
      ).as("name"),
      pick(Seq("male", "female"), h(3)).as("gender"),
      struct(
        struct(
          (pmod(h(4), lit(9999)) + 1).as("number"),
          pick(streets, h(5)).as("name"),
        ).as("street"),
        pick(cities, h(8)).as("city"),
        pick(countries, h(9)).as("country"),
        format_string("%05d", pmod(h(10), lit(100000))).as("postcode"),
        struct(latRaw.as("latitude"), lonRaw.as("longitude")).as("coordinates"),
      ).as("location"),
      concat(lit("user"), id, lit("@example.com")).as("email"),
    )
  }
}
