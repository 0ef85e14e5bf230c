package graft.ingest

import graft.SparkTestBase
import graft.sources.UserGen
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The producer transform (transform_user_data parity,
  * kafka_streaming_service.py:149-174) on hand-built nested payloads —
  * the test the reference's own code review asks for
  * (docs/code_review.md:18).
  */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def payload(
      title: String, first: String, last: String,
      number: Any, street: String, city: String, country: String,
      postcode: String, lat: String, lon: String,
      gender: String, email: String) = {
    val df = Seq((title, first, last, String.valueOf(number), street, city, country, postcode, lat, lon, gender, email))
      .toDF("t", "f", "l", "num", "st", "city", "country", "pc", "lat", "lon", "gender", "email")
    df.select(
      struct(col("t").as("title"), col("f").as("first"), col("l").as("last")).as("name"),
      col("gender"),
      struct(
        struct(col("num").as("number"), col("st").as("name")).as("street"),
        col("city"),
        col("country"),
        col("pc").as("postcode"),
        struct(col("lat").as("latitude"), col("lon").as("longitude")).as("coordinates"),
      ).as("location"),
      col("email"),
    )
  }

  test("happy path: concat, rename, cast, pseudonym") {
    val out = Normalize(payload(
      "Ms", "Ada", "Lovelace", 12, "High Street", "London", "UK",
      "12345", "51.5074", "-0.1278", "female", "ada@example.com")).collect().head
    assert(out.getString(0) == "Ms. Ada Lovelace")
    assert(out.getString(1) == "female")
    assert(out.getString(2) == "12, High Street")
    assert(out.getString(3) == "London")
    assert(out.getString(4) == "UK")
    // int(hashlib.md5(b"12345").hexdigest(), 16)
    assert(out.getString(5) == "173447602773428053556316684567667297915")
    assert(out.getDouble(6) == 51.5074)
    assert(out.getDouble(7) == -0.1278)
    assert(out.getString(8) == "ada@example.com")
  }

  test("safe_float: junk and empty coordinate strings become NULL, not errors") {
    val out = Normalize(payload(
      "Mr", "Bob", "Null", 1, "X", "Y", "Z", "0", "not-a-number", "", "male", "b@x")).collect().head
    assert(out.isNullAt(6), "junk latitude must be NULL")
    assert(out.isNullAt(7), "empty longitude must be NULL")
    // the rest of the record survives
    assert(out.getString(0) == "Mr. Bob Null")
    assert(out.getString(5) == "276215275525073243129443018166533317850") // md5("0")
  }

  test("output schema is the 9-column contract in order") {
    val cols = Normalize(UserGen.users(spark, 4)).columns.toSeq
    assert(cols == Seq("name", "gender", "address", "city", "nation", "zip",
      "latitude", "longitude", "email"))
  }

  test("UserGen is deterministic and feeds Normalize at scale shape") {
    val a = Normalize(UserGen.users(spark, 500)).collect()
    val b = Normalize(UserGen.users(spark, 500)).collect()
    assert(a.toSeq == b.toSeq, "generator must be reproducible")
    assert(a.length == 500)
    // the deliberate dirty coordinates produce some NULLs, not failures
    assert(a.count(r => r.isNullAt(6)) > 0)
    assert(a.count(r => r.isNullAt(7)) > 0)
    // pseudonyms are decimal strings (no hex leakage)
    assert(a.forall(r => r.getString(5).forall(_.isDigit)))
  }

  test("zip pseudonym is deterministic per postcode (join-stable pseudonymization)") {
    val twice = Normalize(UserGen.users(spark, 50)).select("zip").collect() ++
      Normalize(UserGen.users(spark, 50)).select("zip").collect()
    assert(twice.map(_.getString(0)).grouped(50).map(_.toSeq).toSeq.distinct.size == 1)
  }
}
