package graft.ingest

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The producer's record-level normalization/pseudonymization transform
  * (reference `transform_user_data`,
  * dags/producer/kafka_streaming_service.py:149-174) as native columnar
  * Spark ops over the nested API payload shape:
  *
  *   name:     "{title}. {first} {last}"                        (P4)
  *   address:  "{street.number}, {street.name}"                 (P5)
  *   city/nation/email/gender: flatten + rename                 (P6, P9)
  *   zip:      str(int(md5(str(postcode)).hexdigest(), 16))     (P7)
  *   latitude/longitude: float(x) or NULL                       (P8)
  *
  * Semantics deltas from the Python original, on purpose:
  *  - a missing/NULL struct field yields a NULL output column (SQL's
  *    graceful analogue of Python's KeyError crash);
  *  - `safe_float` is `try_cast(… AS DOUBLE)` — NULL on failure, exactly
  *    `float(x) → None` (ANSI mode is on in Spark 4, so a plain cast
  *    would throw instead);
  *  - the zip pseudonym uses [[GraftFunctions.md5Pseudonym]] (128-bit
  *    BigInt decimal), NOT `conv(md5(x),16,10)` which silently wraps at
  *    64 bits — SURVEY §7.4.1's parity trap.
  *
  * Stateless per-row map: no shuffle, fully codegen'd, scan-fused — the
  * same shape at 1 GB and 100 TB.
  */
object Normalize {

  /** Input shape: the randomuser-style nested payload
    * (kafka_streaming_service.py:47-59): struct columns `name{title,first,
    * last}`, `location{street{number,name},city,country,postcode,
    * coordinates{latitude,longitude}}`, plus `gender`, `email`. */
  def apply(raw: DataFrame): DataFrame =
    raw.select(
      concat(col("name.title"), lit(". "), col("name.first"), lit(" "), col("name.last"))
        .as("name"),
      col("gender"),
      concat(col("location.street.number").cast("string"), lit(", "), col("location.street.name"))
        .as("address"),
      col("location.city").as("city"),
      col("location.country").as("nation"),
      GraftFunctions.md5Pseudonym(col("location.postcode")).as("zip"),
      expr("try_cast(location.coordinates.latitude AS DOUBLE)").as("latitude"),
      expr("try_cast(location.coordinates.longitude AS DOUBLE)").as("longitude"),
      col("email"),
    )
}
