package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The stream-processor parse stage (reference `transform_streaming_data`,
  * spark/app/spark_processing.py:131-148): CAST the source's binary/string
  * `value` to string, parse JSON against a declared schema, flatten.
  *
  * Works identically on batch and streaming DataFrames — the operator is a
  * stateless per-row map, so at 100 TB it is pure scan-side compute with no
  * shuffle and full whole-stage codegen (from_json is a codegen'd
  * expression; the projection fuses with the scan).
  */
object Parse {

  /** PERMISSIVE parity (default): malformed JSON → NULL struct → all-NULL
    * row, exactly what `from_json` + `select(data.*)` gives the reference.
    *
    * `strict = true` instead DROPS malformed rows, matching the Athena
    * query layer's `ignore.malformed.json=true` semantics
    * (docs/athena-integrity-check.md:38,44) — the parity fork flagged in
    * SURVEY §7.4.2. The filter runs on the parsed struct before
    * flattening, so it costs one null check per row, no extra parse.
    */
  def parse(raw: DataFrame, schema: StructType, strict: Boolean = false): DataFrame = {
    val parsed = raw
      .selectExpr("CAST(value AS STRING) AS json_str")
      .select(from_json(col("json_str"), schema).alias("data"))
    val kept = if (strict) parsed.filter(col("data").isNotNull) else parsed
    kept.select("data.*")
  }

  /** P10 (JSON serialize, kafka_streaming_service.py:203-206): the inverse
    * map — rows to one JSON text `value` per record, the wire format the
    * producer publishes. */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
