package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** PERMISSIVE parity (default): malformed JSON → all-NULL row, exactly
    * what `from_json` + `select(data.*)` gives the reference.
    *
    * `strict = true` instead DROPS malformed rows, matching the Athena
    * query layer's `ignore.malformed.json=true` semantics
    * (docs/athena-integrity-check.md:38,44) — the parity fork flagged in
    * SURVEY §7.4.2. Spark 4's `from_json` never yields a NULL struct for
    * malformed input (it yields a struct of NULL fields), so "was this row
    * malformed" is only observable through a corrupt-record column: strict
    * mode parses with `columnNameOfCorruptRecord` and keeps rows whose
    * corrupt column is NULL. Still one parse + one null check per row,
    * stateless, scan-side, fully codegen'd.
    */
  def parse(raw: DataFrame, schema: StructType, strict: Boolean = false): DataFrame = {
    val json = raw.selectExpr("CAST(value AS STRING) AS json_str")
    if (!strict) {
      json.select(from_json(col("json_str"), schema).alias("data"))
        .select("data.*")
    } else {
      val corrupt = "_corrupt"
      require(!schema.fieldNames.contains(corrupt),
        s"schema already has a '$corrupt' column")
      val withCorrupt = schema.add(corrupt, StringType, nullable = true)
      json
        .select(from_json(col("json_str"), withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)).alias("data"))
        .filter(col(s"data.$corrupt").isNull)
        .select("data.*")
        .drop(corrupt)
    }
  }

  /** Tagged parse for dead-letter routing: like `strict` but KEEPS
    * malformed rows, marked — the schema's columns (all-NULL for a
    * malformed row) plus a `_corrupt` column carrying the raw line (NULL
    * for clean rows). `strict` DROPS malformed input, which is the right
    * query-layer parity but the wrong ingest default at scale: a feed
    * regression silently vanishes. Routing on the tag
    * ([[graft.streaming.DeadLetter]]) conserves every input row. Same
    * cost shape as the other parses: one `from_json` + projection,
    * stateless, scan-side, codegen'd.
    *
    * NULL and blank wire values (Kafka tombstones, empty lines) are
    * tagged corrupt too — `from_json` yields a NULL struct for them, so
    * without the explicit guard they would surface as "clean" all-NULL
    * rows: exactly the PERMISSIVE poisoning this parse exists to route
    * away. A NULL value quarantines as the empty string (the tag column
    * cannot carry NULL — NULL means clean). */
  def parseTagged(raw: DataFrame, schema: StructType): DataFrame = {
    val corrupt = "_corrupt"
    require(!schema.fieldNames.contains(corrupt),
      s"schema already has a '$corrupt' column")
    val withCorrupt = schema.add(corrupt, StringType, nullable = true)
    val parsed = raw.selectExpr("CAST(value AS STRING) AS json_str")
      .select(col("json_str"), from_json(col("json_str"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)).alias("data"))
    val unparsable = col("data").isNull ||
      col("json_str").isNull || trim(col("json_str")) === ""
    parsed.select(
      schema.fieldNames.toIndexedSeq.map(f => col(s"data.`$f`")) :+
        coalesce(col(s"data.`$corrupt`"),
          when(unparsable, coalesce(col("json_str"), lit("")))).as(corrupt): _*)
  }

  /** P10 (JSON serialize, kafka_streaming_service.py:203-206): the inverse
    * map — rows to one JSON text `value` per record, the wire format the
    * producer publishes. */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}
