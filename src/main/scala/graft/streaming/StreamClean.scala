package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Continuous ingest hygiene — the corpus-hygiene passes of
  * [[graft.PrepJob.prepareClean]] and [[graft.operators.Dedup.incrementalNew]]
  * re-expressed for an unbounded document stream, so arrivals are cleaned
  * BEFORE they land instead of by periodic batch sweeps:
  *
  *  1. **decontamination** — the eval set is bounded by contract, so its
  *     distinct gram hashes become a plan literal once at start; the keep
  *     decision is a row-local `arrays_overlap` probe (codegen'd, no
  *     state, no shuffle — the batch operator's broadcast join collapses
  *     into the literal, same hashes, same verdict);
  *  2. **corpus-known dedup** — stream-static left-anti join against the
  *     landed fingerprint index (stateless: re-planned per micro-batch, so
  *     an index that grows between batches is picked up on the next one);
  *  3. **in-stream dedup** — `dropDuplicatesWithinWatermark` on the
  *     16-byte content fingerprint: state holds one digest per distinct
  *     arrival inside the watermark horizon and is GC'd past it (the
  *     unbounded-key answer the batch `min_by` collapse cannot give);
  *  4. **PII redaction** — the same scan-side rewrite as batch.
  *
  * The collect in step 1 is a BOUNDED driver materialization (eval suites
  * are fixed, ≪ memory) — the same legitimacy class as the IVF centroid
  * set and the LSH plane literals, not a data collect.
  */
object StreamClean {

  /** Clean `docs` (a streaming DataFrame with `tsCol`, `idCol`, `textCol`)
    * against a static eval set and corpus fingerprint index. */
  def clean(docs: DataFrame, evalSet: DataFrame, corpusFps: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermark: String, n: Int = 8): DataFrame = {
    require(corpusFps.columns.length == 1,
      s"corpusFps must be exactly the fingerprint column, got " +
        s"[${corpusFps.columns.mkString(", ")}]")
    val evalGrams: Array[Long] = evalSet
      .select(explode(array_distinct(
        Dedup.shingleHashes(col(textCol), n))).as("gh"))
      .distinct().orderBy("gh")
      .collect().map(_.getLong(0))
    docs
      .filter(!arrays_overlap(
        array_distinct(Dedup.shingleHashes(col(textCol), n)),
        typedlit(evalGrams)))
      .withColumn("__fp", md5(col(textCol).cast("binary")))
      .join(corpusFps.select(col(corpusFps.columns.head).as("__fp")),
        Seq("__fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      .drop("__fp")
  }
}
