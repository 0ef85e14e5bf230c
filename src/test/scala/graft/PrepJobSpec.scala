package graft

import org.apache.spark.sql.functions._

/** The composed preparation pipeline: survivors pass the quality filter,
  * contain no exact or planted near-duplicates, and land partitioned.
  */
class PrepJobSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("prepare: survivors are unique, quality-passing, near-dup-free") {
    val out = PrepJob.prepare(spark, dir)
    val rows = out.select("doc_id").as[Long].collect()
    assert(rows.nonEmpty)
    assert(rows.distinct.length == rows.length, "doc_ids must be unique")
    // every survivor passes the quality rules
    val keepIds = graft.operators.TextAnalysis.qualityFilter(spark, dir)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(rows.forall(keepIds), "all survivors must pass the quality filter")
    // no exact-content duplicates survive
    val nFp = out.select(graft.functions.GraftFunctions.docFingerprint(col("text")))
      .distinct().count()
    assert(nFp == rows.length, "exact-duplicate content must be gone")
  }

  test("prepareChunksPacked: manifest covers exactly the survivors' chunks, packs within budget") {
    val budget = 256
    val manifest = PrepJob.prepareChunksPacked(spark, dir, budget = budget)
      .as[(Long, Int, Long, Int, Int, String)].collect()
    assert(manifest.nonEmpty)
    // coverage: exactly the chunks of the prepared survivors, text intact
    val wantChunks = graft.operators.TextAnalysis
      .chunkDocsOf(PrepJob.prepare(spark, dir))
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().toSet
    assert(manifest.map(r => (r._3, r._4, r._6)).toSet == wantChunks)
    // packing invariants on the manifest itself
    manifest.groupBy(_._1).foreach { case (pid, rows) =>
      assert(rows.map(_._5).sum <= budget || rows.length == 1, s"pack $pid over budget")
      assert(rows.map(_._2).sorted.toSeq == (0 until rows.length), s"pack $pid positions")
    }
  }

  test("prepareMixed: subset of prepare, smallest language kept whole, deterministic") {
    val base = PrepJob.prepare(spark, dir)
    val baseRows = base.select("doc_id", "lang")
      .as[(Long, String)].collect()
    val mixed = PrepJob.prepareMixed(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(mixed.toSet.subsetOf(baseRows.toSet), "mix must only remove rows")
    val baseByLang = baseRows.groupBy(_._2).view.mapValues(_.length).toMap
    val mixByLang = mixed.groupBy(_._2).view.mapValues(_.length).toMap
    val minLang = baseByLang.minBy(_._2)._1
    assert(mixByLang.getOrElse(minLang, 0) == baseByLang(minLang),
      "rate-1 (smallest) language must keep every doc")
    val again = PrepJob.prepareMixed(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(again.toSet == mixed.toSet)
  }

  test("run lands the survivors partitioned by lang") {
    val outPath = java.nio.file.Files.createTempDirectory("prep_out_").toString
    val n = PrepJob.run(spark, dir, outPath)
    assert(n > 0)
    val partDirs = new java.io.File(outPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(partDirs.length > 1, s"expected lang partitions, got ${partDirs.toSeq}")
    assert(spark.read.parquet(outPath).count() == n)
  }

  test("prepareClean: eval-overlapping survivors drop, PII redacts in place, others untouched") {
    val base = PrepJob.prepare(spark, dir)
    val survivors = base.select("doc_id").as[Long].collect().sorted
    assert(survivors.length > 2)
    // eval set = the text of one surviving doc (plus planted PII to prove
    // redaction happens in the same pass)
    val evalId = survivors.head
    val evalSet = base.filter(col("doc_id") === evalId).select("doc_id", "text")
    val clean = PrepJob.prepareClean(spark, dir, evalSet)
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    assert(!cleanIds.contains(evalId), "the eval-overlapping doc must drop")
    assert(cleanIds == survivors.toSet - evalId, "no other doc may drop")
    // the synthetic corpus has no PII, so redaction must be the identity
    val before = base.filter(col("doc_id") =!= evalId)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val after = clean.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(after == before, "redaction changed PII-free text")
    // and on planted PII it rewrites in place
    val red = spark.range(1).select(
        graft.operators.TextAnalysis.redactPii(
          org.apache.spark.sql.functions.lit("mail a@b.io or 555-1234 now")).as("t"))
      .as[String].collect().head
    assert(red == "mail <EMAIL> or <PHONE> now")
  }

  test("near-dup removal: planted copies drop, pairs keep at most one side") {
    val docs = graft.operators.Dedup.plantedNearDocs(spark, dir)
    val cleaned = graft.operators.Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val planted = docs.filter(col("doc_id") >= 1000000L).select("doc_id").as[Long].collect()
    assert(planted.nonEmpty)
    // a planted copy always pairs with its (smaller-id) original → dropped
    assert(planted.forall(p => !cleaned.contains(p)), "planted copies must be dropped")
    // operator invariants against the independently-tested pair finder:
    // no surviving pair, and every unpaired doc survives
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(!(cleaned.contains(a) && cleaned.contains(b)), s"pair ($a,$b) both survived")
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert((all -- inPairs).forall(cleaned), "docs in no pair must all survive")
  }
}
