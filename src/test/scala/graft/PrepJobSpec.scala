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

  private val benchEval =
    Seq("graft eval suite sentinel eight gram window text").toDF("text")

  private def shardRows(seed: String, outShards: Int) = PrepJob
    .trainingShards(spark, dir, benchEval, epochSeed = seed, outShards = outShards)
    .select("shard", "pos", "pack_id", "pack_pos",
      "doc_id", "chunk_id", "n_tokens", "chunk_text")
    .as[(Int, Long, Long, Int, Long, Int, Int, String)].collect()

  test("trainingShards: chunk/token conservation, budget, epoch-pos permutation, balanced shards") {
    val outShards = 4
    val rows = shardRows("epoch0", outShards)
    assert(rows.nonEmpty)
    // conservation: exactly the chunks of the clean+mixed document set,
    // each exactly once, text and token counts intact
    val want = graft.operators.TextAnalysis
      .chunkDocsOf(PrepJob.cleanMixed(spark, dir, benchEval))
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect()
    assert(rows.length == want.length, "every chunk exactly once")
    assert(rows.map(r => (r._5, r._6, r._7, r._8)).toSet == want.toSet)
    assert(rows.map(_._7.toLong).sum == want.map(_._3.toLong).sum,
      "token conservation")
    // packing invariants survive the composition
    rows.groupBy(_._3).foreach { case (pid, rs) =>
      assert(rs.map(_._7).sum <= 256 || rs.length == 1, s"pack $pid over budget")
      assert(rs.map(_._4).sorted.toSeq == (0 until rs.length), s"pack $pid positions")
      assert(rs.map(_._2).distinct.length == 1, s"pack $pid has one epoch pos")
      assert(rs.map(_._1).distinct.length == 1, s"pack $pid has one shard")
    }
    // pos is an exact permutation of [0, nPacks); shard = pos mod outShards
    val packs = rows.map(r => (r._3, r._2, r._1)).distinct
    assert(packs.map(_._2).sorted.toSeq == (0L until packs.length.toLong),
      "epoch positions must be a 0-based permutation over packs")
    assert(packs.forall(p => p._3 == p._2 % outShards), "shard = pos mod outShards")
    val perShard = packs.groupBy(_._3).view.mapValues(_.length)
    assert(perShard.values.max - perShard.values.min <= 1,
      "round-robin shards balanced to ±1 pack")
  }

  test("trainingShards: same seed reproduces exactly, new seed permutes the epoch order") {
    val rows = shardRows("epoch0", 4)
    assert(shardRows("epoch0", 4).toSet == rows.toSet, "epoch order must be deterministic")
    val other = shardRows("epoch1", 4)
    // identical content, different pack → pos assignment
    assert(other.map(r => (r._5, r._6, r._8)).toSet ==
      rows.map(r => (r._5, r._6, r._8)).toSet)
    assert(other.map(r => (r._3, r._2)).toSet != rows.map(r => (r._3, r._2)).toSet,
      "a new epoch seed must reshuffle the pack order")
  }

  test("runFull: landed shards equal the DataFrame form, files ordered by (pos, pack_pos)") {
    val outPath = java.nio.file.Files.createTempDirectory("prep_full_").toString
    val outShards = 4
    val n = PrepJob.runFull(spark, dir, benchEval, outPath, outShards = outShards)
    val landed = spark.read.parquet(outPath)
    assert(landed.count() == n)
    val got = landed
      .select(col("shard").cast("int"), col("pos"), col("pack_id"), col("pack_pos"),
        col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))
      .as[(Int, Long, Long, Int, Long, Int, Int, String)].collect()
    assert(got.toSet == shardRows("epoch0", outShards).toSet)
    // per-shard physical order: at this size each shard is one file/one
    // read partition, so collect order is file order — must be the epoch
    // sequence a loader replays sequentially
    (0 until outShards).foreach { s =>
      val inFile = landed.filter(col("shard") === s)
        .select("pos", "pack_pos").as[(Long, Int)].collect()
      assert(inFile.sameElements(inFile.sortBy(r => (r._1, r._2))),
        s"shard $s not landed in (pos, pack_pos) order")
    }
  }

  test("multimodalShards: every pack lands whole and in epoch order; reruns identical") {
    val outPath = java.nio.file.Files.createTempDirectory("prep_mm_").toString
    val outShards = 4
    val n = PrepJob.runMultimodal(spark, dir, outPath, outShards = outShards)
    val landed = spark.read.parquet(outPath)
    assert(landed.count() == n && n > 0)
    val rows = landed
      .select(col("shard").cast("int"), col("pos"), col("pack_id"),
        col("pack_pos"), col("doc_id"), col("cost"))
      .as[(Int, Long, Long, Int, Long, Long)].collect()
    // one row per document (whole samples pack)
    assert(rows.map(_._5).distinct.length == rows.length)
    // a pack's rows share one (pos, shard); shard = pos mod outShards
    rows.groupBy(_._3).values.foreach { pack =>
      assert(pack.map(_._2).distinct.length == 1)
      assert(pack.forall(r => r._1 == (r._2 % outShards).toInt))
    }
    // shards balanced to ±1 pack by construction
    val perShard = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.length)
    assert(perShard.values.max - perShard.values.min <= 1, s"$perShard")
    // deterministic: rerun lands the identical manifest
    val again = PrepJob.multimodalShards(spark, dir, outShards = outShards)
      .as[(Int, Long, Long, Int, Long, Long)].collect().toSet
    assert(again == rows.toSet)
  }

  test("cleanMixed domain balance: cap then budget then mix, each cut over the previous stage") {
    val cap = 2
    val budget = 60L
    val got = PrepJob.cleanMixed(spark, dir, benchEval,
        sourceCap = cap, tokenBudget = budget)
      .select("doc_id").as[Long].collect().toSet
    // the hand-assembled composition over the same intermediates
    val base = PrepJob.prepareClean(spark, dir, benchEval)
    val capped = base.join(
      graft.operators.TextAnalysis.sourceCap(base, cap).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val budgeted = capped.join(
      graft.operators.TextAnalysis.budgetCap(capped, "doc_id", "text",
        "source", budget).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val want = budgeted.join(
      graft.operators.TextAnalysis.temperatureMix(budgeted, "lang", "doc_id")
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < base.count(),
      "the balance stages must bind")
    // the cap held per source
    val perSource = PrepJob.cleanMixed(spark, dir, benchEval,
        sourceCap = cap, tokenBudget = budget)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(perSource.forall(_._2 <= cap), s"got ${perSource.toSeq}")
    // defaults stay the established pipeline
    val plain = PrepJob.cleanMixed(spark, dir, benchEval)
      .select("doc_id").as[Long].collect().toSet
    val wantPlain = base.join(
      graft.operators.TextAnalysis.temperatureMix(base, "lang", "doc_id")
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(plain == wantPlain)
  }
}
