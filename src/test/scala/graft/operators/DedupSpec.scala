package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, md5}

/** Dedup operators on hand-built corpora with planted duplicates — recall
  * of every planted pair, no false pairs on unrelated rows.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exactKeepFirst keeps the earliest (ts, event_id) per user") {
    val events = Seq(
      (3L, Timestamp.valueOf("2024-01-01 10:00:00"), 10L, "late", 3.0),
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 10L, "first", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 11L, "only", 2.0),
      (5L, Timestamp.valueOf("2024-01-01 09:00:00"), 12L, "tie_hi", 5.0),
      (4L, Timestamp.valueOf("2024-01-01 09:00:00"), 12L, "tie_lo", 4.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Dedup.exactKeepFirst(events)
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((10L, 1L, "first"), (11L, 2L, "only"), (12L, 4L, "tie_lo")))
  }

  import graft.TestDocs.doc

  test("minhashLshPairs recalls planted near-dups and rejects unrelated docs") {
    val base = (1 to 20).map(i => (i.toLong, doc(i)))
    // near-dup of doc 3: one appended word (~0.97 shingle Jaccard)
    val planted = (103L, doc(3) + " extra")
    val docs = (base :+ planted).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 103L)), s"planted pair missing from $pairs")
    assert(pairs.size == 1, s"false positives: ${pairs - ((3L, 103L))}")
  }

  test("keepBestPerCluster keeps the top-scoring doc per component; singletons keep themselves") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0), // chain 1~2~3 → component 1, keep 2
      (4L, 5.0), (5L, 5.0),               // pair 4~5, tie → keep min id 4
      (6L, 1.0),                          // in no pair → singleton survivor
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.keepBestPerCluster(docs, pairs, "doc_id", col("score"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((2L, 1L, 3L), (4L, 4L, 2L), (6L, 6L, 1L)))
  }

  test("incrementalNearNew drops corpus-near and within-batch-near arrivals, keeps the rest") {
    val corpus = (1 to 20).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text")
    val batch = Seq(
      (101L, doc(101)),          // genuinely new — must survive
      (102L, doc(102)),          // genuinely new — must survive
      (103L, doc(5) + " extra"), // near-dup of landed doc 5 — corpus drop
      (104L, doc(101) + " pad"), // near-dup of batch doc 101 — batch drop
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearNew(index, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(101L, 102L))
  }

  test("incrementalNearNew catches the perturbed re-arrival that evades exact-fingerprint dedup") {
    // the gap incrementalNew leaves: a one-token perturbation defeats the
    // md5 anti-join but must NOT defeat the near-dup probe
    val corpus = (1 to 10).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text")
    val perturbed = Seq((201L, doc(7) + " sneak")).toDF("doc_id", "text")
    val exactFps = corpus.select(md5(col("text").cast("binary")).as("fp")).distinct()
    val exactSurvivors = Dedup.incrementalNew(exactFps, perturbed, "doc_id", "text").count()
    val nearSurvivors = Dedup.incrementalNearNew(index, perturbed, "doc_id", "text").count()
    assert(exactSurvivors == 1L, "exact incremental should be evaded by the perturbation")
    assert(nearSurvivors == 0L, "near incremental must catch the perturbed re-arrival")
  }

  test("jaccardPairs equals brute-force exact Jaccard (prefix filter loses nothing)") {
    // ground truth by brute force over the actual shingle sets, so the
    // assertion pins the prefix-filter candidate generation: a missing
    // pair means the prefix cut or length filter dropped a qualifying
    // candidate (the PPJoin lemma violated), not bad shingle luck.
    val base = (1 to 25).map(i => (i.toLong, doc(i, n = 40)))
    val planted = Seq(
      (103L, doc(3, n = 40) + " extra"),          // near-dup of 3
      (207L, doc(7, n = 40)),                     // exact dup of 7
    )
    val docs = (base ++ planted).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.array_distinct(
        Dedup.shingleHashes(col("text"), 3)).as("sh"))
      .as[(Long, Array[Long])].collect()
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b
      j = sa.intersect(sb).length.toDouble / sa.union(sb).distinct.length
      if j >= 0.7
    } yield (a, b)).toSet
    assert(truth.contains((7L, 207L)) && truth.contains((3L, 103L)),
      s"planted pairs must be ground truth: $truth")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == truth, s"got $pairs want $truth")
  }

  test("jaccardPairs matches brute force on randomized corpora and edge docs") {
    // randomized corpora with edge documents (empty, sub-n-token, exact
    // short dups) across two thresholds — every corpus must equal brute
    // force exactly, or the prefix/length filters dropped a candidate
    for (seed <- Seq(1, 2, 3); t <- Seq(0.5, 0.8)) {
      val rng = new scala.util.Random(seed)
      val randomDocs = (1 to 15).map(i => (i.toLong, doc(seed * 100 + i, n = 5 + rng.nextInt(40))))
      val edges = Seq(
        (900L, ""), (901L, ""),              // empty: sentinel shingle, Jaccard 1 with itself
        (902L, "a"), (903L, "a"),            // sub-n-token exact dup
        (904L, "a b"), (905L, "b a"))        // same tokens, different order → same 1-window shingle? no: whole-seq shingle differs
      val docs = (randomDocs ++ edges).toDF("doc_id", "text")
      val sets = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.array_distinct(
          Dedup.shingleHashes(col("text"), 3)).as("sh"))
        .as[(Long, Array[Long])].collect()
      val truth = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a < b
        j = sa.intersect(sb).length.toDouble / sa.union(sb).distinct.length
        if j >= t
      } yield (a, b)).toSet
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs == truth, s"seed=$seed t=$t: got $pairs want $truth")
      if (t == 0.8) assert(truth.contains((900L, 901L)) && truth.contains((902L, 903L)),
        s"planted edge dups must be ground truth: $truth")
    }
  }

  test("containmentPairs equals brute-force directed containment; excerpts hit 1.0 one-way") {
    // an excerpt (token prefix) of doc 5: containment(excerpt→source)=1.0,
    // but the reverse direction and the symmetric Jaccard both fall well
    // below threshold — the asymmetry the operator exists for
    val base = (1 to 25).map(i => (i.toLong, doc(i, n = 40)))
    val excerpt = (105L, doc(5, n = 40).split(" ").take(12).mkString(" "))
    val exact = (207L, doc(7, n = 40))
    val docs = (base ++ Seq(excerpt, exact)).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.array_distinct(
        Dedup.shingleHashes(col("text"), 3)).as("sh"))
      .as[(Long, Array[Long])].collect()
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b
      c = sa.intersect(sb).length.toDouble / sa.length
      if c >= 0.9
    } yield (a, b)).toSet
    assert(truth.contains((105L, 5L)) && !truth.contains((5L, 105L)),
      s"excerpt must contain one-way only: $truth")
    assert(truth.contains((7L, 207L)) && truth.contains((207L, 7L)),
      s"exact dup must contain both ways: $truth")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == truth, s"got $pairs want $truth")
  }

  test("containmentPairs matches brute force on randomized corpora and edge docs") {
    // the jaccardPairs randomized harness in containment space: every
    // corpus must equal the directed brute force exactly, or the probe
    // prefix / size gate dropped a qualifying candidate
    for (seed <- Seq(1, 2, 3); t <- Seq(0.6, 0.9)) {
      val rng = new scala.util.Random(seed)
      val randomDocs = (1 to 15).map(i => (i.toLong, doc(seed * 100 + i, n = 5 + rng.nextInt(40))))
      val edges = Seq(
        (900L, ""), (901L, ""),       // empty: sentinel shingle, mutual 1.0
        (902L, "a"), (903L, "a"),     // sub-n-token exact dup
        (904L, "a b"), (905L, "b a"))
      val docs = (randomDocs ++ edges).toDF("doc_id", "text")
      val sets = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.array_distinct(
          Dedup.shingleHashes(col("text"), 3)).as("sh"))
        .as[(Long, Array[Long])].collect()
      val truth = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a != b
        c = sa.intersect(sb).length.toDouble / sa.length
        if c >= t
      } yield (a, b)).toSet
      val pairs = Dedup.containmentPairs(docs, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs == truth, s"seed=$seed t=$t: got $pairs want $truth")
      if (t == 0.9) assert(truth.contains((900L, 901L)) && truth.contains((902L, 903L)),
        s"planted edge dups must be ground truth: $truth")
    }
  }

  test("simhashPairs equals brute-force Hamming ground truth (pigeonhole recall)") {
    // identical copy (hamming 0) + near-copy + unrelated docs; ground truth
    // is computed by brute force over the actual 64-bit fingerprints, so
    // the assertion pins the band-join machinery (any pair ≤ 3 must share
    // a band) rather than betting on shingle statistics.
    val base = (1 to 20).map(i => (i.toLong, doc(i, n = 60)))
    val docs = (base ++ Seq((105L, doc(5, n = 60)), (107L, doc(7, n = 200) + " x")))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.simhash64(Dedup.shingleHashes(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(truth.contains((5L, 105L)), "exact copy must be hamming-0 ground truth")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == truth, s"got $pairs want $truth")
  }

  test("simhashPairs at maxHamming=0: token-equality pairs are a guaranteed subset") {
    // the hash-independent LOWER BOUND the r17 oracle rewrite lost (r17
    // advisory): equal token SEQUENCES fingerprint identically (simhash
    // is a pure function of the token hash sequence), so every
    // token-equal pair MUST surface at Hamming 0 — retained here as
    // ground truth independent of the XXH64→simhash replay both the
    // engine and the oracle now share. (The converse is deliberately NOT
    // asserted: simhash is a bitwise majority vote, robust to one-token
    // edits, so Hamming-0 pairs need not be token-equal.)
    val base = (1 to 15).map(i => (i.toLong, doc(i, n = 60)))
    // token-equal twins under different RAW bytes: case + punctuation
    // differ, the ASCII-lowercase [a-z0-9]+ tokenizer sees identical
    // token sequences
    val twins = Seq(
      (205L, doc(5, n = 60).toUpperCase),
      (207L, doc(7, n = 60).replace(" ", ",  ") + "!"))
    val all = base ++ twins
    val docs = all.toDF("doc_id", "text")
    // driver-side token sequences under the kernel's tokenizer contract
    // (ASCII-lowercase [a-z0-9]+ runs) — no hashing anywhere
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tokenEqual = (for {
      (a, ta) <- all; (b, tb) <- all
      if a < b && toks(ta) == toks(tb)
    } yield (a, b)).toSet
    assert(tokenEqual == Set((5L, 205L), (7L, 207L)),
      s"planted token-equal twins must be the ground truth: $tokenEqual")
    val engine = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(tokenEqual.subsetOf(engine),
      s"token-equal pairs missing from Hamming-0: ${tokenEqual -- engine}")
  }

  test("embedCosinePairs finds scaled twins and nothing else") {
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val twins = base.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 1000L, v.map(x => (x * 1.01).toFloat)) }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = Dedup.embedCosinePairs(emb)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = base.map(_._1).filter(_ % 10 == 0).map(id => (id, id + 1000L)).toSet
    assert(pairs == expected, s"got $pairs want $expected")
  }

  test("semanticDedup drops scaled twins, keeps everything else, and is deterministic") {
    val rng = new scala.util.Random(11)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val twins = base.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 1000L, v.map(x => (x * 1.01).toFloat)) }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val survivors = Dedup.semanticDedup(emb)
      .as[Long].collect().toSet
    // a twin shares its original's cell (positive scaling preserves every
    // cosine, including to the centroids), so keep-smallest drops it
    twins.foreach { case (id, _) =>
      assert(!survivors.contains(id), s"planted twin $id must drop")
    }
    // nothing without a near-duplicate may drop
    assert(survivors == base.map(_._1).toSet,
      "exactly the originals must survive")
    val again = Dedup.semanticDedup(emb).as[Long].collect().toSet
    assert(again == survivors, "trained dedup must be deterministic")
  }

  test("semanticDedup steady (landed cells) equals the retrain path and reuses its land") {
    val dir = "/root/testdata/sf0.001"
    def ids(df: org.apache.spark.sql.DataFrame) = df.as[Long].collect().toSet
    val want = ids(Dedup.semanticDedupPlanted(spark, dir))
    assert(ids(Dedup.semanticDedupPlantedSteady(spark, dir)) == want)
    // second call must serve from the already-landed cell table
    assert(ids(Dedup.semanticDedupPlantedSteady(spark, dir)) == want)
    assert(spark.catalog.tableExists(Dedup.semanticCellsTable(dir, "emb")))
    val wantText = ids(Dedup.semanticDedupText(spark, dir))
    assert(ids(Dedup.semanticDedupTextSteady(spark, dir)) == wantText)
    assert(spark.catalog.tableExists(Dedup.semanticCellsTable(dir, "text")))
  }

  test("incrementalSemanticNew drops embedding-near arrivals, keeps fresh ones") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) = df.as[Long].collect().toSet
    val got = ids(Dedup.incrementalSemanticArrivals(spark, dir))
    val near = emb.filter($"vec_id" % 20 === 0).as[(Long, Array[Float])]
      .collect().map(_._1 + 500000L).toSet
    val fresh = emb.filter($"vec_id" % 30 === 7).as[(Long, Array[Float])]
      .collect().map(_._1 + 600000L).toSet
    assert(near.nonEmpty && fresh.nonEmpty, "fixture must exercise both classes")
    assert(got.intersect(near).isEmpty,
      "scaled near-copies of landed vectors must drop")
    assert(fresh.subsetOf(got),
      "negated (cosine −1) arrivals must survive")
    // steady (landed-quantizer cells) form computes the same survivors
    assert(ids(Dedup.incrementalSemanticArrivalsSteady(spark, dir)) == got)
  }

  test("deletionLinkPairs finds every edit-distance-1 pair, nothing farther") {
    val recs = Seq(
      (1L, "smith"), (2L, "smyth"),   // substitution
      (3L, "jones"), (4L, "joness"),  // insertion
      (5L, "brown"), (6L, "brwn"),    // deletion
      (7L, "gray"), (8L, "gray"),     // identical (distance 0)
      (9L, "taylor"), (10L, "tailer") // distance 2 — must NOT link
    ).toDF("id", "name")
    val got = Dedup.deletionLinkPairs(recs, "id", "name")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L), (7L, 8L, 0L)),
      s"got $got")
  }

  test("resolveEntities keeps one survivor per typo chain by score") {
    // a~b~c is one entity even though a and c are 2 edits apart; the
    // richest record survives, ties to the smallest id; d is distance 2
    // from the chain and stays its own entity, as does unlinked e
    val recs = Seq(
      (1L, "smith", 10.0), (2L, "smyth", 30.0), (3L, "smythe", 20.0),
      (4L, "smudge", 99.0), (5L, "jones", 1.0)
    ).toDF("id", "name", "bal")
    val got = Dedup.resolveEntities(recs, "id", "name", col("bal"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1L, 3L), (4L, 4L, 1L), (5L, 5L, 1L)), s"got $got")
  }

  test("semanticDedup over hashed text vectors drops verbatim twins") {
    // the E130∘E115 composition: text embeds itself by the hashing
    // trick, SemDedup runs unchanged. Verbatim twins have identical
    // vectors (cosine exactly 1 >= tau), distinct-vocab docs stay apart
    // at tau=0.999 in the 8-dim space for this fixture.
    val texts = Seq(
      0L -> "alpha beta gamma delta",
      1L -> "epsilon zeta eta theta",
      2L -> "iota kappa lambda mu nu xi",
      29L -> "omicron pi rho sigma", // second kmeans seed (id % 29 == 0)
      30L -> "alpha beta gamma delta", // twin of 0 -> must drop
      31L -> "iota kappa lambda mu nu xi") // twin of 2 -> must drop
    val emb = graft.operators.TextAnalysis
      .hashedDocVectors(texts.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val survivors = Dedup.semanticDedup(emb, tau = 0.999)
      .as[Long].collect().toSet
    assert(!survivors.contains(30L) && !survivors.contains(31L),
      s"verbatim twins must drop (got $survivors)")
    assert(Set(0L, 1L, 2L, 29L).subsetOf(survivors),
      s"distinct-vocab docs survive (got $survivors)")
  }

  test("duplicateSpans flags shared windows at the right positions, nothing else") {
    // doc 2 = doc 1 with one token appended: windows 0..(T-w) coincide;
    // doc 3 is unrelated; doc 4 is a short doc (< w tokens) duplicated
    // verbatim in doc 5 (whole-sequence window rule)
    val t = doc(1, n = 12) // 12 tokens
    val docs = Seq(
      (1L, t), (2L, t + " extra"), (3L, doc(99, n = 12)),
      (4L, "tiny doc here"), (5L, "tiny doc here"),
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    // doc1/doc2: 12 tokens → windows 0..4 shared (doc2 has one more
    // window, 5, containing 'extra' — not duplicated)
    val expected = (0L to 4L).flatMap(p => Seq((1L, p), (2L, p))).toSet ++
      Set((4L, 0L), (5L, 0L))
    assert(out == expected, s"got $out want $expected")
  }

  test("duplicateSpanRanges merges overlapping/adjacent windows into maximal islands") {
    // doc 1/2 share windows 0..4 (12 shared tokens, w=8): ONE maximal
    // range [0, 12) each, 5 windows — not five overlapping rows; the
    // short-doc pair gets its whole-sequence window as [0, 8); the
    // unrelated doc emits nothing
    val t = doc(1, n = 12)
    val docs = Seq(
      (1L, t), (2L, t + " extra"), (3L, doc(99, n = 12)),
      (4L, "tiny doc here"), (5L, "tiny doc here"),
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanRanges(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 0L, 12L, 12L, 5L), (2L, 0L, 12L, 12L, 5L),
      (4L, 0L, 8L, 8L, 1L), (5L, 0L, 8L, 8L, 1L))
    assert(out == expected, s"got $out want $expected")
  }

  test("duplicateSpanRanges: a gap past the window width splits islands") {
    // two docs share an 8-token run at the START and another at the END
    // of a 30-token doc, with 14 unshared tokens between: flagged
    // windows 0 and 22 are 22 apart (> w) → TWO ranges, not one
    val shared1 = (0 until 8).map(i => s"aa$i").mkString(" ")
    val shared2 = (0 until 8).map(i => s"zz$i").mkString(" ")
    def mid(tag: String) = (0 until 14).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared1 ${mid("m")} $shared2"),
      (2L, s"$shared1 ${mid("q")} $shared2"),
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanRanges(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 0L, 8L, 8L, 1L), (1L, 22L, 30L, 8L, 1L),
      (2L, 0L, 8L, 8L, 1L), (2L, 22L, 30L, 8L, 1L))
    assert(out == expected, s"got $out want $expected")
  }

  test("scrubSpanRanges cuts every occurrence of a duplicated region, passes clean docs through") {
    val shared = (0 until 8).map(i => s"dd$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon"),
      (3L, "entirely clean text here"),
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSpanRanges(docs, "doc_id", "text", w = 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // all-occurrences policy: the shared run leaves BOTH docs
    assert(out(1L) == (("alpha beta gamma", 8L)), s"got ${out(1L)}")
    assert(out(2L) == (("delta epsilon", 8L)), s"got ${out(2L)}")
    // clean doc: token-joined identity, nothing removed
    assert(out(3L) == (("entirely clean text here", 0L)))
    // conservation: kept + removed = token count, per doc
    val toks = Map(1L -> 11L, 2L -> 10L, 3L -> 4L)
    out.foreach { case (id, (txt, rm)) =>
      val kept = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(kept + rm == toks(id), s"doc $id: $kept + $rm != ${toks(id)}")
    }
  }

  test("incrementalNew keeps first-by-id within the batch and drops corpus-known content") {
    val corpusFps = Seq("known text").toDF("text")
      .select(md5(col("text").cast("binary")).as("fp"))
    val batch = Seq(
      (10L, "fresh a"),
      (11L, "known text"),   // already in the corpus → dropped
      (12L, "fresh b"),
      (13L, "fresh a"),      // within-batch dup of id 10 → dropped
      (9L, "fresh b")        // smaller id than 12 → 9 wins, 12 dropped
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(corpusFps, batch, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(out == Set((10L, "fresh a"), (9L, "fresh b")))
  }

  test("softDedupWeights downweights copies by 1/N and leaves unique docs at 1.0") {
    val docs = Seq(
      (1L, "one two three four"),   // pair with 2 — both grams df=2
      (2L, "one two three four"),
      (3L, "alpha beta gamma delta"), // unique — every gram df=1
      (4L, "solo sample body here"),  // unique
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2.0, 0.5), (2L, 2L, 2.0, 0.5),
      (3L, 2L, 1.0, 1.0), (4L, 2L, 1.0, 1.0)))
  }

  test("softDedupWeights: N copies weigh ~1/N; a half-shared doc sits between") {
    val docs = Seq(
      (1L, "one two three four"), (2L, "one two three four"),
      (3L, "one two three four"),             // triple → weight 1/3
      (4L, "one two three nine"),             // shares gram "one two three" (df=4)
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, c, w) => (id, (n, c, w)) }.toMap
    // copies: grams {one two three (df=4), two three four (df=3)} → c=3.5
    for (id <- Seq(1L, 2L, 3L))
      assert(out(id) == ((2L, 3.5, 0.285714)), s"doc $id: ${out(id)}")
    // half-shared: {one two three (df=4), two three nine (df=1)} → c=2.5
    assert(out(4L) == ((2L, 2.5, 0.4)))
  }

  test("softDedupDocsSteady (landed df table) equals the direct corpus-aggregate path") {
    val dir = "/root/testdata/sf0.001"
    val want = Dedup.softDedupDocs(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSet
    val got = Dedup.softDedupDocsSteady(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == want)
    // second serve reuses the landed table and stays exact
    val again = Dedup.softDedupDocsSteady(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(again == want)
  }

  test("noveltyScores: fresh docs score 1.0, a later verbatim copy 0.0, half-shared between") {
    val docs = Seq(
      (1L, "one two three four"),      // first — both grams novel
      (2L, "one two three four"),      // later copy — nothing novel
      (3L, "one two three nine"),      // shares "one two three" → 1 of 2 novel
      (4L, "alpha beta gamma delta"),  // fresh
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 1L, 0.5), (4L, 2L, 2L, 1.0)))
  }

  test("softDedupWeights and noveltyScores match brute force on randomized corpora and edge docs") {
    for (seed <- Seq(7, 8)) {
      val rng = new scala.util.Random(seed)
      val randomDocs = (1 to 15).map(i =>
        (i.toLong, doc(seed * 100 + i, n = 5 + rng.nextInt(40))))
      val edges = Seq(
        (900L, ""), (901L, ""),   // empty: single sentinel shingle, shared
        (902L, "a"), (903L, "a")) // sub-n-token exact dup
      val docs = (randomDocs ++ edges).toDF("doc_id", "text")
      val sets = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.array_distinct(
          Dedup.shingleHashes(col("text"), 3)).as("sh"))
        .as[(Long, Array[Long])].collect()
      val df = sets.flatMap { case (_, sh) => sh }
        .groupBy(identity).map { case (g, o) => (g, o.length.toLong) }
      val firstId = sets.flatMap { case (id, sh) => sh.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, o) => (g, o.map(_._2).min) }
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val wantSoft = sets.map { case (id, sh) =>
        val c = sh.map(df).sum.toDouble / sh.length
        (id, sh.length.toLong, r6(c), r6(1.0 / c))
      }.toSet
      val gotSoft = Dedup.softDedupWeights(docs, "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(gotSoft == wantSoft, s"seed=$seed soft: got $gotSoft want $wantSoft")
      val wantNov = sets.map { case (id, sh) =>
        val nov = sh.count(g => firstId(g) == id).toLong
        (id, sh.length.toLong, nov, r6(nov.toDouble / sh.length))
      }.toSet
      val gotNov = Dedup.noveltyScores(docs, "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(gotNov == wantNov, s"seed=$seed novelty: got $gotNov want $wantNov")
    }
  }

  test("decontaminateScrub cuts exactly the eval-covered windows, keeps everything else") {
    val evalSet = Seq(
      (100L, "e1 e2 e3 e4 e5 e6 e7 e8"), // one full 8-token window
      (101L, "s1 s2 s3"),                // short eval doc → whole-text window
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 e1 e2 e3 e4 e5 e6 e7 e8"), // quote appended
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),                      // clean
      (3L, "s1 s2 s3"),     // verbatim short eval doc → scrubbed entirely
      (4L, "s1 s2 s3 s4"),  // short but NOT a whole-window match → untouched
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateScrub(corpus, evalSet, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 16, 8, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, 9, 0, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
      (3L, 3, 3, ""),
      (4L, 4, 0, "s1 s2 s3 s4")))

    // round-13: the match probe's join strategy is AQE's choice, not a
    // hint — a blocklist-sized eval suite must degrade to a shuffled
    // equi-join instead of OOMing the driver (the contamFraction rule);
    // pinned on the un-checkpointed plan via the plan-audit escape hatch
    sys.props("graft.dedup.lazyPlans") = "true"
    try {
      val plan = Dedup.decontaminateScrub(corpus, evalSet, "doc_id", "text")
        .queryExecution.analyzed.toString
      assert(!plan.contains("ResolvedHint"),
        s"scrub must carry no forced join hint:\n$plan")
    } finally sys.props.remove("graft.dedup.lazyPlans")
  }

  test("nearDecontaminate flags lightly-edited eval overlap cross-side only, nothing else") {
    val corpus = (1 to 20).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val evalSet = Seq(
      (500L, doc(5) + " edited"), // near-dup of corpus doc 5 — must flag
      (999L, doc(999)),           // unrelated eval text — must not flag
    ).toDF("eval_id", "text")
    val hits = Dedup.nearDecontaminate(corpus, evalSet, "doc_id", "text", "eval_id")
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet == Set((5L, 500L)),
      s"expected exactly the planted cross-side pair, got ${hits.toSeq}")
    assert(hits.head._3 >= 0.7)
  }

  test("decontaminate flags only docs sharing an n-gram with the eval set, counting distinct hits") {
    // eval doc: tokens e1..e8 (exactly one 8-gram) plus a short one
    val eval = Seq(
      (100L, "e1 e2 e3 e4 e5 e6 e7 e8"),
      (101L, "tiny eval")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the eval 8-gram mid-text → 1 distinct hit (repeats dedup)
      (1L, "x y e1 e2 e3 e4 e5 e6 e7 e8 z e1 e2 e3 e4 e5 e6 e7 e8"),
      // shares 7 of 8 tokens but never a full window → clean
      (2L, "e1 e2 e3 e4 e5 e6 e7 OTHER e8"),
      // short doc, exact text of the short eval doc → whole-sequence gram hit
      (3L, "tiny eval"),
      (4L, "completely unrelated words")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, eval, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 1L), s"got $out")
    // the bloom-gated path is row-identical — including under a sketch
    // sized far too small (64 bits for the gram set → dense, high-FP):
    // false positives must die in the exact confirm join
    for (bits <- Seq(64L, 33554432L)) {
      val bloomed = Dedup.decontaminateBloom(corpus, eval, "doc_id", "text",
          n = 8, expectedItems = 1000L, numBits = bits)
        .as[(Long, Long)].collect().toMap
      assert(bloomed == out, s"numBits=$bits: $bloomed vs $out")
    }
  }

  test("decontamDocsBloom equals decontamDocs on the planted fixture") {
    val dir = "/root/testdata/sf0.001"
    val exact = Dedup.decontamDocs(spark, dir).as[(Long, Long)].collect().toSet
    val bloomed = Dedup.decontamDocsBloom(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must plant contamination at every SF")
    assert(bloomed == exact)
  }

  test("connectedComponents labels transitive chains with the component minimum") {
    // chain 2~5~9 (2 and 9 never paired directly), pair 11~12, reversed
    // pair (20, 3) — orientation of the input must not matter
    val pairs = Seq((2L, 5L), (5L, 9L), (11L, 12L), (20L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 2L, 5L -> 2L, 9L -> 2L,
      11L -> 11L, 12L -> 11L, 3L -> 3L, 20L -> 3L))
  }

  test("connectedComponents matches union-find on random graphs") {
    for (seed <- Seq(1, 7)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
        .filter(e => e._1 != e._2).distinct
      // in-memory ground truth: union-find attaching the larger root under
      // the smaller, so every root IS its component's minimum id
      val parent = Array.tabulate(80)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n.toInt).toLong).toMap
      val out = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(out == truth, s"seed=$seed: got $out want $truth")
    }
  }

  test("dedupParagraphs: global keep-first across and within docs, reassembly in order") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma unique two three"), // 1st block repeats doc 1's
      (3L, "rep rep rep rep rep rep"),           // both blocks identical
      (4L, "solo words here"),
      (5L, ""),
      (6L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .select("doc_id", "clean_text", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 2L, 0L),
      (2L, "unique two three", 1L, 1L),
      (3L, "rep rep rep", 1L, 1L),
      (4L, "solo words here", 1L, 0L),
      (5L, "", 0L, 0L),
      (6L, "", 0L, 0L)), s"got $out")
  }

  test("dedupParagraphs: every distinct aligned block survives exactly once corpus-wide") {
    import graft.TestDocs.doc
    val docs = (1 to 30).map(i => (i.toLong, doc(i)))
      .toDF("doc_id", "text")
    val w = 3
    val distinctBlocks = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(0),
            org.apache.spark.sql.functions.ceil(
              org.apache.spark.sql.functions.size(
                graft.operators.TextAnalysis.tokens(col("text")))
                .cast("double") / w).cast("int") - 1),
          i => org.apache.spark.sql.functions.array_join(
            org.apache.spark.sql.functions.slice(
              graft.operators.TextAnalysis.tokens(col("text")),
              (i * w + 1).cast("int"),
              org.apache.spark.sql.functions.lit(w)), " "))).as("blk"))
      .distinct().count()
    val kept = Dedup.dedupParagraphs(docs, "doc_id", "text", w)
      .agg(org.apache.spark.sql.functions.sum("n_kept")).as[Long].head()
    assert(kept == distinctBlocks,
      s"kept $kept blocks, corpus has $distinctBlocks distinct aligned blocks")
  }
}
