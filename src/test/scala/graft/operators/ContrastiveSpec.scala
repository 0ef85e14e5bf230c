package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Negative-pair sampling: shape, self-exclusion, determinism, and the
  * cross-bucket guarantee. */
class ContrastiveSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every doc draws exactly m negatives, none of them itself") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val nDocs = docs.count()
    val pairs = Contrastive.negativePairs(docs, "doc_id", m = 4, buckets = 64)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length == nDocs * 4, s"${pairs.length} pairs for $nDocs docs")
    assert(pairs.forall { case (d, _, neg) => d != neg }, "self-pair leaked")
    // per (doc, j) exactly one partner
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("partners are bucket representatives from a DIFFERENT bucket") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val b = 64
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % b
    }
    val pairs = Contrastive.negativePairs(docs, "doc_id", m = 3, buckets = b)
      .as[(Long, Long, Long)].collect()
    pairs.foreach { case (d, _, neg) =>
      assert(bucketOf(d) != bucketOf(neg), s"doc $d drew same-bucket partner $neg")
    }
    // and at least a handful of distinct partners are in play
    assert(pairs.map(_._3).distinct.length > 10)
  }

  test("sparse corpora (more buckets than docs) still fill all m negatives per doc") {
    // 5 docs into 64 buckets: most buckets are empty — raw-bucket draws
    // would silently drop the (doc, j) rows that land in them; the
    // occupied-rank remap must keep every doc at exactly m partners
    val docs = Seq(11L, 23L, 305L, 4007L, 50009L).toDF("doc_id")
    val pairs = Contrastive.negativePairs(docs, "doc_id", m = 4, buckets = 64)
      .as[(Long, Long, Long)].collect()
    val perDoc = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc.keySet == Set(11L, 23L, 305L, 4007L, 50009L))
    assert(perDoc.values.forall(_ == 4), s"under-filled: $perDoc")
    assert(pairs.forall { case (d, _, neg) => d != neg })
    assert(pairs.forall { case (_, _, neg) => perDoc.contains(neg) },
      "partner must be a corpus doc")
  }

  test("the draw is a pure function of (id, j): rerun and repartition invariant") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val all = Contrastive.negativePairs(docs, "doc_id").as[(Long, Long, Long)]
      .collect().toSet
    val again = Contrastive.negativePairs(docs.repartition(7), "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(all == again, "partitioning changed the draw")
  }

  // ── preference pairs (E208) ──────────────────────────────────────────

  test("preference pairs: chosen/rejected are the score extremes, transitive chains resolved") {
    // one 3-doc chain (A~B, B~C — A and C are NOT a candidate pair), one
    // 2-doc pair, one singleton: the chain must land in ONE component
    // with chosen/rejected pulled from its extremes, the singleton must
    // emit nothing
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L),  // chain: chosen=2 (30), rejected=1 (10)
      (7L, 5L), (8L, 5L),               // tie pair: chosen=7 (smaller id), rejected=8 (larger id)
      (9L, 99L)                         // singleton
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val got = Contrastive.preferencePairs(docs, pairs, "doc_id", col("q"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 7L), s"components: ${got.keySet}")
    assert(got(1L) == ((1L, 2L, 1L, 30L, 10L, 3L)),
      s"chain pair wrong: ${got(1L)}")
    // all-tied scores: opposite-facing tie-breaks still yield a real pair
    assert(got(7L) == ((7L, 7L, 8L, 5L, 5L, 2L)),
      s"tie pair wrong: ${got(7L)}")
  }

  test("preference pairs over the planted corpus: invariants + the copy wins its pure pair") {
    val got = Contrastive.docPreferencePairs(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "planted corpus must yield clusters")
    got.foreach { case (_, chosen, rejected, cs, rs, n) =>
      assert(n >= 2, "singleton leaked into the pair set")
      assert(chosen != rejected, "degenerate pair")
      assert(cs >= rs, "score extremes inverted")
    }
    // in every PURE planted pair — a 2-member cluster {x, x+1e6} — the
    // copy (one token longer) must be the chosen side; clusters that
    // chain through natural near-dups carry no such guarantee
    val pure = got.filter { case (_, c, r, _, _, n) =>
      n == 2 && c == r + 1000000L }
    assert(pure.nonEmpty, "no pure planted pair surfaced — planting broken?")
    // and no pure pair resolved the other way around (copy rejected)
    assert(!got.exists { case (_, c, r, _, _, n) =>
      n == 2 && r == c + 1000000L },
      "a planted copy lost to its strictly-shorter original")
  }

  test("preference pairs: landed component state ≡ direct (the steady serve law)") {
    // the CC closure is deterministic from the banded pair set, so the
    // landed component table must reproduce the direct entry row for
    // row — and the second ensure call must READ, not re-run the CC
    val direct = Contrastive.docPreferencePairs(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val steady = Contrastive.docPreferencePairsSteady(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(steady == direct, "landed ≡ direct broken")
    assert(spark.catalog.tableExists(Contrastive.prefComponentsTable(dir)))
    val again = Contrastive.docPreferencePairsSteady(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(again == direct)
  }
}
