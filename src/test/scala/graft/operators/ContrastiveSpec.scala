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
}
