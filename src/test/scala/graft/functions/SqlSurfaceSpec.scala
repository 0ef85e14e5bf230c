package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, TextAnalysis}

/** SQL-first entry point (the reference's surface is SQL text): flagship
  * operators are reachable as PURE `spark.sql` queries — the codegen
  * kernels resolve by name through GraftExtensions' FunctionRegistry
  * injection — and the SQL spelling produces the same answer and the
  * same plan shape (exchange count, no cartesians, same top-k operator)
  * as the Column-API operator.
  */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }
  private def exchanges(plan: String): Int = "Exchange".r.findAllIn(plan).length

  private lazy val docsView: String = {
    graft.sources.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("sqlsurface_documents")
    "sqlsurface_documents"
  }

  test("quality filter as pure SQL: same rows, same scan-only plan") {
    val sql = spark.sql(
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0) AS toks
         |  FROM $docsView
         |), s AS (
         |  SELECT doc_id, lang,
         |    length(text) AS n_chars, size(toks) AS n_tokens,
         |    aggregate(toks, 0, (acc, t) -> acc + length(t)) AS token_chars,
         |    length(text) - length(regexp_replace(text, '[.,!?;:]', '')) AS n_punct,
         |    size(filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that'))) AS n_stopwords
         |  FROM t
         |)
         |SELECT s.*,
         |  (n_chars >= 20 AND n_tokens >= 5
         |   AND (CAST(token_chars AS DOUBLE) / n_tokens) BETWEEN 2.0 AND 12.0
         |   AND (CAST(n_punct AS DOUBLE) / n_chars) <= 0.2
         |   AND (CAST(n_stopwords AS DOUBLE) / n_tokens) >= 0.01) AS keep
         |FROM s""".stripMargin)
    val api = TextAnalysis.qualityFilter(spark, dir)
    def rows(df: DataFrame) =
      df.as[(Long, String, Int, Int, Int, Int, Int, Boolean)].collect().toSet
    assert(rows(sql) == rows(api))
    val (ps, pa) = (finalPlan(sql), finalPlan(api))
    assert(exchanges(ps) == exchanges(pa),
      s"SQL and Column plans must shuffle identically:\n$ps\n$pa")
  }

  test("minhash LSH near-dup pairs as pure SQL: same pairs, no cartesian") {
    val sql = spark.sql(
      s"""WITH sh AS (
         |  SELECT doc_id, array_distinct(shingle_hashes(text, 3)) AS sh
         |  FROM $docsView
         |), sig AS (
         |  SELECT doc_id, minhash_sig(sh, 128, 42L) AS sig FROM sh
         |), banded AS (
         |  SELECT doc_id, band, bh FROM sig
         |  LATERAL VIEW posexplode(transform(sequence(0, 31),
         |    b -> xxhash64(slice(sig, b * 4 + 1, 4)))) g AS band, bh
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      (size(sa.sh) + size(sb.sh) - size(array_intersect(sa.sh, sb.sh))) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id
         |)
         |WHERE jaccard >= 0.7""".stripMargin)
    val api = Dedup.minhashLshPairs(
      graft.sources.Tables.load(spark, dir, "documents"), "doc_id", "text")
    def rows(df: DataFrame) = df.as[(Long, Long, Double)].collect().toSet
    assert(rows(sql) == rows(api))
    assert(rows(sql).nonEmpty, "fixture must contain near-dup pairs")
    val ps = finalPlan(sql)
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoop"),
      s"the SQL spelling must keep the banded equi-join plan:\n$ps")
  }

  test("BM25 ranked retrieval as pure SQL: same ranking, same plan shape") {
    val q = TextAnalysis.searchQuery // vector, merge, stream
    val inList = q.map(t => s"'$t'").mkString(", ")
    val sql = spark.sql(
      s"""WITH wl AS (
         |  SELECT doc_id, filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0) AS w
         |  FROM $docsView
         |), wld AS (
         |  SELECT doc_id, w, size(w) AS dl FROM wl
         |), stats AS (
         |  SELECT count(1) AS n_docs, avg(dl) AS avgdl FROM wld
         |), tf AS (
         |  SELECT doc_id, dl, term, count(1) AS tf
         |  FROM (
         |    SELECT doc_id, dl, term FROM wld
         |    LATERAL VIEW explode(w) g AS term
         |    WHERE arrays_overlap(w, array($inList)) AND term IN ($inList)
         |  )
         |  GROUP BY doc_id, dl, term
         |), dfs AS (
         |  SELECT term, count(1) AS df FROM tf GROUP BY term
         |)
         |SELECT doc_id, round(sum(s), 6) AS score FROM (
         |  SELECT tf.doc_id,
         |    log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * (1.2 + 1.0) /
         |      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
         |  FROM tf JOIN dfs ON tf.term = dfs.term CROSS JOIN stats
         |)
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id
         |LIMIT 25""".stripMargin)
    val api = TextAnalysis.searchDocs(spark, dir)
    def rows(df: DataFrame) = df.as[(Long, Double)].collect().toSeq
    assert(rows(sql) == rows(api), "same ranking, same rounded scores, same order")
    val (ps, pa) = (finalPlan(sql), finalPlan(api))
    assert(ps.contains("TakeOrderedAndProject") && pa.contains("TakeOrderedAndProject"),
      "both spellings must keep the heap top-k, not a global sort")
    assert(exchanges(ps) == exchanges(pa),
      s"SQL and Column plans must shuffle identically:\n$ps\n$pa")
  }

  test("DSIR importance selection as pure SQL: kernel + HOF fold reach the same ranking") {
    // the whole E153 selection as ONE statement: the registered
    // hash_lane_counts kernel, the model as aggregates, the llr as a
    // collected array via a scalar subquery, the weight as the same
    // sequential aggregate() fold
    val sql = spark.sql(
      s"""WITH lanes AS (
         |  SELECT doc_id, lang = 'en' AS is_target,
         |    hash_lane_counts(text, 64) AS cnt
         |  FROM $docsView
         |), model AS (
         |  SELECT lane,
         |    sum(CASE WHEN is_target THEN c ELSE 0L END) AS tc,
         |    sum(CASE WHEN NOT is_target THEN c ELSE 0L END) AS rc
         |  FROM lanes LATERAL VIEW posexplode(cnt) g AS lane, c
         |  GROUP BY lane
         |), tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM model),
         |llr AS (
         |  SELECT transform(
         |    sort_array(collect_list(named_struct('lane', lane, 'v',
         |      round(ln((tc + 1.0D) / (tt + 64.0D)) -
         |            ln((rc + 1.0D) / (rt + 64.0D)), 6)))),
         |    x -> x.v) AS l
         |  FROM model CROSS JOIN tot
         |), scored AS (
         |  -- the 1-row llr rides a broadcast cross: subqueries are not
         |  -- allowed inside higher-order functions
         |  SELECT doc_id,
         |    round(aggregate(zip_with(cnt, l,
         |      (c, v) -> CAST(c AS DOUBLE) * v), 0.0D, (a, b) -> a + b), 6)
         |      AS weight
         |  FROM lanes CROSS JOIN llr WHERE NOT is_target
         |)
         |SELECT doc_id, weight,
         |  row_number() OVER (ORDER BY weight DESC, doc_id) AS rank
         |FROM scored ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin)
    val api = TextAnalysis.dsirSelect(
      graft.sources.Tables.load(spark, dir, "documents"),
      "doc_id", "text", org.apache.spark.sql.functions.col("lang") === "en")
    def rows(df: DataFrame) = df.as[(Long, Double, Int)].collect().toSet
    assert(rows(sql) == rows(api), "the SQL spelling must reproduce the selection")
  }
}
