package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor replicator for LOCAL scaling measurements beyond the
  * driver-provided testdata (`sf1 = 10 × sf0.1`): replicates the tables
  * the steady-serve and LSH-dedup bench families read, with id offsets
  * and per-replica content transforms chosen so the STATISTICS that
  * drive those plans scale linearly instead of degenerately:
  *
  *  - `documents`: replica i's text goes through a PER-REPLICA ALPHABET
  *    PERMUTATION — letters through the affine index map
  *    `l → (u·l + i mod 26) mod 26` with `u` the `(i div 26)`-th unit
  *    mod 26 (case-aligned; the identity multiplier for the first 26
  *    replicas makes those layers the plain Caesar rotation), digits
  *    rotated by `i div 26`, punctuation/whitespace fixed — so
  *    shingle/minhash/band distributions replicate per copy but NO
  *    cross-replica near-dup pairs appear: the letter maps are pairwise
  *    DISTINCT permutations for i < 312 copies (distinct (u, b) affine
  *    maps differ; a rotation-only transform repeated the letter map
  *    every 26 replicas, reproducing pure-letter text verbatim across
  *    those pairs), where 10 verbatim copies
  *    of each document would inflate the LSH candidate count ~45× per
  *    duplicate set and the "sf1" point would measure an artifact, not
  *    scale. An alphabet permutation (vs the additive token-tag
  *    spellings this replaced) is the transform class that preserves
  *    within-replica structure EXACTLY: token lengths, doc lengths (`n_chars` stays
  *    truthful), shingle/term-statistics shape, and every byte-level
  *    histogram are permutation-isomorphic to the base corpus, so
  *    signature families built on byte statistics (the perceptual
  *    `phash_bands` kernel, hashed token-lane vectors) keep their
  *    sf0.1 pair structure per replica instead of collapsing. Measured
  *    on the mm (phash τ=3) pair count at ×10, base 28 258 pairs: a
  *    constant per-replica token PREFIX adds the same byte-bigram mass
  *    to every doc, converges all margins, and explodes pairs 598×
  *    (16.9 M); a token-hash-spread two-letter tag cuts that to 28×
  *    but leaks 110 k cross-replica pairs (thin tags no longer
  *    separate replicas of the same base doc); the per-replica
  *    permutation is the construction that gets both right.
  *  - `embeddings`: per-replica additive perturbation (+i·0.001 per
  *    lane) — a scalar MULTIPLE would leave cosine unchanged and make
  *    every replica an exact semantic duplicate; the additive shift
  *    keeps neighborhoods realistic while scaling the corpus.
  *  - `events`: id/user offsets, timestamps and values unchanged (the
  *    histogram/sketch families scale by row count, not key range).
  *  - star schema (round 13, for the FULL-registry scaling run): the
  *    FACT and per-entity tables (`lineitem orders customer supplier
  *    part`) replicate with a consistent offset on every join key —
  *    `l_orderkey`/`o_orderkey`, `o_custkey`/`c_custkey`,
  *    `l_partkey`/`p_partkey`, `l_suppkey`/`s_suppkey` all shift by the
  *    same `i·off`, so each replica joins ONLY within itself and every
  *    equi-join's output grows linearly (offset-free replication would
  *    instead square the join fan-out: each lineitem row would match
  *    `copies` order rows). `c_name` gets the documents-style per-replica
  *    alphabet rotation so name-duplicate GROUPS scale linearly too
  *    (verbatim copies would deepen the existing groups instead).
  *    DIMENSION tables (`region nation`) copy UNCHANGED — nationkey/
  *    regionkey references stay valid and the dimensions keep their
  *    fixed small cardinality, which is how a real star scales: facts
  *    grow, dimensions don't (and broadcast-ability is preserved).
  *
  * Usage: `runMain graft.ScaleUp /root/testdata/sf0.1 <outDir> [copies]
  * [tables]` — the optional comma-separated `tables` arg replicates only
  * those tables (e.g. `embeddings` for a vectors-only sf100-class live
  * set: a full-star ×300 replication would write 180 M lineitem rows the
  * dense-crossover measurement never reads).
  * The output is generated state, never committed (see .gitignore). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val tables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = Sessions.local("graft-scaleup")

    def replicate(name: String, f: (DataFrame, Int) => DataFrame): Unit = {
      if (!tables.forall(_.contains(name))) return
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map(i => f(base, i)).reduce(_.unionByName(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }

    val off = 10000000L
    // Replica-i alphabet permutation (see scaladoc): letters through the
    // AFFINE map l -> (u·l + i mod 26) mod 26 with u the (i div 26)-th
    // unit mod 26, digits rotated by i div 26, everything else fixed.
    // One translate — length- and structure-preserving. For i < 26 the
    // multiplier is 1 and the map is the plain Caesar rotation (earlier
    // sf1 runs stay comparable); for i >= 26 the multiplier makes
    // pure-letter text differ across same-rotation layers — replicas i
    // and i+26 under the rotation-only transform shared the identical
    // letter map (only the digit layer moved), so pure-letter tokens —
    // the bulk of any corpus — reproduced verbatim across those pairs
    // and reintroduced the cross-replica near-dup explosion. Affine maps
    // with distinct (u, b) are distinct permutations (evaluate at
    // indices 0 and 1), so letter maps are pairwise distinct for
    // i < 26·12 = 312 copies (asserted below).
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    require(copies <= 26 * units.size,
      s"per-replica letter maps are distinct only for copies <= ${26 * units.size}")
    def rotate(c: org.apache.spark.sql.Column, i: Int) = {
      def affine(s: String, u: Int, b: Int): String =
        s.indices.map(l => s((u * l + b) % s.length)).mkString
      def rot(s: String, k: Int): String =
        s.drop(k % s.length) + s.take(k % s.length)
      val lo = "abcdefghijklmnopqrstuvwxyz"
      val up = lo.toUpperCase
      val dg = "0123456789"
      val u = units(i / 26)
      translate(c, lo + up + dg,
        affine(lo, u, i % 26) + affine(up, u, i % 26) + rot(dg, i / 26))
    }
    replicate("documents", (d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text", rotate(col("text"), i)))
    replicate("embeddings", (d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", col("vec_id") + lit(i * off))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 0.001f))))
    replicate("events", (d, i) =>
      if (i == 0) d
      else d.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off)))

    // star schema: every join key shifts by the SAME i*off so each
    // replica is self-contained (see scaladoc); dimensions copy as-is
    def shift(d: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(d)((df, k) => df.withColumn(k, col(k) + lit(i * off)))
    replicate("lineitem", (d, i) =>
      if (i == 0) d else shift(d, i, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("orders", (d, i) =>
      if (i == 0) d else shift(d, i, "o_orderkey", "o_custkey"))
    replicate("customer", (d, i) =>
      if (i == 0) d
      else shift(d, i, "c_custkey").withColumn("c_name",
        rotate(col("c_name"), i)))
    replicate("supplier", (d, i) =>
      if (i == 0) d else shift(d, i, "s_suppkey"))
    replicate("part", (d, i) =>
      if (i == 0) d else shift(d, i, "p_partkey"))
    Seq("region", "nation").foreach { name =>
      if (tables.forall(_.contains(name)))
        spark.read.parquet(s"$src/$name.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }
    spark.stop()
  }
}
