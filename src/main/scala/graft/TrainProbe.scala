package graft

/** Trainer-crossover probe — times the exact flat Lloyd's against the
  * two-level pruned trainer on either trainer corpus (the d=64 planted
  * vectors or the d=8 hashed text vectors) in ONE window, interleaved,
  * so the [[graft.operators.Similarity.FlatTrainerMaxSeeds]] pin can be
  * re-bracketed on new hardware without trusting cross-window reads
  * (the round-15 4096 pin came from a one-window read that did not
  * reproduce). Usage:
  * `runMain graft.TrainProbe <sfDir> flat,hier[,flat,hier] [vectors|text]`. */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val what = args(1)
    Sessions.pinPerRunStateDir("probe")
    val spark = Sessions.local("graft-probe")
    import org.apache.spark.sql.functions._
    val emb = (if (args.length > 2 && args(2) == "vectors")
      graft.operators.Dedup.plantedNearVectors(spark, dir)
    else {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .filter(size(graft.operators.TextAnalysis.tokens(col("text"))) > 0)
      graft.operators.TextAnalysis
        .hashedDocVectors(docs, "doc_id", "text")
        .select(col("doc_id").as("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
    }).localCheckpoint()
    println(s"[probe] n=${emb.count()} seeds=${emb.filter(col("vec_id") % 29 === 0).count()}")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    what.split(",").foreach {
      case "flat" => time("flat-train") {
        graft.operators.Similarity.kmeansCentroids(emb)
          .write.format("noop").mode("overwrite").save()
      }
      case "hier" => time("hier-train") {
        graft.operators.Similarity.kmeansCentroidsHier(emb)
          .write.format("noop").mode("overwrite").save()
      }
      case "full_flat" => time("full-semdedup-flat") {
        graft.operators.Dedup.semanticDedup(emb,
          0.99).write.format("noop").mode("overwrite").save()
      }
      case other => println(s"[probe] unknown: $other")
    }
    spark.stop()
  }
}
