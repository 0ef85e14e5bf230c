package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the (AQE-final) physical plan of each named query —
  * `sbt "runMain graft.PlanAudit [sfDir] [name ...]"`. Used to keep every
  * operator's plan honest: pushed filters, narrow ReadSchema, broadcast
  * vs shuffle joins chosen by size, no cartesian products, wide
  * WholeStageCodegen spans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // audit the dedup pipelines' real DAGs, not their checkpointed results
    System.setProperty("graft.dedup.lazyPlans", "true")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-plan-audit")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save() // materialize → AQE finalizes
      println(s"===== $name =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
