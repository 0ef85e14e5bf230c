package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession.
  *
  * Mirrors the reference's `initialize_spark_session` seam
  * (spark/app/spark_processing.py:68-114) minus the S3A credential wiring,
  * which lives in [[graft.conf.S3Conf]] as pure config maps so it stays
  * testable without hadoop-aws jars.
  *
  * Scale notes: shuffle.partitions is sized to the local core count here;
  * on a real cluster this would be (2-3 × total executor cores) or left to
  * AQE coalescing, which is enabled by default in Spark 4 and keeps the
  * setting from mattering much — partition counts re-plan at runtime.
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Input parquet may carry isAdjustedToUTC=false timestamps; read them
      // as UTC instants (LTZ) so epoch arithmetic (unix_micros) stays legal
      // and semantics match engines that treat naive micros as UTC.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
