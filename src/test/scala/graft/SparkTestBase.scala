package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one local JVM-wide SparkSession keeps
  * `sbt test` fast (session startup dominates at test scale). Small core +
  * shuffle-partition counts: these tests verify semantics, not throughput.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = {
    // test fixtures are per-run temp corpora, so the landed-state root is
    // per-JVM too (set BEFORE first Landing use; suites share this JVM)
    sys.props.getOrElseUpdate("graft.state.dir", java.nio.file.Files
      .createTempDirectory("graft_test_state_").toString)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
  }
}
