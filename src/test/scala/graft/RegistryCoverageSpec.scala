package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants: every query the driver can run is timed by Bench
  * and checked by an oracle — a new operator wired into `queries` but
  * missing from either list would otherwise ship silently untimed or
  * unverified (the round-7 tripwire rule, now enforced).
  */
class RegistryCoverageSpec extends AnyFunSuite {
  private val headline =
    Set("q1_sort_limit", "q2_count", "q3b_anti_join", "q4_dup_having", "q5_range")
  // s5_stream_ingest drives a full streaming roundtrip with its own file
  // I/O; the dedicated "stream" bench objects time streaming instead
  private val benchExcluded = Set("s5_stream_ingest")

  test("every registered query is benched (headline or ext)") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.benchExtQueries.toSet -- headline -- benchExcluded
    assert(missing.isEmpty, s"untimed queries: ${missing.toSeq.sorted}")
  }

  test("every registered query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"unverified queries: ${missing.toSeq.sorted}")
  }

  test("every bench ext entry and oracle names a registered query") {
    val ghosts = (SparkEntry.benchExtQueries.toSet ++ SparkEntry.oracleSql.keySet) --
      SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"ghost entries: ${ghosts.toSeq.sorted}")
  }
}
