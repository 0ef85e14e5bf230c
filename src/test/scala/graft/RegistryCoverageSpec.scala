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

  test("the committed full-bench artifact is registry-complete") {
    // the round-10 nit made law: a committed BENCH_full_r<N>.json that
    // trails the registry reads as "covered everything" when it didn't.
    // The LATEST committed artifact must time exactly the current
    // registry — adding a query without re-emitting the artifact fails
    // here until the full bench is re-run (the enforcement, not a
    // formality).
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array())
      .map(_.getName)
      .flatMap { n =>
        "^BENCH_full_r(\\d+)\\.json$".r.findFirstMatchIn(n)
          .map(m => (m.group(1).toInt, n))
      }
    assume(files.nonEmpty, "no committed BENCH_full artifact yet")
    val latest = files.maxBy(_._1)._2
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(latest)), "UTF-8")
    def keysOf(section: String): Set[String] = {
      val start = json.indexOf(s""""$section":{""")
      assert(start >= 0, s"$latest carries no \"$section\" object")
      val body = json.substring(start + section.length + 4,
        json.indexOf("}", start))
      "\"([A-Za-z0-9_]+)\":".r.findAllMatchIn(body).map(_.group(1)).toSet
    }
    val extMissing = SparkEntry.benchExtQueries.toSet -- keysOf("ext")
    assert(extMissing.isEmpty,
      s"$latest trails the registry — re-run the full bench and commit " +
        s"BENCH_full_r<N+…>.json; missing ext keys: ${extMissing.toSeq.sorted}")
    val headMissing = headline -- keysOf("queries")
    assert(headMissing.isEmpty,
      s"$latest missing headline keys: ${headMissing.toSeq.sorted}")
  }
}
