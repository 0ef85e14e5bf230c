package graft

/** Shared synthetic corpus for the near-dup suites: seeded word-salad
  * documents over a 20-word vocabulary — dense enough that 3-gram shingle
  * sets overlap ONLY between a doc and its deliberate perturbations, so
  * planted pairs are the complete expected pair set. One definition so
  * every suite tests the same corpus statistics (vocabulary size moves
  * the LSH band-collision odds). */
object TestDocs {
  val words: Array[String] =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon".split(" ")

  def doc(seed: Int, n: Int = 30): String = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
  }
}
