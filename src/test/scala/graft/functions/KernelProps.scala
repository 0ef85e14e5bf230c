package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the codegen kernels — pure JVM functions, so these
  * run without a SparkSession and cover arbitrary inputs (including
  * non-ASCII bytes) that the example-based specs don't reach.
  */
object KernelProps extends Properties("kernels") {

  private def u(s: String) = UTF8String.fromString(s)
  private def longs(a: ArrayData): Seq[Long] = (0 until a.numElements()).map(a.getLong)

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf(".,!?;:-"))).map(_.mkString)
  private val anyText: Gen[String] = Gen.asciiPrintableStr.flatMap(a =>
    Gen.oneOf(a, a + "äöü漢字", "é" + a))

  property("polyFingerprint == byte fold") = forAll(anyText) { s =>
    val expect = s.getBytes("UTF-8").foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
    TextKernels.polyFingerprint(u(s)) == expect
  }

  property("rollingMinHash == min of independent window folds") =
    forAll(anyText, Gen.choose(1, 20)) { (s, k) =>
      val bytes = s.getBytes("UTF-8")
      def fold(w: Array[Byte]) = w.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
      val expect =
        if (bytes.length <= k) fold(bytes)
        else bytes.sliding(k).map(fold).min
      TextKernels.rollingMinHash(u(s), k) == expect
    }

  property("shingleHashes: window count = max(tokens - n + 1, 1)") =
    forAll(asciiText, Gen.choose(1, 5)) { (s, n) =>
      val tokens = s.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
      val got = TextKernels.shingleHashes(u(s), n, 42L).numElements()
      got == math.max(tokens - (n - 1), 1)
    }

  property("shingleHashes: case- and separator-insensitive") =
    forAll(asciiText) { s =>
      val a = longs(TextKernels.shingleHashes(u(s), 3, 42L))
      val b = longs(TextKernels.shingleHashes(u(s.toUpperCase), 3, 42L))
      val c = longs(TextKernels.shingleHashes(u(s.replace(' ', '|')), 3, 42L))
      a == b && a == c
    }

  private def md5p32(t: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  property("hashLaneCounts == tokenize + md5-prefix % dims reference") =
    forAll(asciiText, Gen.choose(1, 16)) { (s, dims) =>
      val want = new Array[Long](dims)
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .foreach(t => want((md5p32(t) % dims).toInt) += 1)
      val got = longs(TextKernels.hashLaneCounts(u(s), dims))
      got == want.toSeq
    }

  // The kernel's tokenizer contract on ARBITRARY input: ASCII-only
  // lowercasing, tokens are ASCII [a-z0-9]+ runs, every non-ASCII byte is
  // a separator. This deliberately DIVERGES from Unicode-lowercase
  // tokenization (Spark's lower()/tokens(), the DuckDB oracles) on the
  // rare codepoints whose Unicode lowercase lands inside [a-z0-9]
  // (U+212A KELVIN SIGN → 'k', U+0130 İ → 'i' + combining dot); the
  // engine's corpora are ASCII by contract (TESTDATA), and this property
  // pins what the kernel does OFF that contract so the divergence class
  // is tested, not latent.
  private def asciiLowerTokens(s: String): Seq[String] =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c).mkString
      .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  property("hashLaneCounts: ASCII-only contract on arbitrary (non-ASCII) input") =
    forAll(anyText, Gen.choose(1, 16)) { (s, dims) =>
      val want = new Array[Long](dims)
      asciiLowerTokens(s).foreach(t => want((md5p32(t) % dims).toInt) += 1)
      longs(TextKernels.hashLaneCounts(u(s), dims)) == want.toSeq
    }

  property("hashLaneCounts: the KELVIN-SIGN divergence is the documented class") = {
    val kelvin = "K" // Unicode lowercase → "k": tokens() sees one token
    kelvin.toLowerCase == "k" &&
      longs(TextKernels.hashLaneCounts(u(kelvin), 4)).forall(_ == 0L) // kernel: separator
  }

  private val hashSet: Gen[Seq[Long]] = Gen.nonEmptyListOf(Gen.long).map(_.distinct)
  private def arr(xs: Seq[Long]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  property("minhash(A ∪ B) == elementwise min(minhash(A), minhash(B))") =
    forAll(hashSet, hashSet) { (a0, b0) =>
      val (a, b) = (a0.take(50), b0.take(50))
      val k = 32
      val sa = longs(HashKernels.minhash(arr(a), k, 42L))
      val sb = longs(HashKernels.minhash(arr(b), k, 42L))
      val su = longs(HashKernels.minhash(arr((a ++ b).distinct), k, 42L))
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    }

  property("simhash: permutation-invariant") = forAll(hashSet) { xs0 =>
    val xs = xs0.take(100)
    HashKernels.simhash(arr(xs)) == HashKernels.simhash(arr(new scala.util.Random(1).shuffle(xs)))
  }

  property("hexToDec round-trips BigInt hex of any width") =
    forAll(Gen.listOfN(40, Gen.hexChar).map(_.mkString)) { hex =>
      val got = HexKernels.hexToDec(u(hex))
      got != null && got.toString == BigInt(hex, 16).toString
    }

  private val scoredPairs: Gen[List[(Double, Long)]] =
    Gen.listOf(for {
      s <- Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.oneOf(0.0, 0.5, 0.5, 1.0)) // force ties
      id <- Gen.choose(0L, 50L)
    } yield (s, id))

  private def stateOf(k: Int, xs: Seq[(Double, Long)]): TopKState = {
    val st = new TopKState(k)
    xs.foreach { case (s, id) => st.add(s, id) }
    st
  }
  private def contents(st: TopKState): List[(Double, Long)] = {
    st.compact()
    (0 until st.n).map(i => (st.scores(i), st.ids(i))).toList
  }
  private def expectTopK(k: Int, xs: Seq[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k).toList

  property("TopKState: any add order + split merge == sort-take-k") =
    forAll(scoredPairs, Gen.choose(1, 8), Gen.choose(0, 100)) { (xs, k, cut) =>
      val (a, b) = xs.splitAt(cut % (xs.size + 1))
      val merged = stateOf(k, a)
      val other = stateOf(k, b)
      merged.compact(); other.compact() // merge after partials compacted, as Spark does
      val st = new TopKState(k)
      contents(merged).foreach { case (s, id) => st.add(s, id) }
      contents(other).foreach { case (s, id) => st.add(s, id) }
      contents(st) == expectTopK(k, xs)
    }

  property("TopKState: serialize/deserialize round-trips through the aggregate") =
    forAll(scoredPairs, Gen.choose(1, 8)) { (xs, k) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val agg = TopKByScore(Literal(0.0d), Literal(0L), k)
      val st = stateOf(k, xs)
      contents(agg.deserialize(agg.serialize(st))) == contents(st)
    }
}
