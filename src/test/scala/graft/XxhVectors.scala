package graft

// Scratch dev main: print shingle-hash + simhash vectors for comparison
// against the Python/DuckDB XXH64 oracle prototype. Run:
//   sbt "Test/runMain graft.XxhVectors"
object XxhVectors {
  def main(args: Array[String]): Unit = {
    import graft.functions._
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("hello world foo bar", "a", "", "The quick brown Fox, jumps!",
        "pneumonoultramicroscopicsilicovolcanoconiosis supercalifragilisticexpialidocious x")) {
      val a = TextKernels.shingleHashes(UTF8String.fromString(s), 3, 42L)
      val hs = (0 until a.numElements()).map(a.getLong)
      val arr = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(hs.toArray)
      println(s"$s | ${hs.mkString(",")} | ${HashKernels.simhash(arr)}")
    }
  }
}
