package graft.sources

import graft.SparkTestBase
import graft.functions.ZOrderKernels
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Z-order layout: kernel bit-exactness, order preservation, and the
  * actual payoff — per-file min/max ranges narrow in BOTH dimensions. */
class ZOrderLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zInterleave matches a naive per-bit reference on random inputs") {
    def naive(a: Int, b: Int): Long = {
      val au = (a ^ Int.MinValue).toLong & 0xffffffffL
      val bu = (b ^ Int.MinValue).toLong & 0xffffffffL
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((au >> i) & 1L) << (2 * i)
        z |= ((bu >> i) & 1L) << (2 * i + 1)
      }
      z ^ Long.MinValue
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = rnd.nextInt(); val b = rnd.nextInt()
      assert(ZOrderKernels.zInterleave(a, b) == naive(a, b), s"($a, $b)")
    }
    // signed extremes stay ordered: most-negative < 0 < most-positive
    // along either axis with the other fixed
    assert(ZOrderKernels.zInterleave(Int.MinValue, 0) <
      ZOrderKernels.zInterleave(0, 0))
    assert(ZOrderKernels.zInterleave(0, 0) <
      ZOrderKernels.zInterleave(Int.MaxValue, 0))
    assert(ZOrderKernels.zInterleave(0, Int.MinValue) <
      ZOrderKernels.zInterleave(0, 0))
  }

  test("z-ordered files cover small rectangles in BOTH dims; linear sort does not") {
    val n = 128
    val grid = spark.range(n.toLong * n)
      .select(($"id" % n).cast("int").as("x"), ($"id" / n).cast("int").as("y"),
        $"id".as("payload"))
    val out = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    Layout.writeZOrdered(grid, "x", "y", out, numFiles = 16)

    // row multiset survives the rewrite
    val back = spark.read.parquet(out)
    assert(back.count() == n.toLong * n)
    assert(back.select(sum($"payload")).head.getLong(0) ==
      grid.select(sum($"payload")).head.getLong(0))

    // per-file extents: with 16 files over a 128×128 grid a perfect
    // z-curve gives 32×32 cells; allow generous slack for range-boundary
    // straddle but stay far below the 127 a linear layout shows
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 8, s"expected ~16 files, got ${files.length}")
    val extents = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max($"x") - min($"x"), max($"y") - min($"y")).head
      (r.getInt(0), r.getInt(1))
    }
    val avgX = extents.map(_._1).sum.toDouble / extents.length
    val avgY = extents.map(_._2).sum.toDouble / extents.length
    assert(avgX <= 64, s"avg x-extent $avgX too wide for a z-layout")
    assert(avgY <= 64, s"avg y-extent $avgY too wide for a z-layout")

    // contrast: linear sort by x leaves y unclustered (full-range files)
    val lin = Files.createTempDirectory("linear").toFile.getAbsolutePath
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lin)
    val linY = new java.io.File(lin).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max($"y") - min($"y")).head
        r.getInt(0)
      }
    assert(linY.max == n - 1, "sanity: linear layout should leave y full-range")
    assert(avgY < linY.max / 2.0,
      s"z-layout y-extent $avgY should beat linear ${linY.max} decisively")
  }
}
