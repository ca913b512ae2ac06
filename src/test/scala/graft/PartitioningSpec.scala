package graft

import graft.core.Partitioning
import org.apache.spark.sql.functions._

/** Z-order layout (r11): the data-skipping claim measured against real
  * parquet footers — a Morton-keyed range-partitioned write must bound
  * BOTH dimensions per file, where a single-column sort bounds only its
  * own column and leaves the other at full width. */
class PartitioningSpec extends SparkSpec {

  /** Per-file (min, max) of a long column, from the parquet footers. */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        val blocks = r.getFooter.getBlocks
        var mn = Long.MaxValue; var mx = Long.MinValue
        (0 until blocks.size()).foreach { b =>
          val cols = blocks.get(b).getColumns
          (0 until cols.size()).foreach { c =>
            val cc = cols.get(c)
            if (cc.getPath.toDotString == column) {
              val st = cc.getStatistics
              mn = math.min(mn, st.genericGetMin.asInstanceOf[Number].longValue())
              mx = math.max(mx, st.genericGetMax.asInstanceOf[Number].longValue())
            }
          }
        }
        (mn, mx)
      } finally r.close()
    }
  }

  private def meanWidth(rs: Seq[(Long, Long)]): Double =
    rs.map { case (a, b) => (b - a).toDouble }.sum / rs.size

  test("zorderKey interleaves bits (known values) and guards the domain") {
    val df = spark.range(1).select(
      Partitioning.zorderKey(lit(3L), lit(5L), bits = 4).as("z1"),
      Partitioning.zorderKey(lit(0L), lit(15L), bits = 4).as("z2"),
      Partitioning.zorderKey(lit(15L), lit(0L), bits = 4).as("z3"))
    val r = df.head()
    // x=0011, y=0101 -> y3x3 y2x2 y1x1 y0x0 = 10 01 11 01 = 0x9D? compute:
    // bit i of x at 2i, bit i of y at 2i+1:
    // x=3: bits 0,1 -> positions 0,2 (1+4=5); y=5: bits 0,2 -> positions 1,5 (2+32=34)
    assert(r.getLong(0) == 5L + 34L)
    assert(r.getLong(1) == (2L + 8L + 32L + 128L)) // y bits -> odd positions
    assert(r.getLong(2) == (1L + 4L + 16L + 64L))  // x bits -> even positions
    val bad = spark.range(1).select(
      Partitioning.zorderKey(lit(16L), lit(0L), bits = 4).as("z"))
    assertThrows[Exception](bad.collect())
  }

  test("layoutZOrder bounds BOTH dims per file; single-col sort leaves the other full-width") {
    // 4,096 points on a 64x64 grid, one row per cell — uniform worst case
    val n = 64
    val pts = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).as("y"))
    val dirZ = tmpDir("zorder")
    val dirX = tmpDir("xsort")
    Partitioning.layoutZOrder(pts, "x", "y", nFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(dirZ)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)
    val full = (n - 1).toDouble
    val zX = meanWidth(fileRanges(dirZ, "x")); val zY = meanWidth(fileRanges(dirZ, "y"))
    val sX = meanWidth(fileRanges(dirX, "x")); val sY = meanWidth(fileRanges(dirX, "y"))
    // x-sort: x tightly bounded, y at (essentially) full width per file
    assert(sX <= full / 2, s"x-sort x width $sX")
    assert(sY >= full * 0.9, s"x-sort y width $sY should be ~full")
    // z-order: BOTH dims well under full width per file (16 contiguous
    // z-ranges on a 64x64 grid = 4x4 quadrant tiles -> width ~ full/4)
    assert(zX <= full / 2, s"z x width $zX")
    assert(zY <= full / 2, s"z y width $zY")
    // and the layout actually skips: a both-dims filter overlaps fewer
    // files' envelopes under z than under the single-col sort
    def overlapping(rsX: Seq[(Long, Long)], rsY: Seq[(Long, Long)]): Int =
      rsX.zip(rsY).count { case ((x0, x1), (y0, y1)) =>
        x1 >= 0 && x0 <= 15 && y1 >= 0 && y0 <= 15 }
    val zHit = overlapping(fileRanges(dirZ, "x"), fileRanges(dirZ, "y"))
    val sHit = overlapping(fileRanges(dirX, "x"), fileRanges(dirX, "y"))
    assert(zHit < sHit, s"z-order should prune more files: z=$zHit, xsort=$sHit")
  }
}
