package graft

import graft.functions.ZValueImpl
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout contracts: the interleave kernel against an independent
  * bit-by-bit construction, and the operational claim — a box predicate
  * touches far fewer z-ordered range partitions than linearly-sorted ones
  * on the non-leading dimension. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue == independent bit-by-bit interleave") {
    // Reference: place bit i of x at position 2i, bit i of y at 2i+1 —
    // no shared magic masks with the implementation under test.
    def naive(x: Long, y: Long): Long =
      (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (Int.MaxValue.toLong, 0L),
      (0L, Int.MaxValue.toLong), (12345L, 54321L)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    cases.foreach { case (x, y) =>
      assert(ZValueImpl.z(x, y) == naive(x, y), s"mismatch at ($x, $y)")
    }
    // the codegen'd expression agrees with the kernel
    graft.functions.GraftFunctions.register(spark)
    val got = cases.toDF("x", "y")
      .select(expr("graft_zvalue(x, y)").as("z")).collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (x, y) => naive(x, y) })
  }

  test("z-order clustering prunes box predicates on BOTH dimensions") {
    // 256×256 grid; the probe is a 32×32 box (1.5% of the area). With 16
    // range partitions: z-ordered partitions have tight 2-D footprints, so
    // the box lands in few of them; an x-sorted layout gives no y locality
    // at all and a y-only predicate touches every partition.
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    def touched(clustered: org.apache.spark.sql.DataFrame,
        pred: org.apache.spark.sql.Column): Long =
      clustered.withColumn("pid", spark_partition_id())
        .filter(pred).select("pid").distinct().count()
    val box = col("x") < 32 && col("y") < 32
    val zorder = Layout.zorderCluster(grid, "x", "y", 16)
    val linearX = grid.repartitionByRange(16, col("x"))
    val zTouched = touched(zorder, box)
    val xTouchedYOnly = touched(linearX, col("y") < 32)
    info(s"box-touched partitions: z-order=$zTouched, x-sorted(y-pred)=$xTouchedYOnly")
    // The 32×32 box is one 1/64th-of-keyspace z-range → ≤ 2 of 16 range
    // partitions; the x-sorted layout must scan all 16 for a y predicate.
    assert(zTouched <= 2)
    assert(xTouchedYOnly == 16)
    // and the clustering loses no rows
    assert(zorder.count() == 256L * 256L)
  }

  test("skipStats: z-order zone maps dominate linear on box workloads") {
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = Layout.skipStats(grid, "x", "y", rowsPerFile = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (z, l) = out.partition(_._1 == "zorder")
    // 4096 rows / 256 per file = 16 files per layout, 16 boxes each
    assert(z.length == 16 && l.length == 16)
    assert(out.forall(_._4 == 16L), "both layouts must simulate 16 files")
    val zHits = z.map(_._3).sum
    val lHits = l.map(_._3).sum
    info(s"total files hit over 16 boxes: zorder=$zHits linear=$lHits")
    // z-order: each 16x16 box = exactly one 256-row z-block -> 1 file/box.
    assert(zHits == 16, s"z-order must prune to one file per box, got $zHits")
    // linear x-sort: every file spans the full y range -> every y-selective
    // box hits every file whose x range overlaps (4 files per box).
    assert(lHits == 64, s"linear must scan 4 files per box, got $lHits")
  }
}
