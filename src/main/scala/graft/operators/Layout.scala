package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout operators (north-star extension, SURVEY §2.3 family):
  * Z-order (Morton) multi-dimensional clustering.
  *
  * Why this is a first-class 100 TB operator: a lexicographic
  * `sortBy(x, y)` layout only lets scans skip on the LEADING column — a
  * predicate on `y` alone touches every file. Interleaving the key bits
  * (`graft.functions.ZValue`) makes file-level min/max ranges boxes in
  * (x, y) space, so a selective predicate on either dimension (or both)
  * prunes to a bounded set of range partitions / files. This is the same
  * technique behind Delta's OPTIMIZE ZORDER BY and Hudi/Iceberg z-order
  * clustering; here it composes from a native codegen'd expression +
  * `repartitionByRange` + `sortWithinPartitions`, all Spark built-ins.
  * LayoutSpec measures the pruning claim directly (partitions touched by
  * a box predicate: z-order ≪ linear sort on the non-leading dimension).
  */
object Layout {
  type Q = (SparkSession, String) => DataFrame

  /** The 2-D Z-order key column (registers the native expression). */
  def zValue(df: DataFrame, x: Column, y: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function("graft_zvalue", x, y)
  }

  /** Re-clusters `df` for 2-D locality: rows land in `numPartitions` range
    * partitions of the interleaved key and are sorted by it within each —
    * written out as-is, every partition's (x, y) min/max footprint is a
    * tight box, which is what makes scan pruning work on both dimensions.
    * The zval column is kept so sinks can also use it as a sort/stats key. */
  def zorderCluster(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int = 32): DataFrame = {
    require(numPartitions >= 1,
      s"zorderCluster: numPartitions must be >= 1, got $numPartitions")
    df.withColumn("zval",
        zValue(df, col(xCol).cast("long"), col(yCol).cast("long")))
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }

  /** Gate query: the Z-order keys of the lineitem (part, supplier) pairs —
    * the math the clustering layout sorts by, verified bit-for-bit (the
    * partitioning itself is exercised by LayoutSpec's pruning contract). */
  private val q112: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
      .select(col("pk"), col("sk"),
        expr("graft_zvalue(pk, sk)").as("zval"))
      .orderBy(col("zval"), col("pk"), col("sk"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "q112_zorder" -> q112,
  )

  /** DuckDB replay of the magic-mask interleave: each spread step is the
    * same shift/mask pair, nested (no variables in SQL — the column name is
    * just duplicated; all masks are < 2^63 so BIGINT arithmetic is exact). */
  private def duckSpread(e: String): String = {
    val masks = Seq(
      16 -> 281470681808895L, // 0x0000FFFF0000FFFF
      8 -> 71777214294589695L, // 0x00FF00FF00FF00FF
      4 -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
      2 -> 3689348814741910323L, // 0x3333333333333333
      1 -> 6148914691236517205L) // 0x5555555555555555
    // CAST up front: DuckDB shifts INTEGER in 32-bit and raises on overflow.
    masks.foldLeft(s"(CAST($e AS BIGINT) & 2147483647)") { case (s, (sh, m)) =>
      s"(($s | ($s << $sh)) & $m)"
    }
  }

  val oracles: Map[String, String] = Map(
    "q112_zorder" -> s"""
      WITH d AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
      SELECT pk, sk, ${duckSpread("pk")} | (${duckSpread("sk")} << 1) AS zval
      FROM d ORDER BY zval, pk, sk LIMIT 100""",
  )
}
