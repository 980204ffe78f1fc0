package graft

import org.apache.spark.sql.types.StructType

/** Canonical output-schema snapshot for the type-drift regression lock.
  *
  * The driver's oracle hash is type-sensitive down to decimal
  * precision/scale and integer width (round 10 shipped three queries red
  * on exactly that axis: un-cast sum(DECIMAL) widening and an int32
  * ntile). OutputSchemaSpec compares every query's analyzed schema
  * against the golden file this main regenerates — so an innocent
  * refactor that drops a pinning cast fails `sbt test` instead of the
  * driver's gate.
  *
  * Regenerate (ONLY after deliberately changing a query's output shape):
  *   sbt "runMain graft.SchemaGolden"
  */
object SchemaGolden {

  /** Nullability excluded: the driver's hash ignores it and it shifts
    * with join-order refactors that change nothing observable. */
  def canonical(schema: StructType): String =
    schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")

  val goldenPath = "src/test/resources/golden_schemas.txt"

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_golden").toString)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, sfDir)
      // Decimal outputs are driver-incompatible (round-11 hash evidence);
      // refuse to snapshot one rather than codify a red class.
      require(!graft.operators.DriverOutput.hasDecimal(df),
        s"$name ships a DECIMAL output column — wrap it in " +
          "DriverOutput.noDecimals (and CAST the oracle) before regenerating")
      s"$name\t${canonical(df.schema)}"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(goldenPath),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} schemas to $goldenPath")
    spark.stop()
  }
}
