package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's named queries and their DuckDB oracle
  * SQL. Each `queries` entry is one operator from SURVEY §2 (or a north-star
  * extension, §2.3); the driver runs them at sf0.01 via [[Verify]] and
  * hash-compares against the oracle, and times them at sf0.1 via [[Bench]].
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Graph.queries, operators.Graph.oracles),
      (operators.Layout.queries, operators.Layout.oracles),
      (operators.Similarity.queries, operators.Similarity.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (operators.Parity.queries, operators.Parity.oracles),
      (operators.AsOf.queries, operators.AsOf.oracles),
      (operators.Analytics.queries, operators.Analytics.oracles),
      (operators.Packing.queries, operators.Packing.oracles),
      (operators.Skew.queries, operators.Skew.oracles),
      (operators.Privacy.queries, operators.Privacy.oracles),
      (streaming.StreamingQueries.queries, streaming.StreamingQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
