package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md).
  *
  * Every query in the engine receives `(SparkSession, sfDir)` and loads its
  * inputs through here, so filters/projections written against these frames
  * reach the Parquet scan via Catalyst pushdown (verified in PlanSpec).
  *
  * Reference analog: the only "source" in AlexShneur/12_mapreduce is a
  * newline-split text file (MapReduce.h:136-176, 219-245); Spark's file
  * sources give the same byte-range splitting natively (SURVEY §1.4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet timestamp[ns], which Spark rejects by default
    * (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to microseconds
    * (integer `div` — a double division would lose precision above 2^53).
    * DuckDB reads the same column as TIMESTAMP_NS; oracles that *output* ts
    * must cast it to TIMESTAMP (µs) for parity. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so spark.sql(...) queries (grouping
    * sets, EXISTS subqueries) can name them exactly as the DuckDB oracle does.
    * `events` goes through [[events]] (nanos→µs conversion) — the raw parquet
    * would fail to read (PARQUET_TYPE_ILLEGAL) and diverge from every events
    * oracle. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
