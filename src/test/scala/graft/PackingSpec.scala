package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Contracts for token-budget shard packing: assignment is total and
  * exclusive, shards respect the budget up to one straddling document,
  * the two-level distributed prefix sum equals the single global running
  * sum it decomposes, and the layout is invariant to input partitioning. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 500L

  private def docs = Tables.documents(spark, sf001).select(col("doc_id"),
    expr("cast(size(filter(split(text, ' '), t -> t != '')) as bigint)")
      .as("n_tok"))

  test("every doc lands in exactly one shard; ids are contiguous from 0") {
    val packed = Packing.packShards(docs, "doc_id", "n_tok", budget).cache()
    try {
      assert(packed.count() == docs.count())
      assert(packed.select("doc_id").distinct().count() == docs.count())
      val shards = packed.select("shard").distinct()
        .as[Long].collect().sorted
      assert(shards.head == 0L && shards.last == shards.length - 1,
        s"non-contiguous shards: ${shards.mkString(",")}")
    } finally packed.unpersist()
  }

  test("shard token mass stays within budget + one straddling doc") {
    val packed = Packing.packShards(docs, "doc_id", "n_tok", budget)
    val maxDoc = docs.agg(max("n_tok")).head().getLong(0)
    // Shard b holds the docs whose token-offset starts in
    // [b*budget, (b+1)*budget). A straddling doc from shard b-1 can eat up
    // to (maxDoc-1) tokens of b's interval, and b's own last doc can extend
    // (maxDoc-1) past it — so every non-final shard's mass lies strictly
    // within (budget - maxDoc, budget + maxDoc).
    val last = packed.agg(max("shard")).head().getLong(0)
    val masses = packed.filter(col("shard") =!= last)
      .groupBy("shard").agg(sum("n_tok").as("m"))
      .select("m").as[Long].collect()
    assert(masses.forall(m => m > budget - maxDoc && m < budget + maxDoc),
      s"shard mass out of bounds: ${masses.min}..${masses.max}, " +
        s"budget $budget, maxDoc $maxDoc")
  }

  test("two-level prefix sum == single global running sum") {
    val packed = Packing.packShards(docs, "doc_id", "n_tok", budget)
      .select("doc_id", "_cum")
    val global = docs
      .withColumn("_h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("_bucket", (col("_h") % Packing.Buckets).cast("int"))
      .withColumn("_cum_g", sum("n_tok").over(
        Window.orderBy(col("_bucket"), col("_h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "_cum_g")
    val diff = packed.join(global, "doc_id")
      .filter(col("_cum") =!= col("_cum_g")).count()
    assert(diff == 0, s"$diff docs diverge from the global prefix sum")
  }

  test("layout is invariant to the input partitioning") {
    val a = Packing.packShards(docs, "doc_id", "n_tok", budget)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Packing.packShards(docs.repartition(13), "doc_id", "n_tok", budget)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("plan: offsets join is broadcast; no global window over the data") {
    val df = Packing.queries("q74_pack_shards")(spark, sf0001)
    df.collect()
    // AQE prints Final AND Initial plans — count only the final one.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
    // The only single-partition window (no partitionBy ⇒ SinglePartition
    // exchange) must be the 32-row offsets frame, fed by an aggregate —
    // never the raw per-doc stream.
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single == 1, s"expected exactly 1 tiny SinglePartition exchange:\n$p")
  }
}
