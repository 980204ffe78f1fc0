package graft

import graft.functions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Contract for the native codegen'd HyperplaneBuckets expression: it must
  * reproduce the interpreted-HOF bucketization it replaced *bit-for-bit*,
  * because the q61/q62/q64 DuckDB oracles replay those buckets from the same
  * 9-decimal plane literals. A sign flip anywhere changes candidate sets and
  * breaks the driver's hash gate.
  */
class HyperplaneSpec extends SparkSpec {
  import spark.implicits._

  test("native buckets == HOF-literal buckets on every fixture vector") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val native = emb.select(col("vec_id"),
      expr(Similarity.bucketArraySpark("embedding", 64, 8, 4)).as("b"))
    val hof = emb.select(col("vec_id"),
      expr(Similarity.bucketArrayHofSpark("embedding", 64, 8, 4)).as("b"))
    val n = native.orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    val h = hof.orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(n.length == h.length && n.length > 0)
    n.zip(h).foreach { case ((nid, nb), (hid, hb)) =>
      assert(nid == hid && nb == hb, s"bucket mismatch at vec_id=$nid: $nb vs $hb")
    }
  }

  test("null-safe: null vector -> null bucket array") {
    GraftFunctions.register(spark)
    val r = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "v")
      .select(expr("graft_hp_buckets(v, 8, 4, 64)").as("b")).head()
    assert(r.isNullAt(0))
  }

  test("interpreted eval path matches codegen path") {
    GraftFunctions.register(spark)
    // Force the interpreted path via eval() on a literal-input expression.
    val vec = Tables.embeddings(spark, sf0001).limit(1)
      .select(col("embedding")).head().getSeq[Float](0)
    val viaSql = Seq(Tuple1(vec)).toDF("v")
      .select(expr("graft_hp_buckets(v, 8, 4, 64)")).head().getSeq[Int](0)
    val planes = graft.functions.HyperplaneBucketsImpl.planes(8, 4, 64)
    val direct = graft.functions.HyperplaneBucketsImpl.buckets(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec.toArray),
      planes, 8, 4).toIntArray()
    assert(viaSql == direct.toSeq)
  }
}
