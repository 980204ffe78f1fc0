package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Unit contract for the codegen'd CosineSimilarity expression. */
class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    GraftFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).head().getDouble(0)
  }

  test("parallel vectors -> 1, orthogonal -> 0, antiparallel -> -1") {
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(2f, 4f, 6f)) - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cos(Seq(1f, 1f), Seq(-1f, -1f)) + 1.0) < 1e-12)
  }

  test("matches the higher-order-function formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val native = pairs.select(expr("cosine_sim(x.embedding, y.embedding)").as("c"))
      .collect().map(_.getDouble(0))
    val hof = pairs.select((expr(
      "aggregate(zip_with(x.embedding, y.embedding, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v)")
      / (sqrt(expr("aggregate(x.embedding, 0D, (acc, p) -> acc + cast(p as double) * cast(p as double))"))
        * sqrt(expr("aggregate(y.embedding, 0D, (acc, p) -> acc + cast(p as double) * cast(p as double))"))))
      .as("c")).collect().map(_.getDouble(0))
    assert(native.sameElements(hof))
  }

  test("null-safe: null input -> null output") {
    GraftFunctions.register(spark)
    val r = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).head()
    assert(r.isNullAt(0))
  }
}
