package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide installation of the native expressions — the production
  * integration path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes `cosine_sim`, `graft_fingerprint`, … available in every session
  * (including pure-SQL clients like Thrift/Connect) with no driver-side
  * `GraftFunctions.register` call. Injection happens at session build, so
  * the functions resolve before any user code runs.
  *
  * The function set is the same `GraftFunctions.builders` list the
  * per-session [[graft.functions.GraftFunctions.register]] uses — one
  * source of truth, two installation modes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
