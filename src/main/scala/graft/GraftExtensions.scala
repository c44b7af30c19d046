package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

import graft.functions.{Fnv1a64, FnvGrams, HashSetCountDistinct, SlidingMin, SortedInterCount, TopKAgg, VectorDot}

/** Cluster-wide injection point: set
  * `spark.sql.extensions=graft.GraftExtensions` and every session —
  * including thrift-server / connect sessions that never call
  * [[Engine.register]] — gets graft's SQL functions. This is the Spark
  * analogue of installing the reference's `.so` on HDFS once and
  * running `CREATE AGGREGATE FUNCTION` cluster-wide
  * (`/root/reference/README.md:25-33`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("count300k"),
      new ExpressionInfo(classOf[HashSetCountDistinct].getCanonicalName, "count300k"),
      (exprs: Seq[Expression]) =>
        HashSetCountDistinct(Cast(exprs.head, StringType))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getCanonicalName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv1a64].getCanonicalName, "fnv64"),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getCanonicalName, "topk_agg"),
      (exprs: Seq[Expression]) => TopKAgg(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("fnv_grams"),
      new ExpressionInfo(classOf[FnvGrams].getCanonicalName, "fnv_grams"),
      (exprs: Seq[Expression]) => FnvGrams(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sliding_min"),
      new ExpressionInfo(classOf[SlidingMin].getCanonicalName, "sliding_min"),
      (exprs: Seq[Expression]) => SlidingMin(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_inter_count"),
      new ExpressionInfo(classOf[SortedInterCount].getCanonicalName, "sorted_inter_count"),
      (exprs: Seq[Expression]) => SortedInterCount(exprs(0), exprs(1))))
  }
}
