package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, DotProduct}

/** Cluster-deploy entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers graft's native
  * SQL functions in EVERY session the cluster builds (including Thrift
  * Server / Connect sessions no user code touches) — the
  * SparkSessionExtensions route VectorExpressions.register's scaladoc
  * promises. Same builders as the programmatic register(); one code
  * path per function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getCanonicalName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
  }
}
