package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of a text column — the classic "too
  * compressible = machine-generated / repetitive junk" curation signal
  * (used alongside the Gopher repetition gates; near-random text sits
  * ~1.0, heavily templated boilerplate well under 0.3). A native
  * expression, not a UDF: the deflate call stays inside whole-stage
  * codegen as a static-helper invocation (the same pattern Spark's own
  * string expressions use for their runtime helpers), so the gate scan
  * fuses with the rest of the per-row curation projection.
  *
  * DETERMINISM NOTE: deflate output length is deterministic for a
  * fixed input, level, and zlib implementation — stable within a
  * cluster (one JDK), which is what reproducible curation needs; it is
  * NOT a cross-engine contract, so the operator is rows-only with a
  * planted-text spec rather than a DuckDB oracle.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** compressed bytes / raw bytes at BEST_SPEED; empty text → 1.0. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  def deflateRatio(text: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(text)))
}
