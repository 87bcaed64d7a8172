package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built [[BloomFilter]] sketch —
  * the corpus-side prune of scale-path decontamination
  * (TextAnalysis.decontaminateBloom).
  *
  * The sketch rides the expression itself (serialized once into the
  * task closure, referenced via `addReferenceObj` in codegen), so the
  * probe is a branch-free bit test inside whole-stage codegen — no UDF,
  * no per-row boxing. Both the interpreted and codegen paths go through
  * `mightContainBinary` on the value's UTF-8 bytes, the same bytes
  * `DataFrameStatFunctions.bloomFilter` hashed at build time, so
  * build/probe semantics can never drift.
  *
  * Probes may return false positives (bounded by the build-time fpp),
  * never false negatives — callers MUST re-verify candidates exactly
  * (decontaminateBloom's verify join) when exact output is required.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bf = ctx.addReferenceObj("graftBloom", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainBinary($c.getBytes());"
    })

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomExpressions {
  /** Column wrapper: true iff `c` might be in `filter` (no false
    * negatives; false positives at the filter's fpp). */
  def bloomMightContain(c: Column, filter: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), filter))
}
