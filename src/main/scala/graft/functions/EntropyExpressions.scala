package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a text column's CHARACTER distribution —
  * the low-entropy curation gate (repeated-character / templated junk
  * sits far below natural text; CCNet and Gopher both gate on
  * character-level statistics of this family). A native expression,
  * not a UDF: one pass over the string inside whole-stage codegen via
  * a static-helper invocation, map-only at any corpus scale.
  *
  * Counts Unicode CODE POINTS (not UTF-16 units) so the value agrees
  * with engines that split strings into characters (DuckDB's
  * `string_split(text, '')`), making the operator fully
  * oracle-comparable after the shared 6-decimal rounding. entropy =
  * ln(n) - Σ c·ln(c) / n over code-point counts c; empty string → 0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropy.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** ln(n) - Σ c·ln(c)/n over the code-point histogram; summation in
    * ascending code-point order (deterministic within the engine; the
    * 6-decimal rounding absorbs cross-engine accumulation order). */
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.TreeMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.TreeMap[Integer, Integer]()
        other.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      }
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) acc += k * math.log(k.toDouble)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val k = it.next().toInt; acc += k * math.log(k.toDouble) }
    }
    math.log(n.toDouble) - acc / n
  }

  def charEntropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))
}
