package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash of a whole string: fold
  * (acc·131 + codePoint) mod 2³¹−1 over the string's Unicode code points,
  * left to right — EXACTLY the fold `Text.docHash` expresses declaratively
  * with `aggregate(transform(sequence(…), ascii(substring(…))))` and the
  * DuckDB twin expresses with `list_reduce(list_transform(range(…),
  * ascii(text[i])))`. Spark's `substring`/`ascii` pair and DuckDB's
  * `text[i]`/`ascii` both operate on code points, as does this loop
  * (`codePointAt`/`charCount`), so all three produce identical longs —
  * asserted against the declarative form in tests and pinned end-to-end by
  * the `q_split` oracle.
  *
  * Exists for the same reason as `DotProduct`: higher-order array
  * functions evaluate interpreted (no whole-stage codegen, no CSE), and
  * the per-character expression fold measured ~1.8s/5000 docs at sf0.1
  * where this loop is ~20× cheaper. Preference order, as everywhere in the
  * engine: built-ins → custom codegen `Expression` → `mapPartitions` last.
  *
  * Null string → null (standard unary null semantics); empty string → 0
  * (the fold's initial accumulator, matching both twins).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call keeps the generated code identical to eval (and tiny)
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** The shared kernel for both the interpreted and generated paths. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }
}
