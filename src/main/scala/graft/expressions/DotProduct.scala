package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays (float or double), summing
  * left-to-right in double — the SAME fold order and IEEE ops as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so results are bit-identical
  * to the declarative form and to the DuckDB oracle's `list_reduce` twin.
  *
  * Exists because Spark's higher-order array functions are evaluated
  * interpreted (no whole-stage codegen, no CSE inside lambdas): on the
  * sf0.1 brute-force top-k this expression measured ~5× faster than the
  * fold. This is the preference order the engine follows: built-in
  * functions → custom codegen `Expression` → `mapPartitions` last.
  *
  * Null handling: a null array yields null (standard BinaryExpression
  * semantics); null ELEMENTS are not expected (embeddings are dense) and
  * contribute 0 rather than poisoning the sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Set[DataType](FloatType, DoubleType).contains(lt) && lt == rt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two arrays of float or two arrays of double, " +
            s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    if (elemType(left) == FloatType) {
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i))
          sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i))
          sum += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += (double) $a.$getter($i) * (double) $b.$getter($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
