package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused codegen'd cosine similarity: Σab / (√Σa² · √Σb²) computed in ONE
  * pass over the arrays instead of the three passes the composed
  * `dot(a,b) / (norm(a) * norm(b))` form costs. Each of the three sums
  * keeps the exact fold order and guard semantics of its composed
  * counterpart (`DotProduct` over min-length for the numerator; each norm
  * over ITS OWN full array), and the final combination applies the same
  * `sqrt`/`*`//` sequence — so results are bit-identical to the composed
  * form and to the DuckDB `list_reduce` twin; only the number of array
  * element loads changes (3× fewer in the ANN re-rank hot path).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

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
    val la = a.numElements()
    val lb = b.numElements()
    val n = math.max(la, lb)
    var sab = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    val isFloat = elemType(left) == FloatType
    while (i < n) {
      val aOk = i < la && !a.isNullAt(i)
      val bOk = i < lb && !b.isNullAt(i)
      val av = if (aOk) { if (isFloat) a.getFloat(i).toDouble else a.getDouble(i) } else 0.0
      val bv = if (bOk) { if (isFloat) b.getFloat(i).toDouble else b.getDouble(i) } else 0.0
      if (aOk && bOk) sab += av * bv
      if (aOk) sa += av * av
      if (bOk) sb += bv * bv
      i += 1
    }
    sab / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val aOk = ctx.freshName("aOk")
      val bOk = ctx.freshName("bOk")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $n = java.lang.Math.max($la, $lb);
         |double $sab = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $aOk = $i < $la && !$a.isNullAt($i);
         |  boolean $bOk = $i < $lb && !$b.isNullAt($i);
         |  double $av = $aOk ? (double) $a.$getter($i) : 0.0;
         |  double $bv = $bOk ? (double) $b.$getter($i) : 0.0;
         |  if ($aOk && $bOk) $sab += $av * $bv;
         |  if ($aOk) $sa += $av * $av;
         |  if ($bOk) $sb += $bv * $bv;
         |}
         |${ev.value} = $sab / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
