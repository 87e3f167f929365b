package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two numeric arrays — the target of the
  * [[FuseDotProduct]] optimizer rule (and usable directly).
  *
  * Semantics are EXACTLY those of the declarative composition
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0D,
  * (acc,v) -> acc+v)`:
  *  - either input NULL → NULL (BinaryExpression null-intolerance);
  *  - length mismatch → NULL (zip_with pads the short side with NULL,
  *    the padded product is NULL, and the sum of a NULL element is
  *    NULL);
  *  - any NULL element → NULL (same propagation);
  *  - otherwise a sequential left fold in index order — bit-identical
  *    doubles to the HOF form, so a plan may fuse or not fuse freely
  *    without changing any oracle-checked result.
  *
  * Accepts `array<float>` and `array<double>` independently per side
  * (embeddings are float32; hyperplane/centroid literals are double).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  @inline private def get(a: ArrayData, t: DataType, i: Int): Double =
    if (t == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += get(x, tx, i) * get(y, ty, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(t: DataType, arr: String, i: String): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ${getter(elemType(left).get, a, i)} * ${getter(elemType(right).get, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
