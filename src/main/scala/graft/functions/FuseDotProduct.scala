package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the engine's canonical declarative
  * dot-product patterns into the fused [[DotProduct]] expression.
  *
  * Users (and the engine's own operators) write the Spark-idiomatic
  * higher-order-function form; this rule turns it into one codegen
  * loop with no intermediate arrays:
  *
  *  - `aggregate(zip_with(l, r, (x,y) -> double(x) * double(y)),
  *     0.0D, (acc,v) -> acc + v)`            → `dot_product(l, r)`
  *  - `aggregate(transform(e, x -> double(x) * double(x)),
  *     0.0D, (acc,v) -> acc + v)`            → `dot_product(e, e)`
  *     (the self-square norm form)
  *
  * The rewrite is a pure fusion: [[DotProduct]] reproduces the HOF
  * composition's fold order and NULL/length semantics bit-identically
  * (see its Scaladoc), so plans may fuse or not without changing
  * results. Registered via `spark.experimental.extraOptimizations`
  * (runtime) or `SparkSessionExtensions.injectOptimizerRule` (config).
  *
  * Runs after constant folding, so the `cast(0 as double)` zero
  * literal has already collapsed to `Literal(0.0)`.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  /** The lambda body operand shapes that mean "this variable as a
    * double": the variable itself if already double, or an exact
    * double cast of it. */
  private def asDoubleVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case v: NamedLambdaVariable => Some(v)
        case _ => None
      }
    case _ => None
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** merge = (acc, v) -> acc + v, finish = identity. */
  private def isSumMergeAndIdentityFinish(merge: Expression, finish: Expression): Boolean =
    (merge, finish) match {
      case (LambdaFunction(add: Add, Seq(acc, v), false),
            LambdaFunction(body, Seq(id), false)) =>
        isVar(add.left, acc) && isVar(add.right, v) && isVar(body, id)
      case _ => false
    }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** body = double(x) * double(y) for the given lambda args (in either
    * operand order — double multiplication commutes bit-exactly). */
  private def isDoubleProduct(body: Expression, x: NamedExpression, y: NamedExpression): Boolean =
    body match {
      case m: Multiply =>
        (asDoubleVar(m.left), asDoubleVar(m.right)) match {
          case (Some(a), Some(b)) =>
            (a.exprId == x.exprId && b.exprId == y.exprId) ||
              (a.exprId == y.exprId && b.exprId == x.exprId)
          case _ => false
        }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dot form: aggregate(zip_with(l, r, (x,y) -> dx * dy), 0.0, +)
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(body, Seq(x, y), false)),
        DoubleLit(0.0), merge, finish)
      if numericArray(l) && numericArray(r) &&
        isDoubleProduct(body, x, y) &&
        isSumMergeAndIdentityFinish(merge, finish) =>
      DotProduct(l, r)

    // norm form: aggregate(transform(e, x -> dx * dx), 0.0, +)
    case ArrayAggregate(
        ArrayTransform(e, LambdaFunction(body, Seq(x), false)),
        DoubleLit(0.0), merge, finish)
      if numericArray(e) &&
        isDoubleProduct(body, x, x) &&
        isSumMergeAndIdentityFinish(merge, finish) =>
      DotProduct(e, e)
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(d: Double, DoubleType) => Some(d)
      case _ => None
    }
  }
}
