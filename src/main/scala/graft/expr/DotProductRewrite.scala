package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the idiomatic expression-tree dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, x) => acc + x)
  *
  * into the fused `graft_dot` kernel, so a user who writes the natural
  * higher-order-function formulation gets the codegen'd primitive loop
  * without knowing the kernel exists. The match is deliberately strict:
  * double-element arrays, a bare-variable multiply lambda, a zero literal
  * of 0.0, a bare-variable add merge (either operand order — IEEE double
  * `+`/`*` are bitwise commutative outside NaN payloads), and an identity
  * finish lambda. Anything else (float elements with inserted casts, a
  * different fold, a transformed finish) is left untouched.
  *
  * Semantics note (same contract as VecOps.dot): equal-length, null-free
  * arrays — the vector invariant every embedding pipeline already holds.
  * The match additionally requires `containsNull = false` element types, so
  * an array that CAN hold null elements (where the HOF form null-poisons
  * the sum but the kernel would return a number) is never rewritten. The
  * remaining divergence — mismatched lengths null-poison the HOF form but
  * sum the common prefix in the kernel — cannot be checked statically and
  * is part of the opt-in contract. The rule is installed only via the
  * explicit `GraftExtensions` / `GraftFunctions.installDotRewrite` opt-in,
  * never injected behind anyone's back.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** Both operands are exactly the two lambda variables, in either order. */
  private def bareVars(x: Expression, y: Expression, vars: Seq[NamedExpression]): Boolean =
    vars.length == 2 &&
      ((x.semanticEquals(vars(0)) && y.semanticEquals(vars(1))) ||
        (x.semanticEquals(vars(1)) && y.semanticEquals(vars(0))))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(left, right, LambdaFunction(Multiply(mx, my, _), margs, _)),
        Literal(0.0d, DoubleType),
        LambdaFunction(Add(ax, ay, _), aargs, _),
        LambdaFunction(fin, fargs, _))
        if isDoubleArray(left) && isDoubleArray(right) &&
          bareVars(mx, my, margs) && bareVars(ax, ay, aargs) &&
          fargs.length == 1 && fin.semanticEquals(fargs.head) =>
      DotProduct(left, right)
  }
}
