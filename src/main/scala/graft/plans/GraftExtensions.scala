package graft.plans

import graft.functions.DotF32
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, BloomFilterMightContain, Cast, Expression, ExpressionInfo, LambdaFunction, Literal, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Session extensions (SURVEY.md §4): injects the `dot_f32` function and
  * an optimizer rule that rewrites the portable higher-order-function dot
  * product — aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (s,x) -> s+x) —
  * into the codegen [[DotF32]] expression. Users keep writing the
  * engine-portable HOF form; the plan runs the tight primitive loop
  * (HOFs interpret their lambda per element and block whole-stage
  * codegen).
  *
  * Wire up with:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions) … or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotF32(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    // Runtime-filter surface (the InjectRuntimeFilter machinery, exposed as
    // user-callable functions): bloom_agg(xxhash64(k), n_items) builds a
    // bloom filter over the build side; might_contain(bf, xxhash64(k))
    // pre-filters the probe side BEFORE its shuffle. Catalyst only injects
    // these automatically when CBO stats exist; exposing them lets a query
    // author force the 100 TB pattern (tiny dim → bloom → fact scan prune).
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child)         => new BloomFilterAggregate(child)
        case Seq(child, items)  => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException("bloom_agg(child[, items[, bits]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs.head, exprs(1))))
  }
}

/** aggregate(zip_with(a, b, (x,y) -> X*Y), 0.0, (s,x) -> s+x) → DotF32(a,b)
  * when a and b are ARRAY<FLOAT> and the multiply operands are the lambda
  * variables (bare or double-cast). The rewrite preserves semantics
  * exactly for ALL inputs: DotF32 folds in index order with a double
  * accumulator (what the HOF form computes) AND reproduces the HOF's
  * NULL behavior — unequal array lengths or any null element → NULL
  * (zip_with null-pads and the null product poisons the sum). */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(_, _), DoubleType, _, _) => e.eval() == 0.0
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(sx, sy, _), Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isFloatArray(a) && isFloatArray(b) && isZero(zero) &&
          ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
          ((isVar(sx, s) && isVar(sy, v)) || (isVar(sx, v) && isVar(sy, s))) &&
          isIdentityFinish(finish) =>
      DotF32(a, b)
  }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
