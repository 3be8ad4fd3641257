package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VectorExprs.FloatDot

/** Catalyst optimizer rule: rewrite the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *             0.0, (acc, v) => acc + v)
  *
  * over two array<float> columns into the native codegen'd [[FloatDot]]
  * kernel. The HOF form is interpreted (HigherOrderFunction lambdas do
  * not participate in whole-stage codegen) and materializes the zipped
  * products array per row; the kernel is a fused loop computing the
  * bit-identical sequential double fold (VectorExprSpec), so the
  * rewrite is semantics-preserving for ALL inputs: null arrays, null
  * elements and length mismatches all yield null in both forms, and
  * IEEE multiply is commutative so either factor order matches.
  *
  * This is the preference ladder the engine follows: compose built-ins
  * first; when a composed hot loop shows up in profiles, swap in a
  * native Expression via a rule so EXISTING declarative call sites
  * (and SQL users) speed up without being rewritten by hand.
  */
object FloatDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a match {
      case v: NamedLambdaVariable => v.exprId == b.exprId
      case _ => false
    }

  /** x*y (in either order) where x, y cast the two lambda vars to double. */
  private def isPairProduct(f: Expression,
                            x: NamedLambdaVariable,
                            y: NamedLambdaVariable): Boolean = f match {
    case Multiply(Cast(l, DoubleType, _, _), Cast(r, DoubleType, _, _), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case agg @ ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(prod,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(accRef, vRef, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(finRef, Seq(fin: NamedLambdaVariable), _))
          if zero == 0.0 &&
            isFloatArray(left) && isFloatArray(right) &&
            isPairProduct(prod, x, y) &&
            sameVar(accRef, acc) && sameVar(vRef, v) &&
            sameVar(finRef, fin) =>
        FloatDot(left, right)
    }
}

/** Catalyst optimizer rule: rewrite `size(array_intersect(a, b))` over
  * two array<bigint> columns into the native
  * [[graft.functions.TextHashExprs.IntersectCountLong]] kernel — the
  * exact-Jaccard verification loop of the dedup family. The built-in
  * form materializes the intersection ArrayData per row just to take
  * its length; the kernel counts via one sort + binary searches with
  * zero allocation of the result array, with identical semantics for
  * null arrays, null elements (present-in-both counts once) and
  * duplicates (ArrayIntersect dedups). Only the non-legacy `size`
  * (size(NULL) = NULL) matches the kernel's null contract, so the
  * legacy form is left alone. */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.LongType

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, false)
          if isLongArray(ai.left) && isLongArray(ai.right) =>
        graft.functions.TextHashExprs.IntersectCountLong(ai.left, ai.right)
    }
}

/** Session extension wiring (config `spark.sql.extensions` =
  * `graft.ext.GraftExtensions`): injects the optimizer rules and the
  * `float_dot` / `srp_sig` / `intersect_count` SQL functions.
  * [[GraftExtensions.install]] does the same for an ALREADY-RUNNING
  * session through the public `experimental.extraOptimizations` hook
  * (optimizer rules only — function registration needs session
  * construction time). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FloatDotRewrite)
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
    ext.injectFunction(GraftExtensions.floatDotFn)
    ext.injectFunction(GraftExtensions.srpSigFn)
    ext.injectFunction(GraftExtensions.intersectCountFn)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorExprs", null, name, usage, "")

  val floatDotFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - double dot product of two array<float>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot takes (array<float>, array<float>)")
        FloatDot(args(0), args(1))
      })

  val srpSigFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("srp_sig"),
      info("srp_sig", "srp_sig(emb, nPlanes, table) - sign-random-projection bucket signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "srp_sig takes (array<float>, int, int)")
        val np = args(1) match {
          case Literal(i: Int, _) => i
          case other => throw new IllegalArgumentException(
            s"srp_sig nPlanes must be an int literal, got $other")
        }
        val tbl = args(2) match {
          case Literal(i: Int, _) => i
          case other => throw new IllegalArgumentException(
            s"srp_sig table must be an int literal, got $other")
        }
        graft.functions.VectorExprs.SrpSig(args(0), np, tbl)
      })

  val intersectCountFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("intersect_count"),
      new ExpressionInfo("graft.functions.TextHashExprs", null,
        "intersect_count",
        "intersect_count(a, b) - |array_intersect(a, b)| for array<bigint> without materializing it",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "intersect_count takes (array<bigint>, array<bigint>)")
        graft.functions.TextHashExprs.IntersectCountLong(args(0), args(1))
      })

  private val rules = Seq(FloatDotRewrite, IntersectCountRewrite)

  /** Attach the rewrite rules to a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      cur ++ rules.filterNot(cur.contains)
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(rules.contains)
}
