package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types._

/** Native kernel for BPE merge-table token counting over a pre-token
  * array — the iterative merge loop is genuinely imperative (no
  * higher-order-function formulation exists that is not quadratic), so
  * it runs as one static helper call per row from generated code, the
  * TextHashExprs discipline. The merge table itself is the static
  * [[graft.textops.Bpe.ranks]] model artifact.
  */
object BpeExprs {

  case class BpeTokenCount(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count needs array<string>, got ${other.simpleString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bpe_token_count"
    override def nullSafeEval(a: Any): Any =
      graft.textops.Bpe.countTokensArr(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.textops.Bpe.countTokensArr($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeTokenCountCol(preTokens: Column): Column =
    shim.column(BpeTokenCount(shim.expression(preTokens)))
}
