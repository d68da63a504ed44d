package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst vector kernels over `array<double>` columns.
  *
  * The third rung of the performance ladder the project guidance describes
  * (native Expression > Scala UDF > interpreted HOF): these run INSIDE
  * WholeStageCodegen reading ArrayData directly — no per-call
  * `toDoubleArray` copy, no UDF invocation boundary, no codegen fence
  * splitting the surrounding projection. The compute kernels accumulate in
  * exactly the order of [[graft.functions.vectors]]' UDF kernels and
  * DuckDB's `list_dot_product` (sequential left-to-right folds per
  * accumulator), so all three paths produce bit-identical doubles — the
  * oracle gate would catch any drift.
  *
  * Contract: element NULLs are out of scope (embedding columns are arrays
  * of concrete floats; a NULL ARRAY returns NULL via null-safe eval).
  */
object VectorKernels {
  /** Σ aᵢ·bᵢ over min length, sequential. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** cosine = dot/(‖a‖‖b‖), 0.0 when either norm is 0
    * (backend/embeddings.py:130-131). Norms fold over each array's FULL
    * length, the pair dot over the min — same as the UDF kernel. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = Math.sqrt(dot(a, a))
    val nb = Math.sqrt(dot(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Σ (aᵢ−bᵢ)² over min length, BIGINT arrays — EXACT integer squared
    * L2 for quantized vectors (q_kmeans_iter): every distance is the same
    * BIGINT on every engine under every partitioning, so argmin cluster
    * assignment can never flip on float association. Headroom: |q| ≤ 1e4
    * ⇒ per-dim ≤ 4e8, so overflow needs ~2e10 dimensions. */
  def qdistSq(a: ArrayData, b: ArrayData): Long = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }
}

sealed abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects 2 ARRAY<DOUBLE> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
}

/** `dot_product(a, b)` */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a, b)` */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `qdist_sq(a, b)` — exact integer squared L2 over ARRAY<BIGINT>. */
case class QDistSq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "qdist_sq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects 2 ARRAY<BIGINT> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.qdistSq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernels.qdistSq($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDistSq =
    copy(left = newLeft, right = newRight)
}
