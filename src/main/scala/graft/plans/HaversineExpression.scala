package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst haversine-km expression with whole-stage codegen.
  *
  * Same formula as the reference (backend/hybrid_search.py:13-33: R=6371,
  * asin form) and as [[graft.functions.geo.haversineKm]]'s composed-Column
  * version; this one evaluates as a single fused Java expression inside
  * WholeStageCodegen instead of a 12-node expression tree, and is the
  * anchor the [[BoundingBoxRule]] optimizer rule pattern-matches on.
  *
  * Math.pow(x, 2) mirrors SQL pow() — the composed version passes the
  * DuckDB oracle with that pairing, so this stays bit-compatible.
  */
case class HaversineKm(lat1: Expression, lon1: Expression,
                       lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  // ExpectsInputTypes is private[sql] in Spark 4 — enforce doubles manually
  // (graft.functions.geo wraps operands with cast to double)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects 4 DOUBLE arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable

  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineKm.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.HaversineKm.compute($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineKm =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object HaversineKm {
  val EarthRadiusKm = 6371.0

  /** shared by interpreted eval and generated code — one implementation,
    * no drift */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dlat = Math.toRadians(lat2 - lat1)
    val dlon = Math.toRadians(lon2 - lon1)
    val a = Math.pow(Math.sin(dlat / 2), 2) +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        Math.pow(Math.sin(dlon / 2), 2)
    EarthRadiusKm * 2.0 * Math.asin(Math.sqrt(a))
  }
}
