package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Injects a sargable bounding-box predicate from a radius predicate.
  *
  * `haversine_km(lat, lon, CLat, CLon) <= R` can never reach a Parquet
  * scan — it is trigonometry over two columns. But it IMPLIES
  * `lat BETWEEN CLat±dLat AND lon BETWEEN CLon±dLon` for
  * dLat = R/110.574 and dLon sized at the WORST latitude inside the band
  * (|CLat|+dLat — see [[graft.functions.geo.bboxDeltas]]; a center-latitude
  * cosine would under-cover near the band's poleward edge). Those
  * comparisons ARE sargable: Catalyst pushes them into the scan, Parquet
  * row-group min/max stats skip most of a geo-partitioned 100 TB table,
  * and the exact haversine predicate still refines the survivors — results
  * are unchanged, only the scan shrinks.
  *
  * This is the engine's substitute for the reference's PostGIS GIST index
  * (backend/import_datasets.py:89-92): an index lookup becomes predicate
  * derivation + storage-level pruning. The rule only fires when the
  * radius predicate compares [[HaversineKm]] over two attribute coords and
  * two FOLDABLE center/radius operands, and it tags nothing — it is purely
  * additive, so it composes with every other optimizer rule.
  */
object BoundingBoxRule extends Rule[LogicalPlan] {

  private def boxPredicates(lat: Expression, lon: Expression,
                            cLat: Double, cLon: Double, r: Double): Expression = {
    // worst-latitude-in-band deltas (shared with geo.inBoundingBoxKm) — a
    // center-latitude cosine would under-cover near the poleward edge
    val (dLat, dLonOpt) = graft.functions.geo.bboxDeltas(cLat, r)
    val latBox = And(GreaterThanOrEqual(lat, Literal(cLat - dLat)),
      LessThanOrEqual(lat, Literal(cLat + dLat)))
    dLonOpt match {
      // band touches a pole (all longitudes reachable) — lat-only prune
      case None => latBox
      // a lon window crossing the antimeridian can't be one BETWEEN — fall
      // back to lat-only pruning there rather than under-cover
      case Some(dLon) if cLon - dLon < -180.0 || cLon + dLon > 180.0 => latBox
      case Some(dLon) => And(latBox,
        And(GreaterThanOrEqual(lon, Literal(cLon - dLon)),
          LessThanOrEqual(lon, Literal(cLon + dLon))))
    }
  }

  private def asDouble(e: Expression): Option[Double] =
    if (e.foldable) e.eval() match {
      case d: java.lang.Double => Some(d)
      case f: java.lang.Float => Some(f.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case l: java.lang.Long => Some(l.toDouble)
      case d: java.math.BigDecimal => Some(d.doubleValue)
      case _ => None
    } else None

  /** Fixpoint marker: the box was already injected iff the EXACT lower
    * lat bound this rule would derive is present. Matching any
    * `lat >= literal` (the old check) silently disabled the rule whenever
    * the user had an unrelated lat bound of their own — losing the lon
    * window and the scan prune with no trace. Matching the derived
    * literal can only skip when that precise bound exists, in which case
    * skipping is correct. */
  private def alreadyBoxed(cond: Expression, lat: Expression,
                           cLat: Double, r: Double): Boolean = {
    val (dLat, _) = graft.functions.geo.bboxDeltas(cLat, r)
    val wantLower = Literal(cLat - dLat)
    cond.exists {
      case GreaterThanOrEqual(l, lit: Literal)
          if l.semanticEquals(lat) && lit.semanticEquals(wantLower) => true
      case _ => false
    }
  }

  /** top-level conjuncts only — a radius predicate under OR/NOT does NOT
    * imply the box for the whole filter (haversine<=r OR vip would wrongly
    * drop out-of-box vip rows if boxed) */
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val extra = splitConjuncts(cond).collect {
        case LessThanOrEqual(
              HaversineKm(lat: Attribute, lon: Attribute, cLatE, cLonE), rE) =>
          for (cLat <- asDouble(cLatE); cLon <- asDouble(cLonE); r <- asDouble(rE)
               if !alreadyBoxed(cond, lat, cLat, r))
            yield boxPredicates(lat, lon, cLat, cLon, r)
        case LessThan(
              HaversineKm(lat: Attribute, lon: Attribute, cLatE, cLonE), rE) =>
          for (cLat <- asDouble(cLatE); cLon <- asDouble(cLonE); r <- asDouble(rE)
               if !alreadyBoxed(cond, lat, cLat, r))
            yield boxPredicates(lat, lon, cLat, cLon, r)
      }.flatten
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }
}
