package graft.optimizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.expressions.DistanceLE

/** Optimizer rule: rewrites an inner join whose condition carries a
  * `graft_dist_le(lcx, lcy, rcx, rcy, radius)` conjunct into a
  * grid-cell EQUI-join + residual distance filter (SURVEY §4 P1 —
  * the reference's hand-rolled SpatialIndex, done as a Catalyst
  * rewrite, registered via SparkSessionExtensions).
  *
  * Shape produced (cell size = radius ⇒ 3×3 neighborhood):
  *
  *   Project(original output)
  *     Join Inner (lcellx = rcellx AND lcelly = rcelly AND <other conjuncts>
  *                 AND sqrt((lcx-rcx)²+(lcy-rcy)²) <= radius)
  *       :- Project(+ lcellx, lcelly)            -- cell0 + exploded offset
  *       :    Generate(explode([-1,0,1]×[-1,0,1]))
  *       :      Project(+ cx0, cy0)
  *       :        <left>
  *       +- Project(+ rcellx, rcelly)
  *            <right>
  *
  * The equi keys turn what would be a nested-loop theta join into a
  * hash join whose shuffle AQE can further broadcast or skew-split —
  * |left|·9 + |right| rows moved instead of the per-key cross product.
  * The marker is replaced by its expanded primitive form, so the rule
  * is idempotent.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitAnd(cond)
      conjuncts.collectFirst {
        case d: DistanceLE
            if d.lcx.references.subsetOf(left.outputSet) &&
              d.lcy.references.subsetOf(left.outputSet) &&
              d.rcx.references.subsetOf(right.outputSet) &&
              d.rcy.references.subsetOf(right.outputSet) &&
              d.radius.foldable => d
      } match {
        case Some(d) =>
          val others = conjuncts.filterNot(_ eq d)
          rewrite(j, left, right, d, others, hint)
        case None => j
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      d: DistanceLE, others: Seq[Expression],
                      hint: JoinHint): LogicalPlan = {
    val radius = d.radius.eval(null).asInstanceOf[Double]
    if (radius <= 0) return j
    val cs = Literal(radius)

    def cell(c: Expression): Expression = Floor(Divide(c, cs)) // double -> long

    // left: cell0 columns, exploded 3x3 neighborhood, final cell keys
    val cx0 = Alias(cell(d.lcx), "__cx0")()
    val cy0 = Alias(cell(d.lcy), "__cy0")()
    val projL1 = Project(left.output ++ Seq(cx0, cy0), left)
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield CreateStruct(Seq(Literal(dx.toLong), Literal(dy.toLong)))
    val gen = Explode(CreateArray(offsets))
    val offAttr = AttributeReference("__off", gen.elementSchema.fields(0).dataType)()
    val generate = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(offAttr), child = projL1)
    val lcellx = Alias(Add(cx0.toAttribute,
      GetStructField(offAttr, 0)), "__lcellx")()
    val lcelly = Alias(Add(cy0.toAttribute,
      GetStructField(offAttr, 1)), "__lcelly")()
    val projL2 = Project(left.output ++ Seq(lcellx, lcelly), generate)

    // right: direct cell keys
    val rcellx = Alias(cell(d.rcx), "__rcellx")()
    val rcelly = Alias(cell(d.rcy), "__rcelly")()
    val projR = Project(right.output ++ Seq(rcellx, rcelly), right)

    val equiCells = Seq(
      EqualTo(lcellx.toAttribute, rcellx.toAttribute),
      EqualTo(lcelly.toAttribute, rcelly.toAttribute))
    val newCond = (equiCells ++ others :+ d.expanded).reduce(And)
    val newJoin = Join(projL2, projR, Inner, Some(newCond), hint)
    Project(j.output, newJoin)
  }
}
