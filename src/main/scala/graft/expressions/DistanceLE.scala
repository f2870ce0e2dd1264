package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, LessThanOrEqual, Predicate, Sqrt}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Marker predicate `graft_dist_le(lcx, lcy, rcx, rcy, radius)` ≡
  * `sqrt((lcx-rcx)² + (lcy-rcy)²) <= radius`.
  *
  * Fully evaluable on its own (so plans are correct even if the
  * optimizer rule never fires), but its real purpose is to be a
  * RECOGNIZABLE join-condition marker for [[graft.optimizer.BandJoinRewrite]],
  * which rewrites an inner join carrying this conjunct into the
  * grid-cell equi-join (SURVEY §4 P1 / §7.1 "custom Rule" deliverable).
  * After the rewrite the marker is replaced by its [[expanded]] form, so
  * the rule never re-fires.
  */
case class DistanceLE(
    lcx: Expression, lcy: Expression,
    rcx: Expression, rcy: Expression,
    radius: Expression)
    extends Expression with Predicate with CodegenFallback {

  override def children: Seq[Expression] = Seq(lcx, lcy, rcx, rcy, radius)

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dist_le expects 5 double arguments, got ${children.map(_.dataType.simpleString)}")

  override def prettyName: String = "graft_dist_le"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(a, b, c, d, r) = vals.map(_.asInstanceOf[Double])
      val dx = a - c
      val dy = b - d
      math.sqrt(dx * dx + dy * dy) <= r
    }
  }

  /** The primitive-expression equivalent (used as residual filter after
    * the band-join rewrite).
    */
  def expanded: Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, Subtract}
    val dx = Subtract(lcx, rcx)
    val dy = Subtract(lcy, rcy)
    LessThanOrEqual(Sqrt(Add(Multiply(dx, dx), Multiply(dy, dy))), radius)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DistanceLE =
    DistanceLE(c(0), c(1), c(2), c(3), c(4))
}
