package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite integer *band joins* into equi-joins.
  *
  * Spark has no native range/band join planning — a join whose only
  * condition is `abs(a.k − b.k) <= c` plans as BroadcastNestedLoopJoin
  * (or a full cartesian with a filter), which is O(|A|·|B|) and the classic
  * scale cliff for proximity joins (time buckets, grid cells, versions).
  *
  * This rule recognizes `Join(A, B, Inner, abs(ak − bk) <= c [AND rest])`
  * with integral `ak`, `bk` and a small literal `c`, and rewrites the left
  * side to explode the band offsets: `A × generate(o ∈ [−c, c])` joined to
  * B on `ak + o = bk` — a hash-partitionable equi-join. Work becomes
  * O((2c+1)·|A|) shuffle rows instead of |A|·|B| pairs — the same
  * formulation the geometry operators apply by hand (SURVEY §4: "this is a
  * query formulation, not an optimizer extension" — this rule makes it an
  * optimizer extension, so any SQL user of the session gets it).
  *
  * Enabled via `spark.sql.extensions=graft.plans.GraftExtensions` (injected
  * as an optimizer rule) — results are identical by construction; the rule
  * only fires for Inner joins with integral keys and 0 < c <= maxBand.
  */
case class BandJoinRule(maxBand: Long = 64) extends Rule[LogicalPlan] {

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Matches abs(ak − bk) <= c and returns (ak, bk, c) with ak from left. */
  private def matchBand(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = cond match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(c: Long, LongType))
        if c > 0 && c <= maxBand => orient(x, y, c, left, right)
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(c: Int, IntegerType))
        if c > 0 && c <= maxBand => orient(x, y, c.toLong, left, right)
    case _ => None
  }

  private def orient(x: Expression, y: Expression, c: Long,
                     left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    def from(p: LogicalPlan, e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (!isIntegral(x) || !isIntegral(y)) None
    else if (from(left, x) && from(right, y)) Some((x, y, c))
    else if (from(left, y) && from(right, x)) Some((y, x, c))
    else None
  }

  private def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case e => Seq(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = split(cond)
      val banded = conjuncts.flatMap(c => matchBand(c, left, right).map(c -> _)).headOption
      banded match {
        case Some((bandConj, (ak, bk, c))) =>
          // A × explode(offsets) with offset attribute o
          val offsets = CreateArray((-c to c).map(Literal(_)))
          val gen = Explode(offsets)
          val genOut = AttributeReference("_band_o", LongType, nullable = false)()
          val generate = Generate(gen, unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(genOut), left)
          val equi = EqualTo(Add(Cast(ak, LongType), genOut), Cast(bk, LongType))
          val rest = conjuncts.filterNot(_ eq bandConj)
          // the band conjunct is dropped, not kept: for each pair with
          // |ak − bk| = d <= c exactly one offset o = bk − ak satisfies the
          // equi condition, so the rewrite is exact — and keeping the
          // original abs() predicate would re-match this rule on the next
          // fixed-point iteration and loop the optimizer
          val newCond = (Seq(equi) ++ rest).reduce(And)
          val joined = Join(generate, right, Inner, Some(newCond), hint)
          // project the band offset back out
          Project(j.output, joined)
        case None => j
      }
  }
}
