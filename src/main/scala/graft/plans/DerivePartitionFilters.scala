package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive `part_year` / `part_month` partition
  * predicates from `date_key` filters over the engine's monthly lake
  * layout (`Writer.writeMonthlyPartitioned`: part_year = date_key /
  * 10000, part_month = date_key / 100 % 100).
  *
  * A caller filtering a fact by a yyyymmdd `date_key` range gets full
  * partition pruning without hand-writing the partition columns — the
  * derived predicates are IMPLIED by the original filter, so results
  * are unchanged, but they name the partition columns Catalyst's
  * pruning understands, so a 100 TB scan touches only the matching
  * month directories. This is the engine's Spark-native replacement
  * for the reference's plpgsql monthly RANGE partitions, where the
  * Postgres planner does the same derivation from the partition bound
  * metadata (`db/init/01-schema.sql:139-181`).
  *
  * Deliberately narrow trigger: a `Filter` whose child outputs all of
  * `date_key` (integral), `part_year`, `part_month`. Bounds are read
  * from integral-literal comparisons on `date_key`; a one-shot tag
  * keeps the rule idempotent across fixpoint iterations.
  */
object DerivePartitionFilters extends Rule[LogicalPlan] {

  private val Derived = TreeNodeTag[Boolean]("graft.derivedPartitionFilters")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if f.getTagValue(Derived).isEmpty &&
        Seq("date_key", "part_year", "part_month").forall(n =>
          child.output.exists(_.name == n)) =>
      val dk = child.output.find(_.name == "date_key").get
      val py = child.output.find(_.name == "part_year").get
      val pm = child.output.find(_.name == "part_month").get
      // the derivation is only sound when all three attributes come
      // from the SAME leaf relation — above a join, a name-matched
      // date_key from one side paired with the other side's partition
      // columns would inject a predicate that drops correct rows
      val derived =
        if (sameLeafLineage(child, dk, py, pm)) derive(cond, dk, py, pm)
        else Seq.empty
      val out =
        if (derived.isEmpty) f
        else Filter(derived.foldLeft(cond)(And(_, _)), child)
      out.setTagValue(Derived, true)
      out
  }

  /** True iff one single leaf below `child` outputs all three
    * attributes (matched by exprId, not name). */
  private def sameLeafLineage(child: LogicalPlan, dk: Attribute,
      py: Attribute, pm: Attribute): Boolean =
    child.collectLeaves().exists { leaf =>
      val ids = leaf.output.map(_.exprId).toSet
      Seq(dk, py, pm).forall(a => ids.contains(a.exprId))
    }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** (lo, hi) inclusive bounds on date_key implied by the conjuncts. */
  private def bounds(cond: Expression,
      dk: Attribute): (Option[Long], Option[Long]) = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    split(cond).foreach {
      case EqualTo(a: Attribute, l) if a.semanticEquals(dk) =>
        intLit(l).foreach { v => tightenLo(v); tightenHi(v) }
      case EqualTo(l, a: Attribute) if a.semanticEquals(dk) =>
        intLit(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(dk) =>
        intLit(l).foreach(tightenLo)
      case GreaterThan(a: Attribute, l) if a.semanticEquals(dk) =>
        intLit(l).foreach(v => tightenLo(v + 1))
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(dk) =>
        intLit(l).foreach(tightenHi)
      case LessThan(a: Attribute, l) if a.semanticEquals(dk) =>
        intLit(l).foreach(v => tightenHi(v - 1))
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(dk) =>
        intLit(l).foreach(tightenHi) // lit >= dk  ⇒  dk <= lit
      case GreaterThan(l, a: Attribute) if a.semanticEquals(dk) =>
        intLit(l).foreach(v => tightenHi(v - 1))
      case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(dk) =>
        intLit(l).foreach(tightenLo) // lit <= dk  ⇒  dk >= lit
      case LessThan(l, a: Attribute) if a.semanticEquals(dk) =>
        intLit(l).foreach(v => tightenLo(v + 1))
      case _ => ()
    }
    (lo, hi)
  }

  private def derive(cond: Expression, dk: Attribute, py: Attribute,
      pm: Attribute): Seq[Expression] = {
    val (lo, hi) = bounds(cond, dk)
    def yr(d: Long): Int = (d / 10000).toInt
    def mo(d: Long): Int = (d / 100 % 100).toInt
    val yearPreds = Seq(
      lo.map(l => GreaterThanOrEqual(py, Literal(yr(l)))),
      hi.map(h => LessThanOrEqual(py, Literal(yr(h))))).flatten
    // month bounds are only implied when both ends fall in ONE year
    val monthPreds = (lo, hi) match {
      case (Some(l), Some(h)) if yr(l) == yr(h) =>
        Seq(GreaterThanOrEqual(pm, Literal(mo(l))),
          LessThanOrEqual(pm, Literal(mo(h))))
      case _ => Seq.empty
    }
    yearPreds ++ monthPreds
  }
}
