package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive `day` partition predicates from `date_time`
  * row predicates.
  *
  * The lake's partition key is `day = substring(date_time, 1, 10)`
  * (reference semantics, `consolidate.cpp:66`). A query filtering on
  * `date_time` alone scans every day partition because Catalyst cannot
  * know the functional relationship between the two columns. This rule
  * encodes it: for every comparison of `date_time` against a string
  * literal it conjoins the implied bound on `day`, which the Parquet
  * source then turns into partition pruning — the reference's
  * "only touch dirty day files" behavior, recovered declaratively.
  * Implication is sound because the 19-char format is lexicographically
  * ordered and `day` is its 10-char prefix:
  * `dt >= X  =>  day >= X[0,10)`, `dt <= X  =>  day <= X[0,10)`
  * (strict variants weaken to the inclusive day bound), `dt = X =>
  * day = X[0,10)`.
  *
  * Applies only where BOTH `date_time` and `day` string columns are
  * present in the child output — i.e., lake-shaped scans.
  * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object DayPruningRule extends Rule[LogicalPlan] {

  private def dayLit(s: Any): Literal =
    Literal(UTF8String.fromString(
      s.asInstanceOf[UTF8String].toString.take(10)), StringType)

  private def derive(e: Expression, dt: Attribute, day: Attribute)
      : Option[Expression] = e match {
    case GreaterThanOrEqual(a: Attribute, l @ Literal(_, StringType))
        if a.semanticEquals(dt) =>
      Some(GreaterThanOrEqual(day, dayLit(l.value)))
    case GreaterThan(a: Attribute, l @ Literal(_, StringType))
        if a.semanticEquals(dt) =>
      Some(GreaterThanOrEqual(day, dayLit(l.value)))
    case LessThanOrEqual(a: Attribute, l @ Literal(_, StringType))
        if a.semanticEquals(dt) =>
      Some(LessThanOrEqual(day, dayLit(l.value)))
    case LessThan(a: Attribute, l @ Literal(_, StringType))
        if a.semanticEquals(dt) =>
      // dt < "D 00:00:00" excludes day D entirely: every dt with
      // prefix D is >= D's midnight (lexicographic 19-char format).
      if (l.value.toString.endsWith(" 00:00:00"))
        Some(LessThan(day, dayLit(l.value)))
      else Some(LessThanOrEqual(day, dayLit(l.value)))
    case EqualTo(a: Attribute, l @ Literal(_, StringType))
        if a.semanticEquals(dt) =>
      Some(EqualTo(day, dayLit(l.value)))
    // dt IN (L1..Ln)  =>  day IN (prefix(L1)..prefix(Ln)) — each
    // branch implies its own day, so the disjunction implies the
    // prefix set.
    case In(a: Attribute, list)
        if a.semanticEquals(dt) && list.nonEmpty &&
          list.forall {
            case Literal(v, StringType) => v != null
            case _ => false
          } =>
      Some(In(day, list.map(l =>
        dayLit(l.asInstanceOf[Literal].value)).distinct))
    // literal-on-the-left mirror images
    case GreaterThanOrEqual(l @ Literal(_, StringType), a: Attribute)
        if a.semanticEquals(dt) =>
      Some(LessThanOrEqual(day, dayLit(l.value)))
    case LessThanOrEqual(l @ Literal(_, StringType), a: Attribute)
        if a.semanticEquals(dt) =>
      Some(GreaterThanOrEqual(day, dayLit(l.value)))
    case _ => None
  }

  /** The (date_time, day) attribute pair of a lake-shaped scan below
    * `plan`, if any: a file relation whose PARTITION schema contains
    * the string `day` and whose data schema contains the string
    * `date_time`, with both attributes still visible in `plan`'s
    * output (matched by exprId, so a same-named pair from an arbitrary
    * frame — where day need not be date_time's prefix — never
    * triggers the rewrite). */
  private def lakeAttrs(plan: LogicalPlan)
      : Option[(Attribute, Attribute)] =
    plan.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if (l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.partitionSchema.exists(f =>
                f.name == "day" && f.dataType == StringType) &&
              fs.dataSchema.exists(f =>
                f.name == "date_time" && f.dataType == StringType)
            case _ => false
          }) =>
        val dt = l.output.find(a => a.name == "date_time"
          && a.dataType == StringType)
        val day = l.output.find(a => a.name == "day"
          && a.dataType == StringType)
        (dt, day)
    }.flatMap {
      case (Some(dt), Some(day))
          if plan.outputSet.contains(dt) && plan.outputSet.contains(day) =>
        Some((dt, day))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      lakeAttrs(child) match {
        case Some((dt, day)) =>
          val conjuncts = splitConjuncts(cond)
          val derived = conjuncts.flatMap(derive(_, dt, day))
            .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And), child)
        case None => f
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Session extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * That config is STATIC — it binds only when the first session of the
  * JVM creates the SparkContext. For sessions built after the context
  * exists (notebooks, tests), use [[GraftExtensions.install]], which
  * attaches the rule dynamically via `experimental.extraOptimizations`
  * — equivalent here, because partition pruning happens at physical
  * planning, downstream of either injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DayPruningRule)
  }
}

object GraftExtensions {
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(DayPruningRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DayPruningRule
}
