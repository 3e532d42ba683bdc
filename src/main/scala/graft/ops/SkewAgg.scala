package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase salted groupBy.
  *
  * A single hot key (the classic 100 TB failure mode: one user, one
  * day, one boilerplate document) funnels its entire group through one
  * reducer. Salting splits each key into `buckets` sub-groups for the
  * first (wide, parallel) partial aggregation, then re-aggregates the
  * per-salt partials in a second, tiny shuffle keyed by the real key.
  *
  * Only algebraic aggregates decompose this way; the helper exposes the
  * common ones (count/sum/min/max and avg via sum+count). AQE's skew
  * handling covers sort-merge JOINs; skewed AGGREGATION keys still need
  * this treatment.
  */
object SkewAgg {

  final case class Agg(kind: String, col: String, as: String)

  def count(as: String): Agg = Agg("count", "", as)
  def sum(c: String, as: String): Agg = Agg("sum", c, as)
  def min(c: String, as: String): Agg = Agg("min", c, as)
  def max(c: String, as: String): Agg = Agg("max", c, as)
  def avg(c: String, as: String): Agg = Agg("avg", c, as)

  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)).cast("int"))

    // phase 1: partial aggregates per (key, salt)
    val partials: Seq[Column] = aggs.flatMap {
      case Agg("count", _, as) =>
        Seq(functions.count(lit(1)).as(s"_p_cnt_$as"))
      case Agg("sum", c, as) =>
        Seq(functions.sum(col(c)).as(s"_p_sum_$as"))
      case Agg("min", c, as) =>
        Seq(functions.min(col(c)).as(s"_p_min_$as"))
      case Agg("max", c, as) =>
        Seq(functions.max(col(c)).as(s"_p_max_$as"))
      case Agg("avg", c, as) =>
        Seq(functions.sum(col(c)).as(s"_p_sum_$as"),
          functions.count(col(c)).as(s"_p_cnt_$as"))
      case a => throw new IllegalArgumentException(s"unsupported $a")
    }
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)

    // phase 2: merge partials per key
    val finals: Seq[Column] = aggs.map {
      case Agg("count", _, as) =>
        functions.sum(col(s"_p_cnt_$as")).as(as)
      case Agg("sum", _, as) =>
        functions.sum(col(s"_p_sum_$as")).as(as)
      case Agg("min", _, as) =>
        functions.min(col(s"_p_min_$as")).as(as)
      case Agg("max", _, as) =>
        functions.max(col(s"_p_max_$as")).as(as)
      case Agg("avg", _, as) =>
        (functions.sum(col(s"_p_sum_$as")) /
          functions.sum(col(s"_p_cnt_$as"))).as(as)
      case a => throw new IllegalArgumentException(s"unsupported $a")
    }
    phase1.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  private object functions {
    def count(c: Column) = org.apache.spark.sql.functions.count(c)
    def sum(c: Column) = org.apache.spark.sql.functions.sum(c)
    def min(c: Column) = org.apache.spark.sql.functions.min(c)
    def max(c: Column) = org.apache.spark.sql.functions.max(c)
  }
}
