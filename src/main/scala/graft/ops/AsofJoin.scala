package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with the same
  * key and right.ts <= left.ts (time-series point-in-time lookup).
  *
  * Not present in the reference (SURVEY §2.2) but fundamental to its
  * domain — joining an event stream against the day-lake's latest
  * state. Implemented with the union-then-window technique rather than
  * a range join: tag both sides, sort within each key by (ts, side)
  * with right rows first on ties, and carry the last non-null right
  * payload forward. One shuffle + sort per key — O((|L|+|R|) log) per
  * partition, no quadratic range expansion, skew handled by AQE like
  * any other keyed sort. Ties on equal ts match the right row
  * ("at-or-before" inclusive), the same convention as DuckDB/kdb ASOF.
  *
  * @param left  must contain `keyCol`, `tsCol`; all other columns kept
  * @param right must contain `keyCol`, `tsCol`; its other columns are
  *              emitted with `rightPrefix`
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == keyCol).toSeq
    val lCols = left.columns.toSeq

    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rPayloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side"),
        struct(rPayloadCols.map(col): _*).as("_r")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = l.select(
      (Seq(col(keyCol), col(tsCol), col("_side"), col("_r")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
      .unionByName(r)

    // _r as the final sort key makes the choice among right rows that
    // tie on (key, ts) deterministic (struct ordering is field-wise);
    // left rows carry null _r and are unaffected.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("_matched", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(col) ++
        rPayloadCols.map(c =>
          col(s"_matched.$c").as(s"$rightPrefix$c")): _*)
  }
}
