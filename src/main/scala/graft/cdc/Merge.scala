package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based per-day MERGE (M1,
  * `Parquet Export/consolidate.cpp:111-286`).
  *
  * The reference loads a day file into `unordered_map<pk, row>` and
  * applies 1) deletes (`:184-187`), 2) updates only-if-existing
  * (`:189-203`), 3) inserts as unconditional upserts (`:206-214`), then
  * rewrites the file. Re-expressed relationally: a FULL OUTER equi-join
  * of the existing lake rows with the consolidated [[Consolidate]] net
  * changes on (day, id), resolved per row:
  *
  *  - no change row            -> keep existing
  *  - op = D                   -> drop
  *  - op = I                   -> take change image (upsert)
  *  - op = U, existing present -> take change image
  *  - op = U, existing absent  -> drop (lone UPDATE for an absent pk is
  *                                silently ignored, `consolidate.cpp:194`)
  *
  * Scale: both sides shuffle-partition on (day, id); AQE broadcasts the
  * change side when a batch is small (the common CDC case), making the
  * merge a broadcast hash join over only the dirty days — the lake side
  * is partition-pruned to dirty days before the join (see
  * [[graft.io.Lake.mergeIntoLake]]).
  *
  * @param existing lake rows: (id, date_time, value, ts, day)
  * @param changes  net changes: (day, id, op, date_time, value, ts)
  * @return merged rows with the same lake schema
  */
object Merge {

  def merge(existing: DataFrame, changes: DataFrame): DataFrame = {
    val e = existing.select(
      col("day"), col("id"),
      struct(col("date_time"), col("value"), col("ts")).as("e_img"))
    val c = changes.select(
      col("day"), col("id"), col("op"),
      struct(col("date_time"), col("value"), col("ts")).as("c_img"))

    e.join(c, Seq("day", "id"), "full_outer")
      .withColumn("keep",
        when(col("op").isNull, lit(true))             // untouched
          .when(col("op") === "D", lit(false))        // delete
          .when(col("op") === "I", lit(true))         // upsert
          .otherwise(col("e_img").isNotNull))         // update-if-exists
      .where(col("keep"))
      .withColumn("img",
        when(col("op").isNull, col("e_img")).otherwise(col("c_img")))
      .select(
        col("id"),
        col("img.date_time").as("date_time"),
        col("img.value").as("value"),
        col("img.ts").as("ts"),
        col("day"))
  }

  /** Merge audit metrics (M3, `consolidate.cpp:216-224`): per-day row
    * counts before/after plus planned change counts. Computed as plain
    * aggregates so the result is a small DataFrame suitable for logging
    * or assertion. */
  def auditByDay(existing: DataFrame, changes: DataFrame,
      merged: DataFrame): DataFrame = {
    val before = existing.groupBy("day")
      .agg(count(lit(1)).as("rows_before"))
    val planned = changes.groupBy("day").agg(
      count(when(col("op") === "D", 1)).as("planned_deletes"),
      count(when(col("op") === "U", 1)).as("planned_updates"),
      count(when(col("op") === "I", 1)).as("planned_inserts"))
    val after = merged.groupBy("day")
      .agg(count(lit(1)).as("rows_after"))
    before
      .join(planned, Seq("day"), "full_outer")
      .join(after, Seq("day"), "full_outer")
      .na.fill(0L, Seq("rows_before", "planned_deletes", "planned_updates",
        "planned_inserts", "rows_after"))
      .withColumn("net_change", col("rows_after") - col("rows_before"))
  }
}
