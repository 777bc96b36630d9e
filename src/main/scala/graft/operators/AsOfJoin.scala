package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join.
  *
  * Spark has no native ASOF join (DuckDB does — the reference inherits it, see
  * SURVEY.md §2.3). The classic scalable formulation used here is a tagged
  * union + single window pass:
  *
  *   1. union left rows (probe) and right rows (reference), tagged by side;
  *   2. one shuffle on the join key, sort by (time, side) within key —
  *      right rows sort before left rows at equal timestamps so the match is
  *      inclusive (`left.time >= right.time`);
  *   3. `last(payload, ignoreNulls)` over rows unbounded-preceding..current
  *      carries the most recent right payload forward;
  *   4. keep only left rows.
  *
  * Cost: exactly one shuffle of |L|+|R| rows — same as the hash join both
  * inputs would need anyway — and no time-range blowup, so it holds at 100 TB
  * (the alternative equality-join-then-filter materializes |L|×|matches|).
  * Skewed keys can be pre-salted by the caller; window state is O(1) per row.
  *
  * Determinism: if several right rows share (key, time) the carried payload is
  * whichever sorts last — callers needing strict determinism should
  * pre-aggregate the right side to one row per (key, time).
  */
object AsOfJoin {
  def asOfBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadTagged = payload.map(p => s"__asof_$p")

    val l = left
      .withColumn("__asof_key", col(leftKey))
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
      .select(Seq(col("__asof_key"), col("__asof_t"), col("__asof_side")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__asof_$p")): _*)

    val r = right
      .withColumn("__asof_key", col(rightKey))
      .withColumn("__asof_t", col(rightTime))
      .withColumn("__asof_side", lit(0))
      .select(Seq(col("__asof_key"), col("__asof_t"), col("__asof_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__asof_$p")): _*)

    val w = Window.partitionBy(col("__asof_key"))
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .select(Seq(col("__asof_key"), col("__asof_t"), col("__asof_side")) ++
        leftCols.map(col) ++
        payloadTagged.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)

    carried.filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++
        payload.zip(payloadTagged).map { case (p, t) => col(t).as(p) }: _*)
  }
}
