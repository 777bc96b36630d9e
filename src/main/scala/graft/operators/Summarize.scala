package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the reference's `SUMMARIZE <table>` rewrite
  * (tests/sqllogic/sdb/pg/simple/summarize_all_types.test,
  * inverted_index_summarize.test): one row per column with count / null
  * stats / min / max / distinct / sum / median.
  *
  * Differences from the reference, on purpose: its `approx_unique` and
  * `q25/q50/q75` are sketch-backed (HLL / approx quantile), so their exact
  * values are engine-specific. This profile emits EXACT distinct counts and
  * an exact interpolated median instead — hash-comparable against any SQL
  * engine — over canonical integer units (ints as-is, decimals as cents,
  * timestamps as epoch seconds) so no float aggregation order can skew it.
  *
  * 100 TB shape: the table is MELTED once (`explode` of one small struct
  * array per row — only the profiled columns are carried, so column pruning
  * still reaches the scan), then everything is computed from ONE value
  * HISTOGRAM `(column, value) -> count` built with a single map-side-combined
  * hash aggregate. Count/nulls/distinct/min/max/sum are plain aggregates of
  * the histogram; the exact median reads the cumulative counts — no
  * buffer-every-value percentile aggregate anywhere (the first cut used
  * exact `percentile` + `countDistinct`, whose Expand + object aggregate
  * benched 12 s at sf0.1 — ~40× this shape). The per-column cumulative
  * window sorts each column's distinct values on one partition: fine while
  * histograms are value-bounded; at petabyte near-unique columns you'd swap
  * the median (only) for the sketch the reference itself uses.
  */
object Summarize {

  /** How to canonicalize one source column.
    * kind: "int" (integral — units = value), "cents" (fixed-point decimal
    * stored as double — units = round(x*100)), "epoch" (timestamp — units =
    * epoch seconds), "string" (lexicographic min/max, no sum/median). */
  final case class ColSpec(name: String, kind: String, typeName: String)

  private def unitsOf(spec: ColSpec): Column = spec.kind match {
    case "int"    => col(spec.name).cast("long")
    case "cents"  => round(col(spec.name) * 100).cast("long")
    case "epoch"  => unix_timestamp(col(spec.name))
    case "string" => lit(null).cast("long")
  }

  private def strOf(spec: ColSpec): Column = spec.kind match {
    case "string" => col(spec.name).cast("string")
    case _        => lit(null).cast("string")
  }

  def summarize(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    val melted = df
      .select(explode(array(specs.map { sp =>
        struct(
          lit(sp.name).as("cname"), lit(sp.typeName).as("ctype"),
          unitsOf(sp).as("vnum"), strOf(sp).as("vstr"))
      }: _*)).as("m"))
      .select(col("m.cname"), col("m.ctype"), col("m.vnum"), col("m.vstr"))

    // the one shuffle: per-column value histogram, combined map-side
    val hist = melted
      .groupBy(col("cname"), col("ctype"), col("vnum"), col("vstr"))
      .agg(count(lit(1)).as("cnt"))

    val isNullRow = col("vnum").isNull && col("vstr").isNull
    val stats = hist
      .groupBy(col("cname"), col("ctype"))
      .agg(
        sum(when(!isNullRow, col("cnt")).otherwise(lit(0L))).as("cnt"),
        sum(when(isNullRow, col("cnt")).otherwise(lit(0L))).as("nulls"),
        count(when(!isNullRow, lit(1))).as("ndist"),
        coalesce(min(col("vnum")).cast("string"), min(col("vstr"))).as("min_render"),
        coalesce(max(col("vnum")).cast("string"), max(col("vstr"))).as("max_render"),
        sum(col("vnum") * col("cnt")).as("sum_units"))

    // exact percentile_cont(0.5) from cumulative histogram counts: the two
    // ordered positions floor/ceil of 0.5*(n-1), linearly interpolated —
    // integer unit values keep the arithmetic float-exact in any engine
    val byVal = Window.partitionBy(col("cname")).orderBy(col("vnum"))
    val whole = Window.partitionBy(col("cname"))
    val marked = hist
      .filter(col("vnum").isNotNull)
      .select(col("cname"), col("vnum"), col("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byVal))
      .withColumn("prev", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("k_lo", expr("(n - 1) DIV 2"))
      .withColumn("k_hi", expr("n DIV 2"))
    val median = marked
      .groupBy(col("cname"))
      .agg(
        max(when(col("prev") <= col("k_lo") && col("k_lo") < col("cum"),
          col("vnum"))).as("vlo"),
        max(when(col("prev") <= col("k_hi") && col("k_hi") < col("cum"),
          col("vnum"))).as("vhi"))
      .select(col("cname"),
        ((col("vlo") + col("vhi")).cast("double") / 2.0d).as("q50_units"))

    stats.join(median, Seq("cname"), "left")
      .select(col("cname"), col("ctype"), col("cnt"), col("nulls"),
        col("ndist"), col("min_render"), col("max_render"),
        col("sum_units"), col("q50_units"))
  }
}
