package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * still reaches the scan) and everything downstream is a single hash
  * aggregate keyed by column name with map-side partials. No per-column
  * scan, no multi-distinct Expand over the full row width.
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

    // one value rendering per row regardless of kind, so a single
    // countDistinct / min / max serves every column
    val v = coalesce(col("vstr"), col("vnum").cast("string"))
    melted
      .groupBy(col("cname"), col("ctype"))
      .agg(
        count(v).as("cnt"),
        (count(lit(1)) - count(v)).as("nulls"),
        countDistinct(v).as("ndist"),
        coalesce(min(col("vnum")).cast("string"), min(col("vstr"))).as("min_render"),
        coalesce(max(col("vnum")).cast("string"), max(col("vstr"))).as("max_render"),
        sum(col("vnum")).as("sum_units"),
        percentile(col("vnum"), lit(0.5)).as("q50_units"))
  }
}
