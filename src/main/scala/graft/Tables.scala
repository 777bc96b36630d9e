package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst sees a native parquet
  * relation: predicate pushdown, column pruning and partition pruning all work
  * unmodified. The only normalization is `events.ts`, whose physical parquet
  * encoding has varied across testdata generations — TIMESTAMP(NANOS) (read
  * as a nanos-epoch long via `nanosAsLong`) in some, plain `timestamp[us]`
  * (read as TIMESTAMP_NTZ) in others. The reference's file-scan edge infers
  * schema per file rather than assuming one encoding (SURVEY §1.2); we do the
  * same: [[normalizeTs]] branches on the LOADED type and converts each case to
  * a session-TZ (UTC) TimestampType, so every downstream consumer sees one
  * stable type regardless of which generation of testdata is on disk.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a loaded `ts` column to session-TZ TimestampType (µs).
    *
    * - `LongType`: nanosAsLong path — epoch nanos; integer-`div` to µs
    *   (nanos-since-2024 exceeds 2^53, a double would lose precision).
    * - `TimestampNTZType`: plain `timestamp[us]` parquet; the cast interprets
    *   the wall-clock value in the session TZ (UTC) — exactly how the DuckDB
    *   oracle's `epoch(ts)` reads the same bytes.
    * - `TimestampType`: already what we want.
    */
  def normalizeTs(dt: DataType, ts: Column): Column = dt match {
    case LongType             =>
      // decimal, not double, division: epoch nanos exceed 2^53
      timestamp_micros(ts.cast(DecimalType(38, 0)).divide(lit(1000)).cast(LongType))
    case _: TimestampNTZType  => ts.cast(TimestampType)
    case _: TimestampType     => ts
    case other => throw new IllegalStateException(
      s"TESTDATA SCHEMA CHANGE: events.ts loaded as $other — " +
        "expected LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP. " +
        "Teach Tables.normalizeTs the new encoding.")
  }

  /** Post-normalization type CLASSES the engine depends on, per table. A
    * regenerated testdata drop that changes one of these must fail HERE with
    * a named error — not as a silent wrong answer three operators later
    * (the round-9 failure mode). Classes, not exact types, so a benign
    * re-encoding (e.g. date → timestamp[us], int32 → int64) doesn't false-
    * alarm; `ts` after [[normalizeTs]] is pinned exactly. */
  private sealed trait TClass { def ok(dt: DataType): Boolean }
  private case object Integral extends TClass {
    def ok(dt: DataType) = dt == LongType || dt == IntegerType || dt == ShortType
  }
  private case object Fractional extends TClass {
    def ok(dt: DataType) = dt == DoubleType || dt == FloatType || dt.isInstanceOf[DecimalType]
  }
  private case object Str extends TClass { def ok(dt: DataType) = dt == StringType }
  private case object TimeLike extends TClass {
    def ok(dt: DataType) = dt == DateType || dt == TimestampType || dt == TimestampNTZType
  }
  private case object FloatVec extends TClass {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true; case _ => false
    }
  }
  private case class Exact(t: DataType) extends TClass { def ok(dt: DataType) = dt == t }

  private val expectedTypes: Map[String, Map[String, TClass]] = Map(
    "events" -> Map("event_id" -> Integral, "ts" -> Exact(TimestampType),
      "user_id" -> Integral, "event_type" -> Str, "value" -> Fractional,
      "props" -> Str),
    "lineitem" -> Map("l_orderkey" -> Integral, "l_quantity" -> Fractional,
      "l_extendedprice" -> Fractional, "l_shipdate" -> TimeLike),
    "orders" -> Map("o_orderkey" -> Integral, "o_totalprice" -> Fractional,
      "o_orderdate" -> TimeLike),
    "documents" -> Map("doc_id" -> Integral, "text" -> Str),
    "embeddings" -> Map("vec_id" -> Integral, "embedding" -> FloatVec))

  private def assertSchema(name: String, df: DataFrame): DataFrame = {
    expectedTypes.get(name).foreach { want =>
      val got = df.schema.map(f => f.name -> f.dataType).toMap
      val bad = want.collect {
        case (c, _) if !got.contains(c) => s"$c: MISSING (have ${got.keys.mkString(",")})"
        case (c, t) if !t.ok(got(c))    => s"$c: ${got(c)} (expected $t)"
      }
      if (bad.nonEmpty) throw new IllegalStateException(
        s"TESTDATA SCHEMA CHANGE in $name.parquet: ${bad.mkString("; ")} — " +
          "adapt Tables.load/normalizeTs before trusting any query result.")
    }
    df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.adopt(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val normalized =
      if (name == "events")
        df.withColumn("ts", normalizeTs(df.schema("ts").dataType, col("ts")))
      else df
    assertSchema(name, normalized)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so spark.sql text mirrors oracle SQL. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
