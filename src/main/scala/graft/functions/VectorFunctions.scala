package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** pgvector-compatible vector function surface (SURVEY.md §2.10; reference
  * /root/reference/server/connector/functions/vector.h:57-71, kernels
  * vector.cpp:114-150) over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` columns.
  *
  * All functions are composed from Spark higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — Catalyst expressions, fully
  * codegen'd, no UDF in the hot path. Accumulation is a sequential fold in
  * element order, so results are deterministic bit-for-bit regardless of
  * parallelism (a property the DuckDB oracles rely on).
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** inner_product — `<#>` is its negation. Uses the fused native kernel
    * (NativeVectorExpressions, registered by GraftExtensions): one loop, no
    * intermediate array, bit-identical to the HOF fold below. */
  def innerProduct(a: Column, b: Column): Column =
    call_function("inner_product_native", a, b)

  /** Portable higher-order-function form (sessions without GraftExtensions). */
  def innerProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), _ + _)

  def negativeInnerProduct(a: Column, b: Column): Column = -innerProduct(a, b)

  /** l2_sqr_distance — squared Euclidean (monotone with l2, no sqrt);
    * fused native kernel. */
  def l2SqrDistance(a: Column, b: Column): Column =
    call_function("l2sqr_native", a, b)

  /** Portable higher-order-function form. */
  def l2SqrDistanceHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))), lit(0.0), _ + _)

  /** l2_distance — `<->`. */
  def l2Distance(a: Column, b: Column): Column = sqrt(l2SqrDistance(a, b))

  /** l1_distance — `<+>` (Manhattan). */
  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(d(x) - d(y))), lit(0.0), _ + _)

  def l1Norm(a: Column): Column =
    aggregate(transform(a, x => abs(d(x))), lit(0.0), _ + _)

  def l2Norm(a: Column): Column = sqrt(innerProduct(a, a))

  /** cosine_similarity; cosine_distance = `<=>` = 1 - similarity. */
  def cosineSimilarity(a: Column, b: Column): Column =
    innerProduct(a, b) / (l2Norm(a) * l2Norm(b))

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  def l1Normalize(a: Column): Column = transform(a, x => d(x) / l1Norm(a))

  def l2Normalize(a: Column): Column = transform(a, x => d(x) / l2Norm(a))

  /** Fixed-dimension check — Spark has no FLOAT[n]; the reference enforces
    * dimension at the type level (catalog/inverted_index.h:126). */
  def checkDim(a: Column, dim: Int): Column =
    when(size(a) === dim, a).otherwise(raise_error(
      concat(lit(s"vector dimension mismatch: expected $dim, got "), size(a).cast("string"))))

  /** Register the SQL-visible surface with the reference's function names.
    * SQL scalar functions substitute into the plan at analysis time, so they
    * stay codegen'd — the Spark analogue of DuckDB scalar registration
    * (vector.h:57-71). */
  def registerSql(spark: SparkSession): Unit = {
    def f(name: String, params: String, body: String): Unit =
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURNS DOUBLE RETURN $body")
    val ab = "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    f("inner_product", ab,
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    f("negative_inner_product", ab, "-inner_product(a, b)")
    f("l2_sqr_distance", ab,
      "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    f("l2_distance", ab, "sqrt(l2_sqr_distance(a, b))")
    f("l1_distance", ab,
      "aggregate(zip_with(a, b, (x, y) -> abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    f("l2_norm", "a ARRAY<FLOAT>", "sqrt(inner_product(a, a))")
    f("l1_norm", "a ARRAY<FLOAT>",
      "aggregate(transform(a, x -> abs(CAST(x AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    f("cosine_similarity", ab, "inner_product(a, b) / (l2_norm(a) * l2_norm(b))")
    f("cosine_distance", ab, "1.0 - cosine_similarity(a, b)")
  }
}
