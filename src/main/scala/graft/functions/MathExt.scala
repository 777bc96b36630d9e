package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's remaining math/date gap-fillers
  * (/root/reference/server/connector/functions/math.cpp: date_bin, erf,
  * erfc, cotd, div — make_timestamp/log are Spark built-ins), composed
  * from built-in expressions so everything stays inside whole-stage
  * codegen: no UDF, no boxing, vectorizable.
  *
  * erf/erfc use the Abramowitz–Stegun 7.1.26 rational approximation
  * (|error| ≤ 1.5e-7 — far inside the 1e-4 quantization every gate uses).
  * The oracle mirrors the same expression tree term-for-term, per the
  * FP-parity rule (see `queries/Relational.scala`).
  */
object MathExt {

  /** PG-style date_bin: floor `ts` into `widthSec`-wide buckets aligned to
    * `originEpochSec`, as an epoch-seconds bigint (integer arithmetic —
    * no FP in the binning). */
  def dateBinEpoch(widthSec: Long, ts: Column, originEpochSec: Long): Column = {
    val e = unix_timestamp(ts)
    (lit(originEpochSec) +
      floor((e - lit(originEpochSec)) / lit(widthSec)).cast("long") * lit(widthSec))
      .cast("long")
  }

  private val (a1, a2, a3, a4, a5) =
    (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)

  /** Gauss error function (A&S 7.1.26). */
  def erf(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val poly = t * (lit(a1) + t * (lit(a2) + t * (lit(a3) + t * (lit(a4) + t * lit(a5)))))
    signum(x) * (lit(1.0) - poly * exp(-(x * x)))
  }

  /** Complementary error function. */
  def erfc(x: Column): Column = lit(1.0) - erf(x)

  /** Cotangent of an angle in degrees. */
  def cotd(x: Column): Column = lit(1.0) / tan(radians(x))

  /** The identical formulas as DuckDB SQL text, for oracle mirroring. */
  object sql {
    def erf(x: String): String = {
      val t = s"(1.0 / (1.0 + 0.3275911 * abs($x)))"
      val poly = s"($t * ($a1 + $t * ($a2 + $t * ($a3 + $t * ($a4 + $t * $a5)))))"
      s"(sign($x) * (1.0 - $poly * exp(-($x * $x))))"
    }
    def erfc(x: String): String = s"(1.0 - ${erf(x)})"
    def cotd(x: String): String = s"(1.0 / tan(radians($x)))"
  }
}
