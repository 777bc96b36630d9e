package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys.
  *
  * AQE's skew-join splitting handles most skew at runtime; this explicit
  * salted join is for the cases it cannot see (skew introduced by an
  * upstream UDF, or a build side that must be replicated anyway). The left
  * side scatters each row into one of `salts` sub-keys deterministically
  * (hash of the whole row — identical rows land together but hot KEYS with
  * varying payloads spread evenly); the right side is replicated once per
  * salt, so every (left, right) key match still happens exactly once and
  * the result equals the unsalted join for any input.
  */
object Salting {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
