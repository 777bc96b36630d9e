package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query wall seconds.
  *
  * Harness rules (VERDICT r1 §wrong-3): stable (sorted) query order; one
  * untimed warmup pass so no query absorbs JVM/codegen/parquet-footer init;
  * failures are fatal (a broken query must not bench as fast); each query is
  * timed end-to-end by materializing the FULL plan through the `noop` sink —
  * `count()` would let Catalyst prune final projections and undermeasure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup: JIT + codegen cache + parquet footers
    // median of 3 timed runs — n=1 deltas were noise-level (VERDICT r2)
    val results = names.map(n => n -> Seq.fill(3)(runOnce(n)).sorted.apply(1))
    // ms precision keeps the line under the harness's tail-capture window
    // (r02/r03 lines overflowed it and parsed as null); headline fields go
    // LAST so front-truncation still leaves them regex-recoverable.
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"queries":$qs,"sf":"$sfDir","metric":"total","value":$total%.3f,"unit":"sec"}""")
    spark.stop()
  }
}
