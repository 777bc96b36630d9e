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
      // the timer wraps the BUILDER too: iterative operators (connected
      // components) and driver-planned candidates legitimately execute jobs
      // while constructing the DataFrame, and that work must be charged —
      // for plain declarative entries the builder is plan-only and free
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional arg: comma-separated entry filter for fast local iteration
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (args.nonEmpty) { val only = args(0).split(",").toSet; all.filter(only) }
      else all
    }
    names.foreach(runOnce) // warmup: JIT + codegen cache + parquet footers
    // median of 3 timed runs — n=1 deltas were noise-level (VERDICT r2).
    // A full GC between entries keeps one entry's garbage from being
    // collected on a later entry's clock: with 130+ entries in one JVM the
    // relational pack drifted ~1.55× in r5 purely from inherited heap debt
    // (VERDICT r5 §perf item 4).
    val results = names.map { n =>
      System.gc()
      n -> Seq.fill(3)(runOnce(n)).sorted.apply(1)
    }
    // Full per-entry timings go to a FILE — the stdout line overflowed the
    // driver's tail-capture window at 112 entries (r04 parsed: null) no
    // matter the field order; the line itself stays headline-compact.
    val allQs = results.map { case (k, v) => f""""$k":$v%.3f""" }
    val total = results.map(_._2).sum
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_ENTRIES.json"),
      f"""{"sf":"$sfDir","total_sec":$total%.3f,"entries":${allQs.mkString("{", ",", "}")}}""")
    // stdout: headline relational queries only (q01..q19) + totals
    val headline = results.filter(_._1.startsWith("q"))
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_entries":${results.size},"queries":$headline}""")
    spark.stop()
  }
}
