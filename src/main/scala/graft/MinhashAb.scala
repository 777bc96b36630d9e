package graft

import org.apache.spark.sql.SparkSession

/** UDF-vs-native minhash kernel A/B (r17 VERDICT: `dedup_minhash_lsh`
  * stays weak "until a quiet-machine UDF-vs-native A/B on the r17 tree
  * lands"). Separate-JVM arms are hopeless on a shared VM (measured
  * 12–80 s for the SAME arm back-to-back), so this runner interleaves the
  * two kernels inside ONE JVM: a warmup pass per arm pays JIT/codegen
  * once, then `rounds` alternating timed samples — machine drift lands on
  * both arms equally and the MEDIAN comparison isolates the kernel.
  * Usage: runMain graft.MinhashAb [dir] [rounds]
  */
object MinhashAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val rounds = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(kernel: String): Double = {
      sys.props("graft.minhash.kernel") = kernel
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"AB warmup native=${run("native")}%.2f udf=${run("udf")}%.2f")
    val samples = (1 to rounds).flatMap { i =>
      val n = run("native"); val u = run("udf")
      println(f"AB round $i native=$n%.2f udf=$u%.2f")
      Seq(("native", n), ("udf", u))
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val nat = samples.collect { case ("native", t) => t }
    val udf = samples.collect { case ("udf", t) => t }
    println(f"AB RESULT native median=${median(nat)}%.3f min=${nat.min}%.3f | " +
      f"udf median=${median(udf)}%.3f min=${udf.min}%.3f | " +
      f"ratio(native/udf)=${median(nat) / median(udf)}%.3f")
    spark.stop()
  }
}
