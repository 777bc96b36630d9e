package graft

import org.apache.spark.sql.SparkSession

/** Generic same-JVM interleaved A/B for a declared bench entry, switching a
  * sysprop between arms — the MinhashAb protocol (r19 memory: separate-JVM
  * arms on this shared VM are useless; interleaving inside ONE warmed JVM
  * lands machine drift on both arms equally and the MEDIAN comparison
  * isolates the change). Usage:
  *
  *   runMain graft.AbRunner <entry> <sysprop> <valueA> <valueB> [dir] [rounds]
  *
  * e.g. runMain graft.AbRunner dedup_minhash_lsh \
  *        graft.minhash.shingleCheckpoint 0 1 /tmp/graft-sf1 5
  */
object AbRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: AbRunner <entry> <sysprop> <valueA> <valueB> [dir] [rounds]")
    val (entry, prop, va, vb) = (args(0), args(1), args(2), args(3))
    val dir = if (args.length > 4) args(4) else "/tmp/graft-sf1"
    val rounds = if (args.length > 5) args(5).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePart = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      if (dir.contains("sf1")) (cpus.toInt * 10).toString else cpus)
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", shufflePart))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(v: String): Double = {
      sys.props(prop) = v
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(entry)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"AB[$entry $prop] warmup A($va)=${run(va)}%.2f B($vb)=${run(vb)}%.2f")
    val samples = (1 to rounds).flatMap { i =>
      val a = run(va); val b = run(vb)
      println(f"AB round $i A($va)=$a%.2f B($vb)=$b%.2f")
      Seq(("A", a), ("B", b))
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val as = samples.collect { case ("A", t) => t }
    val bs = samples.collect { case ("B", t) => t }
    println(f"AB RESULT $entry $prop: A($va) median=${median(as)}%.3f min=${as.min}%.3f | " +
      f"B($vb) median=${median(bs)}%.3f min=${bs.min}%.3f | " +
      f"ratio(A/B)=${median(as) / median(bs)}%.3f")
    spark.stop()
  }
}
