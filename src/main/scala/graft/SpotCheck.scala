package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic runner: times named entries against an arbitrary data
  * dir with the same cold-median-of-3 protocol as Bench's sf1 spot block.
  * Usage: runMain graft.SpotCheck <dir> <name>[,<name>...] [shufflePartitions]
  */
object SpotCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val shuffle = if (args.length > 2) args(2) else "32"
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", shuffle))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val times = Seq.fill(3) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SPOT $n%-28s median=${times.sorted.apply(1)}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
