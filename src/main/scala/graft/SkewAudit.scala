package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH band-bucket skew audit (r19 VERDICT #5b, guide §2.5): prints the
  * bucket-width distribution of the minhash banded frame over a corpus —
  * max/median/percentiles of bucket sizes, candidate-pair mass of the top
  * buckets, and how much the `maxBucket` cap drops. A hot bucket is the
  * classic LSH skew risk; this quantifies whether one exists at sf1 before
  * any tuning is attempted. Usage: runMain graft.SkewAudit [dir]
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions",
            if (dir.contains("sf1")) (cpus.toInt * 10).toString else cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 128)
    val bands = 64
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(split(lit((0 until bands).mkString(",")), ",")).as(Seq("band", "_b")))
      .select(col("doc_id"), col("band"),
        hash(col("band"),
          expr(s"slice(sig, band * int(size(sig) / $bands) + 1, int(size(sig) / $bands))")).as("bh"))
    val widths = banded.groupBy(col("band"), col("bh")).count()
    val stats = widths.agg(
      count(lit(1)).as("buckets"),
      max(col("count")).as("max_w"),
      expr("percentile_approx(count, array(0.5, 0.99, 0.999), 10000)").as("pct"),
      sum(when(col("count") >= 2, col("count") * (col("count") - 1) / 2))
        .as("cand_pairs"),
      sum(when(col("count") > 10000, col("count"))).as("over_cap_mass"),
      count(when(col("count") > 10000, lit(1))).as("over_cap_buckets"))
      .head()
    println(s"buckets=${stats.getLong(0)} max_width=${stats.getLong(1)} " +
      s"p50/p99/p999=${stats.getSeq[Long](2).mkString("/")} " +
      s"candidate_pairs=${stats.get(3)} " +
      s"over_cap_mass=${stats.get(4)} over_cap_buckets=${stats.getLong(5)}")
    // top-10 widest buckets with their band — is the hot mass one band or spread?
    widths.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"band=${r.get(0)} bh=${r.get(1)} width=${r.getLong(2)}"))
    spark.stop()
  }
}
