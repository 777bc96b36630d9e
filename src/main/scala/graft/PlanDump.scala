package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared bench entries into a directory
  * — the plan evidence files under plans/rNN/ (optimization rounds). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <tag> <entry,entry,...>"
  *
  * writes `<outDir>/<entry>_<tag>.txt` per entry. Reuses whatever durable
  * artifacts exist (no GateHygiene reset): plan capture must reflect the
  * steady-state claimed plans, not a cold rebuild.
  *
  * The special pseudo-entry `vec_refresh_classifier` captures the vector
  * REFRESH delta-classifier join (the plan REFRESH itself executes inside
  * Ddl.execute, invisible from the entry's returned DataFrame): it builds
  * the same (source fingerprints ⟗ stored manifest) frame the r19 Ddl code
  * constructs, over the vec_refresh_append entry's artifacts.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <names,comma-sep>")
    val (outDir, tag, names) = (args(0), args(1), args(2).split(",").toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df =
        if (n == "vec_refresh_classifier") refreshClassifier(spark, sfDir)
        else if (n == "vec_refresh_classifier_old")
          refreshClassifierOld(spark, sfDir)
        else SparkEntry.queries(n)(spark, sfDir)
      // SPARK_GRAFT_PLAN_FINAL=1: execute the query FIRST (collect through
      // the Dataset's own QueryExecution — a noop write would plan a
      // separate execution) so the dump shows the FINAL adaptive plan:
      // AQE's runtime exchange/stage reuse (ReusedExchange, coalesced
      // reads, runtime join strategy changes) is invisible in the initial
      // `isFinalPlan=false` plan the r19 audit files captured.
      if (sys.env.get("SPARK_GRAFT_PLAN_FINAL").contains("1")) df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      println(s"wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }

  /** The PRE-r19 classifier shape, reconstructed for the before-plan file:
    * live source full-outer-joined against the STORED EMBEDDINGS comparing
    * raw float arrays (the exact frame Ddl built before the fingerprint
    * manifest). */
  private def refreshClassifierOld(spark: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, when}
    SparkEntry.queries("vec_refresh_append")(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val entry = graft.search.IndexCatalog.AnnEntry(
      s"$dir-emb-refresh", "vec_id", "embedding", "l2")
    val root = sys.props("java.io.tmpdir") + "/graft-vecrefresh-" +
      dir.replaceAll("[^A-Za-z0-9._-]+", "_")
    val source = graft.search.IndexCatalog.annSource(spark, root, entry)
    val ivfDir = graft.index.IvfIndex.dirFor(entry.cacheKey)
    val existing = spark.read.parquet(s"$ivfDir/vectors")
      .select(col("vec_id"), col("embedding").as("_old"))
    source.join(existing, Seq("vec_id"), "full_outer")
      .select(
        count(when(col("embedding").isNull, 1)).as("removed"),
        count(when(col("embedding").isNotNull && col("_old").isNotNull &&
          !(col("embedding") <=> col("_old")), 1)).as("changed"))
  }

  /** The r19 fingerprint-manifest classifier frame, over the
    * vec_refresh_append entry's artifacts (built on demand by running the
    * entry once first). */
  private def refreshClassifier(spark: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, when, xxhash64}
    SparkEntry.queries("vec_refresh_append")(spark, dir)
      .write.mode("overwrite").format("noop").save() // ensure artifacts exist
    // the entry's DDL registration: id='vec_id', metric='l2', no quant
    val entry = graft.search.IndexCatalog.AnnEntry(
      s"$dir-emb-refresh", "vec_id", "embedding", "l2")
    val root = sys.props("java.io.tmpdir") + "/graft-vecrefresh-" +
      dir.replaceAll("[^A-Za-z0-9._-]+", "_")
    val source = graft.search.IndexCatalog.annSource(spark, root, entry)
    val ivfDir = graft.index.IvfIndex.dirFor(entry.cacheKey)
    val existing = graft.index.IvfIndex.syncedFps(spark, ivfDir)
    val sourceFp = source
      .select(col("vec_id"), xxhash64(col("embedding")).as("_sfp"))
    sourceFp.join(existing, Seq("vec_id"), "full_outer")
      .select(
        count(when(col("_sfp").isNull, 1)).as("removed"),
        count(when(col("_sfp").isNotNull && col("fp").isNotNull &&
          col("_sfp") =!= col("fp"), 1)).as("changed"),
        count(when(col("fp").isNull, 1)).as("new"))
  }
}
