package graft.index

import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) index over an embedding column.
  *
  * Spark-native analogue of the reference's faiss-backed IVF
  * (/root/reference/libs/iresearch/include/iresearch/formats/ivf/clustering.cpp;
  * probe planning /root/reference/server/connector/optimizer/iresearch_plan.cpp:546-621):
  * MLlib KMeans plays the coarse quantizer, vectors are stored
  * directory-partitioned by their nearest-centroid id, and a query probes a
  * subset of inverted lists — reading only their fraction of the data via
  * partition pruning, then exact distance + per-partition top-k + global O(k)
  * merge (TakeOrderedAndProject). At 100 TB the only driver-side state is the
  * centroid table (k × dim doubles) plus k list radii.
  *
  * The number of inverted lists defaults to ≈√N (faiss's standard sizing):
  * fixed k would leave lists of N/k vectors that grow unboundedly with the
  * corpus, making every probe scan O(N).
  *
  * Probe strategies:
  *  - `nprobe > 0`: classic fixed-width ANN — scan the nprobe nearest lists.
  *    Recall is corpus-dependent (uniform-random data spreads true neighbors
  *    across many lists); callers tune per corpus.
  *  - `nprobe == 0` (default): EXACT two-phase adaptive probe, the ball-tree
  *    bound. Phase 1 scans the √k nearest lists and takes the candidate kth
  *    distance d_k (k doubles to the driver — metadata, not data). Phase 2
  *    adds every other list whose lower bound ‖q−cᵢ‖ − rᵢ ≤ d_k — by the
  *    triangle inequality no vector in a skipped list can beat the current
  *    top-k, so the merged result is exactly the brute-force answer. On
  *    clustered corpora phase 2 adds few lists; on adversarially uniform
  *    data it degrades gracefully toward a full scan, which is the price of
  *    exactness (verified both ways in IvfIndexSpec).
  */
final case class IvfIndex(
    assignments: DataFrame, // (vec_id, embedding, cluster)
    centroids: Array[Array[Double]],
    radii: Array[Double]) {

  def numLists: Int = centroids.length

  private def centroidDistSq(query: Seq[Double]): Array[(Double, Int)] =
    centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length) { val d = c(j) - query(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy(t => (t._1, t._2))

  private def distCol(q: Seq[Float]) =
    VectorFunctions.l2SqrDistance(col("embedding"), typedlit(q))

  private def topK(probes: Seq[Int], q: Seq[Float], k: Int): DataFrame =
    assignments
      .filter(col("cluster").isin(probes: _*))
      .withColumn("dist", distCol(q))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("dist"))

  /** The two probe sets of the exact adaptive strategy: (phase-1 lists,
    * phase-2 lists whose ball-bound overlaps the phase-1 kth distance).
    * Exposed so IvfIndexSpec can assert pruning on clustered data. */
  def adaptiveProbes(query: Seq[Float], k: Int): (Seq[Int], Seq[Int]) = {
    val byDist = centroidDistSq(query.map(_.toDouble))
    val n1 = math.max(1, math.ceil(math.sqrt(numLists.toDouble)).toInt)
    val phase1 = byDist.take(n1).map(_._2).toSeq
    val cand = topK(phase1, query, k).select(col("dist")).collect()
    val dk =
      if (cand.length == k) math.sqrt(cand.map(_.getDouble(0)).max)
      else Double.PositiveInfinity
    val extra = byDist.drop(n1).collect {
      case (dSq, i) if math.sqrt(dSq) - radii(i) <= dk + 1e-9 => i
    }.toSeq
    (phase1, extra)
  }

  /** k-NN by L2. `nprobe > 0` = fixed-width approximate probe; `nprobe == 0`
    * (default) = exact adaptive probe (see class doc). */
  def knn(query: Seq[Float], k: Int, nprobe: Int = 0): DataFrame = {
    val probes =
      if (nprobe > 0) centroidDistSq(query.map(_.toDouble)).take(nprobe).map(_._2).toSeq
      else { val (p1, p2) = adaptiveProbes(query, k); p1 ++ p2 }
    topK(probes, query, k)
  }
}

object IvfIndex {
  private val jvmCache = TrieMap.empty[String, IvfIndex]

  /** Bumped when the on-disk layout changes (radii sidecar added in .2). */
  private val IvfFormat = 2

  def defaultRoot: String = sys.env.getOrElse(
    "GRAFT_INDEX_DIR", sys.props("java.io.tmpdir") + "/graft-index")

  /** faiss-style list sizing: ≈√N lists, clamped to something trainable. */
  def autoK(n: Long): Int =
    math.max(4, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-cluster max L2 distance to the centroid — one distributed pass,
    * k doubles back to the driver. */
  private def clusterRadii(assigned: DataFrame, centroids: Array[Array[Double]]): Array[Double] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "cvec")
    val dist = sqrt(aggregate(zip_with(col("embedding"), col("cvec"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)), lit(0.0), _ + _))
    val byCluster = assigned.join(broadcast(cents), "cluster")
      .select(col("cluster"), dist.as("d"))
      .groupBy("cluster").agg(max(col("d")).as("r"))
      .collect().map(r => r.getAs[Number](0).intValue -> r.getDouble(1)).toMap
    Array.tabulate(centroids.length)(i => byCluster.getOrElse(i, 0.0))
  }

  /** KMeans training + assignment. Deterministic for a fixed seed and input.
    * k ≤ 0 selects autoK(count). */
  def build(embs: DataFrame, idCol: String = "vec_id", embCol: String = "embedding",
      k: Int = 0, seed: Long = 42L): IvfIndex = {
    val feat = embs.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    val kk = if (k > 0) k else autoK(feat.count())
    val model = new KMeans().setK(kk).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cluster"))
    val centroids = model.clusterCenters.map(_.toArray)
    IvfIndex(assigned, centroids, clusterRadii(assigned, centroids))
  }

  /** Build-or-load a persisted, cluster-partitioned copy (the durable form:
    * partition pruning on `cluster=` directories is what makes the probed
    * fraction of the data the actual IO cost). All metadata IO is Hadoop-FS
    * so the index works on HDFS/S3 unchanged. */
  def ensure(spark: SparkSession, embs: => DataFrame, cacheKey: String,
      k: Int = 0): IvfIndex = {
    val kTag = if (k > 0) k.toString else "auto"
    val dir = s"$defaultRoot/${cacheKey.replaceAll("[^A-Za-z0-9._-]+", "_")}-ivf$kTag-v${IndexStore.FormatVersion}.$IvfFormat"
    jvmCache.getOrElseUpdate(dir, {
      val f = fs(spark, dir)
      val marker = new Path(s"$dir/_CENTROIDS")
      val radiiFile = new Path(s"$dir/_RADII")
      if (!f.exists(marker)) {
        val idx = build(embs, k = k)
        idx.assignments.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/vectors")
        val rOut = f.create(radiiFile, true)
        try rOut.write(idx.radii.mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally rOut.close()
        val out = f.create(marker, true)
        try out.write(idx.centroids.map(_.mkString(","))
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      def readLines(p: Path): Array[String] = {
        val in = f.open(p)
        val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
        txt.split("\n").filter(_.nonEmpty)
      }
      val centroids = readLines(marker).map(_.split(",").map(_.toDouble))
      val radii = readLines(radiiFile).map(_.toDouble)
      IvfIndex(spark.read.parquet(s"$dir/vectors"), centroids, radii)
    })
  }
}
