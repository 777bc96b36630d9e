package graft.index

import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index over an embedding column.
  *
  * Spark-native analogue of the reference's faiss-backed IVF
  * (/root/reference/libs/iresearch/include/iresearch/formats/ivf/clustering.cpp;
  * probe planning /root/reference/server/connector/optimizer/iresearch_plan.cpp:546-621):
  * MLlib KMeans plays the coarse quantizer, vectors are stored
  * directory-partitioned by their nearest-centroid id, and a query probes the
  * `nprobe` closest centroids — reading `nprobe/k` of the files via partition
  * pruning, then exact distance + per-partition top-k + global O(k) merge
  * (TakeOrderedAndProject). At 100 TB the only driver-side state is the
  * centroid table (k × dim doubles).
  *
  * The number of inverted lists defaults to ≈√N (faiss's standard sizing):
  * fixed k would leave lists of N/k vectors that grow unboundedly with the
  * corpus, making every probe scan O(N). Recall is verified two ways: the
  * `vec_ivf_recall` query entry (driver-checked against exact top-k) and
  * IvfIndexSpec's recall ≥ 0.9 assertion in the test suite.
  */
final case class IvfIndex(
    assignments: DataFrame, // (vec_id, embedding, cluster)
    centroids: Array[Array[Double]]) {

  def numLists: Int = centroids.length

  /** Default probe width: half the lists. Deliberately recall-heavy — the
    * driver's testdata embeddings are uniform random, where distance
    * concentration spreads true neighbors across many lists (measured at
    * sf0.01: nprobe=numLists/4 → recall 0.5, numLists/2 → recall 1.0).
    * Real embedding corpora cluster far better and tolerate nprobe ≈ k/16;
    * callers tune per-corpus via the explicit `nprobe` argument. */
  def defaultNprobe: Int = math.max(4, math.ceil(numLists / 2.0).toInt)

  private def centroidOrder(query: Seq[Double]): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length) { val d = c(j) - query(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy(t => (t._1, t._2)).map(_._2).toSeq

  /** Exact k-NN within the `nprobe` nearest inverted lists. */
  def knn(query: Seq[Float], k: Int, nprobe: Int = 0): DataFrame = {
    val np = if (nprobe > 0) nprobe else defaultNprobe
    val probes = centroidOrder(query.map(_.toDouble)).take(np)
    val q = typedlit(query)
    assignments
      .filter(col("cluster").isin(probes: _*))
      .withColumn("dist", VectorFunctions.l2SqrDistance(col("embedding"), q))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("dist"))
  }
}

object IvfIndex {
  private val jvmCache = TrieMap.empty[String, IvfIndex]

  def defaultRoot: String = sys.env.getOrElse(
    "GRAFT_INDEX_DIR", sys.props("java.io.tmpdir") + "/graft-index")

  /** faiss-style list sizing: ≈√N lists, clamped to something trainable. */
  def autoK(n: Long): Int =
    math.max(4, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

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
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Build-or-load a persisted, cluster-partitioned copy (the durable form:
    * partition pruning on `cluster=` directories is what makes nprobe/k of
    * the data the actual IO cost). All metadata IO is Hadoop-FS so the index
    * works on HDFS/S3 unchanged. */
  def ensure(spark: SparkSession, embs: => DataFrame, cacheKey: String,
      k: Int = 0): IvfIndex = {
    val kTag = if (k > 0) k.toString else "auto"
    val dir = s"$defaultRoot/${cacheKey.replaceAll("[^A-Za-z0-9._-]+", "_")}-ivf$kTag-v${IndexStore.FormatVersion}"
    jvmCache.getOrElseUpdate(dir, {
      val f = fs(spark, dir)
      val marker = new Path(s"$dir/_CENTROIDS")
      if (!f.exists(marker)) {
        val idx = build(embs, k = k)
        idx.assignments.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/vectors")
        val out = f.create(marker, true)
        try out.write(idx.centroids.map(_.mkString(","))
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      val in = f.open(marker)
      val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val centroids = txt.split("\n").filter(_.nonEmpty).map(_.split(",").map(_.toDouble))
      IvfIndex(spark.read.parquet(s"$dir/vectors"), centroids)
    })
  }
}
