package graft.index

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

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
  */
final case class IvfIndex(
    assignments: DataFrame, // (vec_id, embedding, cluster)
    centroids: Array[Array[Double]]) {

  private def centroidOrder(query: Seq[Double]): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length) { val d = c(j) - query(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy(t => (t._1, t._2)).map(_._2).toSeq

  /** Exact k-NN within the `nprobe` nearest inverted lists. */
  def knn(query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val probes = centroidOrder(query.map(_.toDouble)).take(nprobe)
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

  /** KMeans training + assignment. Deterministic for a fixed seed and input. */
  def build(embs: DataFrame, idCol: String = "vec_id", embCol: String = "embedding",
      k: Int = 16, seed: Long = 42L): IvfIndex = {
    val feat = embs.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cluster"))
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Build-or-load a persisted, cluster-partitioned copy (the durable form:
    * partition pruning on `cluster=` directories is what makes nprobe/k of
    * the data the actual IO cost). */
  def ensure(spark: SparkSession, embs: => DataFrame, cacheKey: String,
      k: Int = 16): IvfIndex = {
    val dir = s"$defaultRoot/${cacheKey.replaceAll("[^A-Za-z0-9._-]+", "_")}-ivf$k"
    jvmCache.getOrElseUpdate(dir, {
      if (!Files.exists(Paths.get(dir, "_CENTROIDS"))) {
        val idx = build(embs, k = k)
        idx.assignments.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/vectors")
        Files.writeString(Paths.get(dir, "_CENTROIDS"),
          idx.centroids.map(_.mkString(",")).mkString("\n"))
      }
      val centroids = Files.readString(Paths.get(dir, "_CENTROIDS"))
        .split("\n").filter(_.nonEmpty).map(_.split(",").map(_.toDouble))
      IvfIndex(spark.read.parquet(s"$dir/vectors"), centroids)
    })
  }
}
