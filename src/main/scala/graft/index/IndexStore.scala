package graft.index

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, segmented storage for [[InvertedIndex]].
  *
  * Spark-native analogue of the reference's on-disk index segments
  * (/root/reference/server/search/inverted_index_storage.h;
  * /root/reference/libs/iresearch/include/iresearch/formats/). An index lives
  * under one directory as parquet, split into append-only segments:
  *
  * {{{
  *   <root>/<key>/seg=NNNNN/postings/bucket=K/  (parquet files)
  *   <root>/<key>/seg=NNNNN/docstats/           (parquet files)
  *   <root>/<key>/seg=NNNNN/meta.json          (numDocs, sumDl per segment)
  * }}}
  *
  * - postings are directory-partitioned by `bucket = murmur3(term) mod 64`,
  *   so a single-term lookup prunes to 1/64 of the files at planning time —
  *   the parquet-level stand-in for the reference's per-term posting lists.
  *   At 100 TB this is what keeps point lookups from scanning the index.
  * - the term dictionary (df, ctf) and collection stats (numDocs, avgDl) are
  *   derived per segment and merged at READ time (groupBy-sum over segments),
  *   mirroring the reference's per-segment stats merge — so appending a
  *   segment never rewrites old ones, and BM25 stats stay correct under
  *   incremental ingest (SURVEY.md §7.4 "BM25 global statistics").
  * - segments are what streaming ingest appends (graft.streaming) and what
  *   [[compact]] merges, the reference's refresh/compaction loop
  *   (/root/reference/server/search/maintenance.h:36-44).
  */
object IndexStore {
  val NumBuckets = 64

  /** Stable term → bucket hash, computable on both driver (literal pruning)
    * and executors (write path). */
  def bucketOf(term: String): Int =
    math.floorMod(MurmurHash3.stringHash(term), NumBuckets)

  private val bucketUdf = udf((t: String) => bucketOf(t))

  def defaultRoot: String = sys.env.getOrElse(
    "GRAFT_INDEX_DIR", sys.props("java.io.tmpdir") + "/graft-index")

  private val jvmCache = TrieMap.empty[String, InvertedIndex]

  private def slug(s: String): String = s.replaceAll("[^A-Za-z0-9._-]+", "_")

  /** Build-or-load the index for (table parquet dir, text column, analyzer);
    * cached per JVM, persisted across JVMs. */
  def ensure(spark: SparkSession, docs: => DataFrame, cacheKey: String,
      idCol: String, textCol: String, analyzerName: String,
      withPositions: Boolean = true): InvertedIndex = {
    val dir = s"$defaultRoot/${slug(cacheKey)}-$textCol-$analyzerName"
    jvmCache.getOrElseUpdate(dir, {
      if (!Files.exists(Paths.get(dir, "_SEGMENTS"))) {
        val idx = InvertedIndex.build(docs, idCol, textCol, analyzerName, withPositions)
        writeSegment(idx, dir, 0)
        Files.writeString(Paths.get(dir, "_SEGMENTS"), "seg=00000\n")
      }
      load(spark, dir)
    })
  }

  /** Convenience: the standard documents-table index. */
  def documents(spark: SparkSession, sfDir: String,
      analyzerName: String = "whitespace"): InvertedIndex =
    ensure(spark, graft.Tables.documents(spark, sfDir),
      s"$sfDir-documents", "doc_id", "text", analyzerName)

  /** Write one immutable segment. Postings land bucket-partitioned; termDict
    * is derivable from postings but materialized per segment so facet reads
    * never touch postings. */
  def writeSegment(idx: InvertedIndex, dir: String, segNo: Int): Unit = {
    val seg = f"$dir/seg=$segNo%05d"
    idx.postings
      .withColumn("bucket", bucketUdf(col("term")))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$seg/postings")
    idx.termDict.coalesce(1).write.mode("overwrite").parquet(s"$seg/termdict")
    idx.docStats.write.mode("overwrite").parquet(s"$seg/docstats")
    Files.createDirectories(Paths.get(seg))
    Files.writeString(Paths.get(s"$seg/meta.json"),
      s"""{"numDocs":${idx.numDocs},"sumDl":${idx.sumDl}}""")
  }

  /** Append a new segment (streaming ingest / incremental refresh). */
  def appendSegment(idx: InvertedIndex, dir: String): Int = {
    val next = listSegments(dir).size
    writeSegment(idx, dir, next)
    Files.writeString(Paths.get(dir, "_SEGMENTS"),
      (listSegments(dir) :+ f"seg=$next%05d").distinct.sorted.mkString("", "\n", "\n"))
    next
  }

  private def listSegments(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("seg=")).toSeq.sorted
  }

  /** Load an index, merging all segments' stats at read time. */
  def load(spark: SparkSession, dir: String): InvertedIndex = {
    val segs = listSegments(dir)
    require(segs.nonEmpty, s"no index segments under $dir")
    def readAll(part: String): DataFrame =
      segs.map(s => spark.read.parquet(s"$dir/$s/$part")).reduce(_ unionByName _)
    val postings = readAll("postings")
    val termDict =
      if (segs.size == 1) readAll("termdict")
      else readAll("termdict").groupBy(col("term"))
        .agg(sum(col("df")).as("df"), sum(col("ctf")).as("ctf"))
    val docStats = readAll("docstats")
    val metas = segs.map { s =>
      val txt = Files.readString(Paths.get(s"$dir/$s/meta.json"))
      val nd = """"numDocs":(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
      val sd = """"sumDl":(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
      (nd, sd)
    }
    val numDocs = metas.map(_._1).sum
    val sumDl = metas.map(_._2).sum
    InvertedIndex(postings, termDict, docStats, numDocs, sumDl)
  }

  /** Compaction: merge all segments into one (the reference's background
    * compaction task, maintenance.h:36-44). Idempotent; readers of the old
    * segments are unaffected until the directory is swapped. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val merged = load(spark, dir)
    val tmp = dir + ".compact"
    writeSegment(merged, tmp, 0)
    Files.writeString(Paths.get(tmp, "_SEGMENTS"), "seg=00000\n")
    val old = Paths.get(dir)
    val bak = Paths.get(dir + ".old")
    Files.move(old, bak)
    Files.move(Paths.get(tmp), old)
    org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    jvmCache.remove(dir)
  }
}
