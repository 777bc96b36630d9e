package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed-field postings + INCLUDE columnstore for a composite search index.
  *
  * Spark-native analogue of the reference's multi-column inverted index
  * (/root/reference/server/catalog/inverted_index.h — an
  * `InvertedIndexColumnInfo` per column may carry a text dictionary, a
  * typed posting list, and/or `store_values=true`;
  * tests/sqllogic/sdb/pg/index/inverted_index_indexed_vs_included.test):
  *
  *   - an INDEXED typed field (string keyword / integral / floating /
  *     date-time) serves equality and range predicates FROM THE INDEX —
  *     the reference's Term / "Granular Range" filter nodes inside
  *     IRESEARCH_SCAN (inverted_index_include_pushdown.test);
  *   - an INCLUDE column keeps a typed columnstore copy inside the index,
  *     so a query projecting only covered columns never touches the base
  *     table at all — `Lookup: columnstore` vs `Lookup: table`.
  *
  * Layout under the composite dir (all parquet, all written by executors):
  *
  * {{{
  *   <dir>/_FIELDS                    (manifest json: idCol, fields, included)
  *   <dir>/field=<name>/              (v, doc_id) range-partitioned + sorted by v
  *   <dir>/stored/                    (doc_id, <included cols...>) sorted by doc_id
  * }}}
  *
  * The field datasets are the idiomatic-Spark stand-in for per-term typed
  * posting lists: `(v, doc_id)` written `repartitionByRange(v).sortWithinPartitions(v)`
  * means BOTH an equality probe and a range predicate prune to the files and
  * row groups whose min/max straddle the constant — at 100 TB a
  * `sev >= 13` drive reads the tail files of the field dataset, never the
  * wide base table. NULL field values are omitted (a `v = x` / `v > x`
  * predicate can never select them — identical semantics to the filter it
  * claims), so the semi-join on `doc_id` is exactly the predicate's row set.
  *
  * The stored dataset is the covering columnstore: two to a few narrow
  * columns, sorted by `doc_id` so the matched-ids join prunes row groups.
  * Rebuild (REFRESH) is one linear scan of the source — these are sorted
  * COPIES, not merged structures, so there is no incremental-merge
  * machinery to maintain; the text postings beside them keep their own
  * segmented incremental path.
  */
object FieldStore {
  /** Manifest: which columns are indexed fields / included, the id, and
    * coherence fingerprints (`extras`): `segfp` pins the text index's
    * segment list at sidecar-build time, `srcfp` the source files — the
    * claim rules compare these before serving covered reads, because the
    * sidecar rebuilds only on REFRESH while text segments / IVF vectors
    * advance incrementally. A mismatched sidecar must fall back to the
    * base-table join (correct, just not covered), never silently drop the
    * newer docs. */
  final case class Manifest(idCol: String, fields: Seq[String],
      included: Seq[String], extras: Map[String, String] = Map.empty)

  private def manifestPath(dir: String) = s"$dir/_FIELDS"

  def exists(spark: SparkSession, dir: String): Boolean =
    IndexStore.exists(spark, manifestPath(dir))

  def readManifest(spark: SparkSession, dir: String): Manifest = {
    val lines = IndexStore.readString(spark, manifestPath(dir)).split("\n")
    def row(k: String): Seq[String] = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.stripPrefix(s"$k=").split(",").filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    val extras = lines.collect {
      case l if l.contains("=") &&
          !Seq("id", "fields", "included").contains(l.takeWhile(_ != '=')) =>
        l.takeWhile(_ != '=') -> l.dropWhile(_ != '=').drop(1)
    }.toMap
    Manifest(row("id").headOption.getOrElse("doc_id"), row("fields"),
      row("included"), extras)
  }

  /** Whether a TEXT-index sidecar still matches its index's segment list
    * (streaming ingest appends segments; REFRESH re-syncs the sidecar). A
    * pre-fingerprint manifest reads as coherent; a MISSING manifest (e.g.
    * the sidecar is mid-rebuild — its own build queries plan through the
    * claim rules) reads as incoherent, quietly falling back to base. */
  def textCoherent(spark: SparkSession, dir: String): Boolean =
    exists(spark, dir) &&
      readManifest(spark, dir).extras.get("segfp").forall { fp =>
        fp == IndexStore.listSegments(spark, dir.stripSuffix("-fields")).mkString(",")
      }

  /** Whether a sidecar's recorded source fingerprint matches `current`
    * (count:bytes:maxMtime of the source files). */
  def sourceCoherent(spark: SparkSession, dir: String, current: Option[String]): Boolean =
    exists(spark, dir) &&
      ((readManifest(spark, dir).extras.get("srcfp"), current) match {
        case (Some(a), Some(b)) => a == b
        case _ => true // no fingerprint on either side: legacy manifest
      })

  /** Build (or rebuild) the field datasets + stored columnstore from the
    * source relation. One pass per field dataset plus one for the stored
    * copy — each a plain column-pruned scan of the source, so the total
    * cost is linear in the covered columns, not in the table width. The
    * manifest is written LAST (atomic rename): a crash mid-build leaves no
    * manifest, and the next CREATE rebuilds from scratch. */
  def build(spark: SparkSession, source: DataFrame, dir: String,
      idCol: String, fields: Seq[String], included: Seq[String],
      extras: Map[String, String] = Map.empty,
      ndvCols: Seq[String] = Nil): Unit = {
    val fs = IndexStore.fsFor(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p)) fs.delete(p, true)
    fields.foreach { f =>
      source.select(col(f).as("v"), col(idCol).cast("long").as("doc_id"))
        .filter(col("v").isNotNull)
        .repartitionByRange(col("v"))
        .sortWithinPartitions("v")
        .write.mode("overwrite").parquet(s"$dir/field=$f")
    }
    if (included.nonEmpty) {
      source.select((col(idCol).cast("long").as("doc_id") +:
          included.map(c => col(c))): _*)
        .repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dir/stored")
      writeColStats(spark, dir, included, ndvCols)
    }
    val extraLines = (extras ++ (if (ndvCols.nonEmpty)
        Map("ndv" -> ndvCols.mkString(",")) else Map.empty))
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    IndexStore.writeStringAtomic(spark, manifestPath(dir),
      s"id=$idCol\nfields=${fields.mkString(",")}\nincluded=${included.mkString(",")}\n" +
        (if (extras.isEmpty && ndvCols.isEmpty) "" else extraLines))
  }

  /** Per-INCLUDE-column statistics from ONE aggregation pass over the just-
    * written stored columnstore — the Spark analogue of the reference's
    * per-column `hyperloglog` option (inverted_index_hyperloglog_option
    * .test: NDV tracked per segment, unioned at scan time, exposed to the
    * optimizer as approx_unique). Our sidecar rebuilds wholly at
    * CREATE/REFRESH, so one pass over the final dataset is the equivalent
    * of the reference's segment union. min/max/null-count are recorded for
    * every atomic column regardless (the reference does the same);
    * approx_unique only for the opted-in `ndvCols`. */
  private def writeColStats(spark: SparkSession, dir: String,
      included: Seq[String], ndvCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{BooleanType, DataType, DateType, NumericType, StringType, TimestampType}
    def atomic(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | BooleanType | DateType | TimestampType => true
      case _ => false
    }
    val st = spark.read.parquet(s"$dir/stored")
    val aggs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column](
      count(lit(1)).cast("long").as("rc"))
    val legs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    included.foreach { c =>
      val dt = st.schema(c).dataType
      aggs += sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"nulls__$c")
      legs += (("nulls", c))
      if (dt.isInstanceOf[NumericType]) {
        aggs += min(col(c)).cast("string").as(s"min__$c")
        aggs += max(col(c)).cast("string").as(s"max__$c")
        legs += (("min", c)); legs += (("max", c))
      }
      if (ndvCols.contains(c) && atomic(dt)) {
        aggs += approx_count_distinct(col(c)).cast("long").as(s"ndv__$c")
        legs += (("ndv", c))
      }
    }
    val r = st.agg(aggs.head, aggs.drop(1).toSeq: _*).head()
    val lines = ("rowcount=" + r.getLong(0)) +: legs.zipWithIndex.map {
      case ((kind, c), i) =>
        s"$kind.$c=${if (r.isNullAt(i + 1)) "" else r.get(i + 1).toString}"
    }.toSeq
    IndexStore.writeStringAtomic(spark, s"$dir/_COLSTATS",
      lines.mkString("", "\n", "\n"))
  }

  /** Re-derive `_COLSTATS` from the current stored dataset (the VACUUM
    * (RECOMPUTE_STATS_TABLE) leg — the reference runs ANALYZE on the
    * backing store tables). Returns false when there is no sidecar or no
    * INCLUDE columnstore to profile. */
  def recomputeStats(spark: SparkSession, dir: String): Boolean =
    if (!exists(spark, dir)) false
    else {
      val m = readManifest(spark, dir)
      if (m.included.isEmpty) false
      else {
        writeColStats(spark, dir, m.included,
          m.extras.get("ndv").toSeq.flatMap(_.split(",")).filter(_.nonEmpty))
        true
      }
    }

  /** Parsed `_COLSTATS`: (rowCount, stat-kind → column → value). */
  def colStats(spark: SparkSession, dir: String): Option[(Long, Map[String, String])] =
    if (!IndexStore.exists(spark, s"$dir/_COLSTATS")) None
    else {
      val lines = IndexStore.readString(spark, s"$dir/_COLSTATS")
        .split("\n").filter(_.contains("="))
      val m = lines.map(l =>
        l.takeWhile(_ != '=') -> l.dropWhile(_ != '=').drop(1)).toMap
      m.get("rowcount").map(rc => (rc.toLong, m - "rowcount"))
    }

  /** Register the stored columnstore as a catalog table carrying its
    * statistics, so Spark's cost-based optimizer sees rowCount + per-column
    * NDV/null-count/min-max for join-order and broadcast decisions — the
    * "exposed to the optimizer" leg of the reference's hyperloglog option
    * and of search_table_stats_propagation.test. */
  def registerStatsTable(spark: SparkSession, dir: String, name: String): Unit =
    colStats(spark, dir).foreach { case (rc, stats) =>
      import org.apache.spark.sql.catalyst.TableIdentifier
      import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING parquet OPTIONS (path '$dir/stored')")
      val byCol = stats.toSeq.groupBy(_._1.split("\\.", 2)(1))
      val colStatsMap = byCol.flatMap { case (c, kvs) =>
        val kinds = kvs.map { case (k, v) => k.split("\\.", 2)(0) -> v }.toMap
        def nonEmpty(k: String) = kinds.get(k).filter(_.nonEmpty)
        val cs = CatalogColumnStat(
          distinctCount = nonEmpty("ndv").map(BigInt(_)),
          min = nonEmpty("min"),
          max = nonEmpty("max"),
          nullCount = nonEmpty("nulls").map(BigInt(_)))
        Some(c -> cs)
      }
      val bytes = IndexStore.fsFor(spark, dir)
        .getContentSummary(new org.apache.hadoop.fs.Path(s"$dir/stored")).getLength
      spark.sessionState.catalog.alterTableStats(TableIdentifier(name),
        Some(CatalogStatistics(sizeInBytes = BigInt(bytes),
          rowCount = Some(BigInt(rc)), colStats = colStatsMap)))
    }

  /** The `(v, doc_id)` dataset of one indexed field. */
  def field(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/field=$name")

  /** The covering columnstore `(doc_id, included...)`. */
  def stored(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/stored")

  def drop(spark: SparkSession, dir: String): Unit = {
    val fs = IndexStore.fsFor(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
