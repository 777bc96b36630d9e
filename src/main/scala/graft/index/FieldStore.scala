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
      extras: Map[String, String] = Map.empty): Unit = {
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
    }
    val extraLines = extras.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    IndexStore.writeStringAtomic(spark, manifestPath(dir),
      s"id=$idCol\nfields=${fields.mkString(",")}\nincluded=${included.mkString(",")}\n" +
        (if (extras.isEmpty) "" else extraLines))
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
