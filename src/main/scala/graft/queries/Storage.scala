package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.{AvroTables, IcebergTables, JdbcTables, PgCopyTables}

/** Storage-format and physical-layout entries: Avro scan/write, ORC
  * roundtrip, and bucketed co-located joins (SURVEY §2.1 formats; §2.3
  * co-located join strategy).
  */
object Storage {

  private def tmp(prefix: String, dir: String): String =
    sys.props("java.io.tmpdir") + s"/$prefix-" + dir.replaceAll("[^A-Za-z0-9._-]+", "_")

  /** The DML entries (upsert/merge) need a PRISTINE partitioned table per
    * run. Loading it is not the operation under test — a production table
    * exists before a MERGE arrives — so the base is authored ONCE per sf
    * dir and each run starts from a filesystem copy (snapshot-restore, the
    * same trick a benchmark harness plays with database state). */
  private val stagedBase = scala.collection.concurrent.TrieMap.empty[String, String]

  private def freshDocsTable(s: SparkSession, dir: String, name: String): String = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val base = stagedBase.getOrElseUpdate(dir, {
      val b = tmp("graft-iceberg-base", dir)
      IcebergTables.createOrReplace(
        Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
        b, partitionBy = Some("lang"))
      b
    })
    val dst = tmp(name, dir)
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(dst).getFileSystem(conf)
    fs.delete(new Path(dst), true)
    FileUtil.copy(fs, new Path(base), fs, new Path(dst), false, conf)
    dst
  }

  /** Avro write + distributed Avro scan (AvroTables drives the splittable
    * Hadoop input format; third_party/duckdb_avro analogue). The filter
    * proves the scan produces real typed columns, not blobs. */
  def avroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("graft-avro", dir)
    AvroTables.write(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"), path)
    AvroTables.read(s, path)
      .filter(col("n_chars") > 200)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** ORC write + native ORC scan (Spark's built-in columnar alternative —
    * predicate pushdown and column pruning work like parquet). */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("graft-orc", dir)
    Tables.lineitem(s, dir).select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"))
  }

  /** Co-located join over bucketed tables: both sides pre-hashed into the
    * same bucket count on the join key, so the SortMergeJoin needs NO
    * shuffle exchange on either side (asserted in BucketedJoinSpec with
    * broadcast disabled) — the layout you'd give a repeatedly-joined
    * 100 TB fact table so every downstream join skips its exchange. */
  /** saveAsTable with overwrite, robust to a PREVIOUS JVM's leftover
    * warehouse directory: the in-memory catalog forgets the table across
    * restarts but its location persists, and saveAsTable refuses to reuse
    * it — clear the orphaned location first. */
  def saveBucketed(df: DataFrame, name: String, buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    if (!s.catalog.tableExists(name)) {
      // defaultTablePath honors the CURRENT database (public ->
      // <warehouse>/public.db/<name>), not the bare warehouse root
      val p = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(name)))
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(name)
  }

  /** Idempotent: the bucketed layout is built once per dataset (the whole
    * point of bucketing is paying the shuffle once, then every later join
    * skipping its exchange), so re-runs only re-check the row count. */
  private def ensureBucketed(df: DataFrame, name: String, buckets: Int,
      key: String): Unit = {
    val s = df.sparkSession
    val fresh =
      try s.catalog.tableExists(name) && s.table(name).count() == df.count()
      catch { case _: Exception => false }
    if (!fresh) saveBucketed(df, name, buckets, key)
  }

  def q18BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketed(Tables.orders(s, dir), "graft_orders_bkt", 16, "o_custkey")
    ensureBucketed(Tables.customer(s, dir), "graft_customer_bkt", 16, "c_custkey")
    s.table("graft_orders_bkt")
      .join(s.table("graft_customer_bkt"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("bigint")).as("rev_cents"))
  }

  /** PG binary COPY round-trip (PgCopyTables): supplier → sharded PGCOPY
    * containers → typed read-back → aggregate. Proves the byte-level
    * serializers against real data, not just the plumbing: any
    * endianness/length slip changes the numbers and fails the oracle. */
  def pgcopyRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("graft-pgcopy", dir)
    val supplier = Tables.supplier(s, dir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    PgCopyTables.write(supplier, path)
    PgCopyTables.read(s, path, supplier.schema)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("s_acctbal") * 100).cast("bigint")).as("bal_cents"),
        max(col("s_name")).as("max_name"))
  }

  /** TopN pushed INTO the foreign server (reference
    * topn_optional_pgscan.test_slow): the DSv2 JDBC catalog negotiates
    * `ORDER BY … FETCH FIRST k ROWS ONLY` into the remote SQL
    * (DerbyTopNDialect), so the remote returns k rows instead of the whole
    * table — JdbcTablesSpec asserts the PushedTopN in the scan. */
  def jdbcTopNPushdown(s: SparkSession, dir: String): DataFrame = {
    val dbDir = tmp("graft-derby", dir)
    JdbcTables.seedCustomer(s, dir, dbDir)
    JdbcTables.readCustomerTopN(s, dbDir, 10)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("bigint").as("bal_cents"))
  }

  /** Foreign-server scan through embedded Derby (JdbcTables): seed once,
    * then a PARTITIONED jdbc read (8 parallel range-scans on c_custkey)
    * with the filter pushed into the remote SQL (PushedFilters on the
    * JDBCRelation), aggregated Spark-side. */
  def jdbcForeignScan(s: SparkSession, dir: String): DataFrame = {
    val dbDir = tmp("graft-derby", dir)
    JdbcTables.seedCustomer(s, dir, dbDir)
    val maxKey = Tables.customer(s, dir).agg(max("c_custkey")).head().getLong(0)
    JdbcTables.readCustomer(s, dbDir, maxKey)
      .filter(col("c_acctbal") > 1000.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("c_acctbal") * 100).cast("bigint")).as("bal_cents"))
  }

  /** Build the Iceberg fixture table once per sf dir: snapshot 1 = even
    * doc_ids, snapshot 2 appends the odd ones (idempotent — reused when
    * both snapshots already exist). */
  private def ensureIcebergDocs(s: SparkSession, dir: String): String = {
    val table = tmp("graft-iceberg", dir)
    val ok =
      try IcebergTables.snapshots(s, table).size == 2
      catch { case _: Exception => false }
    if (!ok) {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
      IcebergTables.createOrReplace(docs.filter(col("doc_id") % 2 === 0), table)
      IcebergTables.append(docs.filter(col("doc_id") % 2 === 1), table)
    }
    table
  }

  /** Schema-evolution fixture + query (reference ddl/alter_rename.test +
    * add_column family; Iceberg's metadata-only evolution contract): build
    * snapshot 1 with (doc_id, lang, n_chars); ADD COLUMN score; append rows
    * carrying it; RENAME n_chars → len_chars. The read must serve BOTH
    * generations of files under the evolved schema — len_chars from the
    * pre-rename files via the name mapping, score as NULL for them. */
  def icebergSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val table = tmp("graft-iceberg-evo-entry", dir)
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
    val ok =
      try IcebergTables.read(s, table).columns.contains("len_chars")
      catch { case _: Exception => false }
    if (!ok) {
      IcebergTables.createOrReplace(docs.filter(col("doc_id") % 2 === 0), table)
      IcebergTables.addColumn(s, table, "score", org.apache.spark.sql.types.LongType)
      IcebergTables.append(docs.filter(col("doc_id") % 2 === 1)
        .withColumn("score", col("doc_id") * 10), table)
      IcebergTables.renameColumn(s, table, "n_chars", "len_chars")
    }
    IcebergTables.read(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("len_chars")).cast("bigint").as("chars"),
        sum(coalesce(col("score"), lit(0L))).cast("bigint").as("score_sum"))
  }

  /** Identity-partitioned Iceberg fixture: snapshot 1 = all docs
    * partitioned by lang, snapshot 2 = partition drop of 'de'. */
  private def ensureIcebergPart(s: SparkSession, dir: String): String = {
    val table = tmp("graft-iceberg-part", dir)
    val ok =
      try IcebergTables.snapshots(s, table).size == 2
      catch { case _: Exception => false }
    if (!ok) {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
      IcebergTables.createOrReplace(docs, table, partitionBy = Some("lang"))
      IcebergTables.dropPartition(s, table, "de")
    }
    table
  }

  /** Manifest-level partition pruning: a lang='en' read plans ONLY the en
    * partition's files — other partitions are never listed or opened (the
    * property that matters at 100 TB; asserted on inputFiles in the spec). */
  def icebergPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergPart(s, dir)
    IcebergTables.read(s, table, partitionValue = Some("en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Partition drop = file-level DELETE: the current snapshot must not see
    * the dropped 'de' partition, with no data rewritten. */
  def icebergDropPartition(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergPart(s, dir)
    IcebergTables.read(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Range-clustered Iceberg fixture: snapshot 1 = docs range-partitioned
    * on doc_id into 8 files with disjoint key ranges (the sort-key layout
    * that makes min/max file skipping effective), snapshot 2 = compaction
    * of the same data into 2 files. */
  private def ensureIcebergRange(s: SparkSession, dir: String): String = {
    val table = tmp("graft-iceberg-range", dir)
    val ok =
      try IcebergTables.snapshots(s, table).size == 2
      catch { case _: Exception => false }
    if (!ok) {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
      IcebergTables.createOrReplace(docs, table)
      IcebergTables.compact(s, table, targetFiles = 2)
    }
    table
  }

  /** Min/max stats file skipping: a doc_id range read of the FIRST
    * snapshot (8 range-clustered files) prunes on manifest bounds before
    * any data IO; the residual filter gives exact semantics. The spec
    * asserts the pruned plan opens strictly fewer files. */
  def icebergStatsSkip(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergRange(s, dir)
    val first = IcebergTables.snapshots(s, table).min
    IcebergTables.read(s, table, asOfSnapshotId = Some(first),
        range = Some(("doc_id", 100L, 299L)))
      .filter(col("doc_id").between(100L, 299L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Compaction: the rewritten (replace-snapshot) table must hold exactly
    * the original rows — proven against the raw-table oracle. */
  def icebergCompact(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergRange(s, dir)
    IcebergTables.read(s, table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Iceberg snapshot scan: resolve metadata.json → manifest list →
    * manifests on the driver, then a plain distributed parquet scan of the
    * live files; both commits must be visible. */
  def icebergScan(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergDocs(s, dir)
    IcebergTables.read(s, table)
      .filter(col("n_chars") > 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Time travel: the same table read as of snapshot 1 must see ONLY the
    * first commit (even doc_ids) — the append must not leak backwards. */
  def icebergTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val table = ensureIcebergDocs(s, dir)
    val first = IcebergTables.snapshots(s, table).min
    IcebergTables.read(s, table, asOfSnapshotId = Some(first))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Keyed upsert + insert-ignore over a PARTITIONED Iceberg table
    * (reference insert_conflict.test: OR REPLACE upserts, DO NOTHING
    * skips): doc_id%10==0 rows get their n_chars replaced, a shifted copy
    * of the %10==1 rows inserts as new keys (both via one partition-scoped
    * CoW commit), then an insert-ignore mixing all-conflicting and new keys
    * must add only the new ones. Each run starts from a fresh copy of the
    * staged base so the final table is a pure function of `documents`. */
  def icebergUpsert(s: SparkSession, dir: String): DataFrame = {
    val table = freshDocsTable(s, dir, "graft-iceberg-upsert")
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
    val updates = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("n_chars", col("n_chars") + 1000000)
      .unionByName(docs.filter(col("doc_id") % 10 === 1)
        .withColumn("doc_id", col("doc_id") + 1000000))
    IcebergTables.upsert(s, table, updates, "doc_id")
    IcebergTables.insertIgnore(s, table,
      docs.filter(col("doc_id") % 10 === 0) // every key conflicts → skipped
        .unionByName(docs.filter(col("doc_id") % 10 === 2)
          .withColumn("doc_id", col("doc_id") + 2000000)), // all new → inserted
      "doc_id")
    IcebergTables.read(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(col("doc_id")).as("id_sum"))
  }

  /** Three-clause MERGE INTO (merge_into_chscan.test_slow) on a
    * lang-partitioned native Iceberg table: matched rows with target
    * n_chars < 200 are deleted, other matched rows take the source's
    * n_chars (+500000), unmatched source rows (+3000000 keys) insert —
    * one atomic partition-scoped copy-on-write commit. */
  def icebergMerge(s: SparkSession, dir: String): DataFrame = {
    val table = freshDocsTable(s, dir, "graft-iceberg-merge")
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
    val src = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("n_chars", col("n_chars") + 500000)
      .unionByName(docs.filter(col("doc_id") % 7 === 3)
        .withColumn("doc_id", col("doc_id") + 3000000))
    IcebergTables.merge(s, table, src, "doc_id",
      deleteCond = Some(col("n_chars") < 200),
      updateSet = Map("n_chars" -> col("src_n_chars")))
    IcebergTables.read(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(col("doc_id")).as("id_sum"))
  }

  /** MERGE ... RETURNING (pg/dml/merge_returning_rowid.test): the merge's
    * actions return their post-image rows — updates carry the new n_chars,
    * inserts their full row, deletes nothing. Folded per lang with the
    * surviving table state cross-checked in the same result. */
  def icebergMergeReturning(s: SparkSession, dir: String): DataFrame = {
    val table = freshDocsTable(s, dir, "graft-iceberg-mergeret")
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
    val src = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("n_chars", col("n_chars") + 500000)
      .unionByName(docs.filter(col("doc_id") % 7 === 3)
        .withColumn("doc_id", col("doc_id") + 3000000))
    val returned = IcebergTables.mergeReturning(s, table, src, "doc_id",
      deleteCond = Some(col("n_chars") < 200),
      updateSet = Map("n_chars" -> col("src_n_chars")))
    val survivors = IcebergTables.read(s, table)
      .agg(count(lit(1)).as("n_left"), sum(col("doc_id")).as("left_id_sum"))
    returned
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ret"), sum(col("n_chars")).as("ret_chars"),
        sum(col("doc_id")).as("ret_id_sum"))
      .crossJoin(broadcast(survivors))
  }

  /** DELETE ... RETURNING (pg/dml/returning.test): deleteWhere commits one
    * partition-scoped CoW snapshot and RETURNS the deleted rows. The entry
    * folds the returned rows per lang AND cross-checks the surviving table
    * state in the same result, so the oracle pins both sides of the verb. */
  def icebergDeleteReturning(s: SparkSession, dir: String): DataFrame = {
    val table = freshDocsTable(s, dir, "graft-iceberg-delret")
    val returned = IcebergTables.deleteWhere(s, table, col("n_chars") < 150)
    val survivors = IcebergTables.read(s, table)
      .agg(count(lit(1)).as("n_left"), sum(col("doc_id")).as("left_id_sum"))
    returned
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_deleted"), sum(col("doc_id")).as("del_id_sum"))
      .crossJoin(broadcast(survivors))
  }

  /** UPDATE ... SET ... WHERE ... RETURNING (pg/dml/update_returning_rowid
    * .test): updateWhere commits a partition-scoped CoW snapshot and
    * RETURNS the post-image rows. The SET moves n_chars by +100000 on a
    * doc_id stripe; the entry folds the returned post-images per lang and
    * cross-checks the updated table's totals in the same result. */
  def icebergUpdateReturning(s: SparkSession, dir: String): DataFrame = {
    val table = freshDocsTable(s, dir, "graft-iceberg-updret")
    val returned = IcebergTables.updateWhere(s, table,
      col("doc_id") % 5 === 0, Map("n_chars" -> (col("n_chars") + 100000)))
    val state = IcebergTables.read(s, table)
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("chars_total"))
    returned
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_updated"), sum(col("n_chars")).as("upd_chars"))
      .crossJoin(broadcast(state))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "iceberg_update_returning" -> icebergUpdateReturning,
    "iceberg_delete_returning" -> icebergDeleteReturning,
    "iceberg_merge" -> icebergMerge,
    "iceberg_merge_returning" -> icebergMergeReturning,
    "iceberg_upsert" -> icebergUpsert,
    "iceberg_scan" -> icebergScan,
    "iceberg_schema_evolution" -> icebergSchemaEvolution,
    "iceberg_time_travel" -> icebergTimeTravel,
    "iceberg_partition_prune" -> icebergPartitionPrune,
    "iceberg_drop_partition" -> icebergDropPartition,
    "iceberg_stats_skip" -> icebergStatsSkip,
    "iceberg_compact" -> icebergCompact,
    "avro_roundtrip" -> avroRoundtrip,
    "orc_roundtrip" -> orcRoundtrip,
    "jdbc_foreign_scan" -> jdbcForeignScan,
    "jdbc_topn_pushdown" -> jdbcTopNPushdown,
    "pgcopy_roundtrip" -> pgcopyRoundtrip,
    "q18_bucketed_join" -> q18BucketedJoin)

  val oracles: Map[String, String] = Map(
    "iceberg_update_returning" ->
      """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        |upd AS (SELECT doc_id, lang, n_chars + 100000 AS n_chars
        |        FROM base WHERE doc_id % 5 = 0),
        |state AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN n_chars + 100000
        |                ELSE n_chars END) AS BIGINT) AS chars_total
        |  FROM base)
        |SELECT u.lang, count(*) AS n_updated,
        |  CAST(sum(u.n_chars) AS BIGINT) AS upd_chars,
        |  s.n_rows, s.chars_total
        |FROM upd u, state s
        |GROUP BY u.lang, s.n_rows, s.chars_total""".stripMargin,
    "iceberg_delete_returning" ->
      """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        |del AS (SELECT * FROM base WHERE n_chars < 150),
        |left_agg AS (SELECT count(*) AS n_left,
        |  CAST(sum(doc_id) AS BIGINT) AS left_id_sum
        |  FROM base WHERE NOT coalesce(n_chars < 150, false))
        |SELECT d.lang, count(*) AS n_deleted,
        |  CAST(sum(d.doc_id) AS BIGINT) AS del_id_sum,
        |  l.n_left, l.left_id_sum
        |FROM del d, left_agg l
        |GROUP BY d.lang, l.n_left, l.left_id_sum""".stripMargin,
    "iceberg_merge" ->
      """WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |final AS (
        |  SELECT * FROM base WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id, lang, source, n_chars + 500000 FROM base
        |  WHERE doc_id % 7 = 0 AND n_chars >= 200
        |  UNION ALL
        |  SELECT doc_id + 3000000, lang, source, n_chars FROM base
        |  WHERE doc_id % 7 = 3)
        |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM final GROUP BY 1""".stripMargin,
    "iceberg_merge_returning" ->
      """WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |ret AS (
        |  SELECT doc_id, lang, n_chars + 500000 AS n_chars FROM base
        |  WHERE doc_id % 7 = 0 AND n_chars >= 200
        |  UNION ALL
        |  SELECT doc_id + 3000000, lang, n_chars FROM base WHERE doc_id % 7 = 3),
        |final AS (
        |  SELECT doc_id FROM base WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id FROM base WHERE doc_id % 7 = 0 AND n_chars >= 200
        |  UNION ALL
        |  SELECT doc_id + 3000000 FROM base WHERE doc_id % 7 = 3),
        |surv AS (SELECT count(*) AS n_left, CAST(sum(doc_id) AS BIGINT) AS left_id_sum
        |         FROM final)
        |SELECT lang, count(*) AS n_ret, CAST(sum(n_chars) AS BIGINT) AS ret_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS ret_id_sum, n_left, left_id_sum
        |FROM ret, surv GROUP BY lang, n_left, left_id_sum""".stripMargin,
    "iceberg_upsert" ->
      """WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |up AS (SELECT doc_id, lang, source, n_chars + 1000000 AS n_chars
        |       FROM base WHERE doc_id % 10 = 0
        |       UNION ALL
        |       SELECT doc_id + 1000000, lang, source, n_chars
        |       FROM base WHERE doc_id % 10 = 1),
        |afterup AS (SELECT * FROM base
        |            WHERE doc_id NOT IN (SELECT doc_id FROM up)
        |            UNION ALL SELECT * FROM up),
        |ins AS (SELECT doc_id + 2000000 AS doc_id, lang, source, n_chars
        |        FROM base WHERE doc_id % 10 = 2),
        |final AS (SELECT * FROM afterup UNION ALL
        |          SELECT * FROM ins
        |          WHERE doc_id NOT IN (SELECT doc_id FROM afterup))
        |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM final GROUP BY 1""".stripMargin,
    "iceberg_scan" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE n_chars > 100 GROUP BY 1""".stripMargin,
    "iceberg_schema_evolution" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN doc_id * 10 ELSE 0 END) AS BIGINT) AS score_sum
        |FROM documents GROUP BY 1""".stripMargin,
    "iceberg_time_travel" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE doc_id % 2 = 0 GROUP BY 1""".stripMargin,
    "iceberg_partition_prune" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang = 'en' GROUP BY 1""".stripMargin,
    "iceberg_drop_partition" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang <> 'de' GROUP BY 1""".stripMargin,
    "iceberg_stats_skip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 299 GROUP BY 1""".stripMargin,
    "iceberg_compact" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1""".stripMargin,
    "avro_roundtrip" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 200",
    "orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "jdbc_foreign_scan" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer WHERE c_acctbal > 1000.0
        |GROUP BY 1""".stripMargin,
    "jdbc_topn_pushdown" ->
      """SELECT c_custkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "pgcopy_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        |  max(s_name) AS max_name
        |FROM supplier GROUP BY 1""".stripMargin,
    "q18_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin)
}
