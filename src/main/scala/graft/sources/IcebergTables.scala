package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Apache Iceberg v2 table: spec-conformant metadata so a snapshot
  * scan and time travel work without the Iceberg runtime jars (absent in
  * this build). Reference analogue: /root/reference/third_party/
  * duckdb_iceberg (metadata-driven snapshot scans over parquet).
  *
  * Layout per the public spec (iceberg.apache.org/spec):
  * {{{
  *   table/metadata/vN.metadata.json      table state + snapshot log (JSON)
  *   table/metadata/version-hint.text     latest N
  *   table/metadata/snap-<id>.avro        manifest list (Avro)
  *   table/metadata/<uuid>-m0.avro        manifest: data-file entries (Avro)
  *   table/data/<uuid>/part-*.parquet     data files
  * }}}
  *
  * Planning is driver-side METADATA IO only (a few KB of JSON + Avro, like
  * any Iceberg client); the data read is a plain distributed parquet scan
  * of the snapshot's live files, so pushdown/pruning work unchanged. The
  * writer covers unpartitioned append-only tables (commit = new data files
  * + new manifest + full manifest list + next metadata version); each
  * append bumps the snapshot, and `read(asOfSnapshotId)` replays any
  * committed state. Supported column types: the flat primitives the driver
  * tables use (long/int/double/float/string/boolean/binary).
  */
object IcebergTables {

  private val mapper = new ObjectMapper()

  // ---- iceberg <-> spark schema --------------------------------------------

  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case other => throw new IllegalArgumentException(s"iceberg: unsupported type $other")
  }

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "boolean" => BooleanType
    case "binary" => BinaryType
    case other => throw new IllegalArgumentException(s"iceberg: unsupported type $other")
  }

  // ---- avro schemas for the manifest chain (spec field-ids) ----------------

  private def field(name: String, id: Int, sch: Schema, optional: Boolean): Schema.Field = {
    val s = if (optional) Schema.createUnion(Schema.create(Schema.Type.NULL), sch) else sch
    val f = new Schema.Field(name, s, null,
      if (optional) Schema.Field.NULL_DEFAULT_VALUE else null)
    f.addProp("field-id", id)
    f
  }
  private def prim(t: Schema.Type) = Schema.create(t)

  /** manifest_file record of the manifest list (spec §Manifest Lists). */
  private val manifestFileSchema: Schema = Schema.createRecord(
    "manifest_file", null, "org.apache.iceberg", false, Seq(
      field("manifest_path", 500, prim(Schema.Type.STRING), optional = false),
      field("manifest_length", 501, prim(Schema.Type.LONG), optional = false),
      field("partition_spec_id", 502, prim(Schema.Type.INT), optional = false),
      field("content", 517, prim(Schema.Type.INT), optional = false),
      field("sequence_number", 515, prim(Schema.Type.LONG), optional = false),
      field("min_sequence_number", 516, prim(Schema.Type.LONG), optional = false),
      field("added_snapshot_id", 503, prim(Schema.Type.LONG), optional = false),
      field("added_files_count", 504, prim(Schema.Type.INT), optional = false),
      field("existing_files_count", 505, prim(Schema.Type.INT), optional = false),
      field("deleted_files_count", 506, prim(Schema.Type.INT), optional = false),
      field("added_rows_count", 512, prim(Schema.Type.LONG), optional = false),
      field("existing_rows_count", 513, prim(Schema.Type.LONG), optional = false),
      field("deleted_rows_count", 514, prim(Schema.Type.LONG), optional = false)
    ).asJava)

  /** data_file + manifest_entry records (spec §Manifests). `partition` is
    * the empty struct — unpartitioned spec-id 0. */
  private val dataFileSchema: Schema = Schema.createRecord(
    "r2", null, "org.apache.iceberg", false, Seq(
      field("content", 134, prim(Schema.Type.INT), optional = false),
      field("file_path", 100, prim(Schema.Type.STRING), optional = false),
      field("file_format", 101, prim(Schema.Type.STRING), optional = false),
      field("partition", 102,
        Schema.createRecord("r102", null, "org.apache.iceberg", false,
          Seq.empty[Schema.Field].asJava), optional = false),
      field("record_count", 103, prim(Schema.Type.LONG), optional = false),
      field("file_size_in_bytes", 104, prim(Schema.Type.LONG), optional = false)
    ).asJava)

  private val manifestEntrySchema: Schema = Schema.createRecord(
    "manifest_entry", null, "org.apache.iceberg", false, Seq(
      field("status", 0, prim(Schema.Type.INT), optional = false),
      field("snapshot_id", 1, prim(Schema.Type.LONG), optional = true),
      field("sequence_number", 3, prim(Schema.Type.LONG), optional = true),
      field("file_sequence_number", 4, prim(Schema.Type.LONG), optional = true),
      field("data_file", 2, dataFileSchema, optional = false)
    ).asJava)

  // ---- small FS helpers ----------------------------------------------------

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
      records: Seq[GenericRecord]): Long = {
    val out = fs(spark, path).create(path, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    fs(spark, path).getFileStatus(path).getLen
  }

  private def readAvro(spark: SparkSession, path: Path): Seq[GenericRecord] = {
    val in = fs(spark, path).open(path)
    try {
      val r = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toVector finally r.close()
    } finally in.close()
  }

  private def writeText(spark: SparkSession, path: Path, text: String): Unit = {
    val out = fs(spark, path).create(path, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession, path: Path): String = {
    val in = fs(spark, path).open(path)
    try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
  }

  // ---- commit path ---------------------------------------------------------

  private case class DataFileInfo(path: String, rows: Long, bytes: Long)

  /** Write `df` as parquet data files under data/<uuid>/ and stat them from
    * the parquet footers (driver metadata IO, the same file-stats gathering
    * an Iceberg commit does — no data re-read). */
  private def writeDataFiles(df: DataFrame, tableDir: String): Seq[DataFileInfo] = {
    val spark = df.sparkSession
    val sub = new Path(s"$tableDir/data/${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(sub.toString)
    val filesystem = fs(spark, sub)
    filesystem.listStatus(sub).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            st.getPath, spark.sparkContext.hadoopConfiguration))
        val rows = try footer.getRecordCount finally footer.close()
        DataFileInfo(st.getPath.toString, rows, st.getLen)
      }
  }

  private def manifestRecord(info: DataFileInfo, snapshotId: Long, seq: Long): GenericRecord = {
    val dfRec = new GenericData.Record(dataFileSchema)
    dfRec.put("content", 0)
    dfRec.put("file_path", info.path)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition", new GenericData.Record(
      dataFileSchema.getField("partition").schema()))
    dfRec.put("record_count", info.rows)
    dfRec.put("file_size_in_bytes", info.bytes)
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", 1) // added
    e.put("snapshot_id", snapshotId)
    e.put("sequence_number", seq)
    e.put("file_sequence_number", seq)
    e.put("data_file", dfRec)
    e
  }

  /** Create the table (destroying any prior state) with `df` as snapshot 1. */
  def createOrReplace(df: DataFrame, tableDir: String): Long = {
    val p = new Path(tableDir)
    fs(df.sparkSession, p).delete(p, true)
    append(df, tableDir)
  }

  /** Commit `df` as a new append snapshot; returns the new snapshot id. */
  def append(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val metaDir = new Path(s"$tableDir/metadata")
    val hintPath = new Path(metaDir, "version-hint.text")
    val prior: Option[ObjectNode] =
      if (fs(spark, hintPath).exists(hintPath)) {
        val v = readText(spark, hintPath).toInt
        Some(mapper.readTree(
          readText(spark, new Path(metaDir, s"v$v.metadata.json"))).asInstanceOf[ObjectNode])
      } else None
    val version = prior.map(_ => readText(spark, hintPath).toInt + 1).getOrElse(1)
    val seq = prior.map(_.get("last-sequence-number").asLong + 1).getOrElse(1L)
    val snapshotId = seq // monotonic, unique per commit
    val nowMs = System.currentTimeMillis()

    prior.foreach { m =>
      val declared = m.get("schemas").get(0).get("fields").asScala
        .map(f => (f.get("name").asText, f.get("type").asText)).toSeq
      val incoming = df.schema.fields.toSeq.map(f => (f.name, icebergType(f.dataType)))
      require(declared == incoming,
        s"iceberg append: schema mismatch — table $declared vs data $incoming")
    }

    // 1. data files + their manifest
    val files = writeDataFiles(df, tableDir)
    val manifestPath = new Path(metaDir, s"${UUID.randomUUID()}-m0.avro")
    val manifestLen = writeAvro(spark, manifestPath, manifestEntrySchema,
      files.map(manifestRecord(_, snapshotId, seq)))

    // 2. manifest list: prior snapshot's manifests (now "existing") + new
    val newEntry = {
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", manifestPath.toString)
      r.put("manifest_length", manifestLen)
      r.put("partition_spec_id", 0)
      r.put("content", 0) // data
      r.put("sequence_number", seq)
      r.put("min_sequence_number", seq)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", files.size)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", files.map(_.rows).sum)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      r
    }
    val priorManifests: Seq[GenericRecord] = prior.map { m =>
      val curId = m.get("current-snapshot-id").asLong
      val cur = m.get("snapshots").asScala.find(_.get("snapshot-id").asLong == curId).get
      readAvro(spark, new Path(cur.get("manifest-list").asText))
    }.getOrElse(Seq.empty)
    val listPath = new Path(metaDir, s"snap-$snapshotId-1-${UUID.randomUUID()}.avro")
    writeAvro(spark, listPath, manifestFileSchema, newEntry +: priorManifests)

    // 3. next metadata version
    val meta = mapper.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid",
      prior.map(_.get("table-uuid").asText).getOrElse(UUID.randomUUID().toString))
    meta.put("location", tableDir)
    meta.put("last-sequence-number", seq)
    meta.put("last-updated-ms", nowMs)
    meta.put("last-column-id", df.schema.length)
    val schemaNode = meta.putArray("schemas").addObject()
    schemaNode.put("type", "struct").put("schema-id", 0)
    val fieldsNode = schemaNode.putArray("fields")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      fieldsNode.addObject().put("id", i + 1).put("name", f.name)
        .put("required", false).put("type", icebergType(f.dataType))
    }
    meta.put("current-schema-id", 0)
    meta.putArray("partition-specs").addObject()
      .put("spec-id", 0).putArray("fields")
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999)
    meta.putArray("sort-orders").addObject()
      .put("order-id", 0).putArray("fields")
    meta.put("default-sort-order-id", 0)
    meta.put("current-snapshot-id", snapshotId)
    val snaps = meta.putArray("snapshots")
    prior.foreach(_.get("snapshots").asScala.foreach(s => snaps.add(s)))
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId).put("timestamp-ms", nowMs)
      .put("sequence-number", seq).put("schema-id", 0)
      .put("manifest-list", listPath.toString)
    snap.putObject("summary").put("operation", "append")
    val log = meta.putArray("snapshot-log")
    prior.foreach(_.get("snapshot-log").asScala.foreach(e => log.add(e)))
    log.addObject().put("timestamp-ms", nowMs).put("snapshot-id", snapshotId)
    meta.putArray("metadata-log")
    meta.putObject("properties")

    writeText(spark, new Path(metaDir, s"v$version.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    writeText(spark, hintPath, version.toString)
    snapshotId
  }

  // ---- scan path -----------------------------------------------------------

  /** Snapshot ids in commit order (for tests / time travel). */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Long] = {
    val metaDir = new Path(s"$tableDir/metadata")
    val v = readText(spark, new Path(metaDir, "version-hint.text")).toInt
    val meta = mapper.readTree(readText(spark, new Path(metaDir, s"v$v.metadata.json")))
    meta.get("snapshots").asScala.map(_.get("snapshot-id").asLong).toSeq
  }

  /** Distributed scan of the current (or as-of) snapshot: resolve the
    * manifest chain on the driver, then one parquet scan over the live
    * files with the declared schema (pushdown/pruning intact). */
  def read(spark: SparkSession, tableDir: String,
      asOfSnapshotId: Option[Long] = None): DataFrame = {
    val metaDir = new Path(s"$tableDir/metadata")
    val v = readText(spark, new Path(metaDir, "version-hint.text")).toInt
    val meta = mapper.readTree(readText(spark, new Path(metaDir, s"v$v.metadata.json")))
    val snapId = asOfSnapshotId.getOrElse(meta.get("current-snapshot-id").asLong)
    val snap = meta.get("snapshots").asScala
      .find(_.get("snapshot-id").asLong == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg: unknown snapshot $snapId in $tableDir"))

    val schema = StructType(meta.get("schemas").asScala
      .find(_.get("schema-id").asInt == meta.get("current-schema-id").asInt).get
      .get("fields").asScala.toSeq
      .map(f => StructField(f.get("name").asText, sparkType(f.get("type").asText))))

    val manifests = readAvro(spark, new Path(snap.get("manifest-list").asText))
    val dataFiles = manifests
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => readAvro(spark, new Path(m.get("manifest_path").toString)))
      .filter(_.get("status").asInstanceOf[Int] != 2) // drop deleted entries
      .map(_.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString)
    require(dataFiles.nonEmpty, s"iceberg: snapshot $snapId has no data files")
    spark.read.schema(schema).parquet(dataFiles: _*)
  }
}
