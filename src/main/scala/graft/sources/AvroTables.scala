package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro scan + write path — the Spark analogue of the reference's Avro
  * connector (/root/reference/third_party/duckdb_avro). The container image
  * ships Avro core + avro-mapred but not the spark-avro connector, so this
  * drives the Hadoop `AvroKeyInputFormat`/`AvroKeyOutputFormat` directly:
  * the input format is SPLITTABLE (Avro sync markers every block), so a scan
  * parallelizes across executors exactly like any other Hadoop-format read —
  * no single-task bottleneck at 100 TB. Records convert to/from Rows at the
  * partition iterator, never buffering a file in memory.
  *
  * Supported column types: the Avro primitives (boolean/int/long/float/
  * double/string/bytes) plus arrays of them, nullable via `[null, T]`
  * unions — enough for every driver table; anything else fails loudly.
  */
object AvroTables {

  // ---- schema mapping ------------------------------------------------------

  def toAvroSchema(st: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, _) => Schema.createArray(prim(et))
      case other => throw new IllegalArgumentException(s"avro write: unsupported type $other")
    }
    val fields = st.fields.map { f =>
      val base = prim(f.dataType)
      val sch =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  def toStructType(schema: Schema): StructType = {
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"avro read: unsupported union $s")
        (nonNull.head, true)
      } else (s, false)
    def dt(s: Schema): DataType = s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case Schema.Type.ARRAY => ArrayType(dt(unwrap(s.getElementType)._1))
      case other => throw new IllegalArgumentException(s"avro read: unsupported type $other")
    }
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (inner, nullable) = unwrap(f.schema())
      StructField(f.name(), dt(inner), nullable)
    })
  }

  // ---- write ---------------------------------------------------------------

  /** Write a DataFrame as a directory of Avro container files, one per
    * partition (the distributed COPY TO ... (FORMAT avro) path). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = toAvroSchema(df.schema).toString
    val st = df.schema
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true) // overwrite semantics
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case ArrayType(_, _) => row.getSeq[Any](i).asJava
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(f.name, v)
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  // ---- read ----------------------------------------------------------------

  /** The writer schema, read from one container-file header (a few KB of
    * driver IO — never a full file). */
  private def readerSchema(spark: SparkSession, path: String): Schema = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(path)).map(_.getPath)
      .find(p => p.getName.endsWith(".avro") && !p.getName.startsWith("_"))
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = fs.open(file)
    try {
      val r = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** Distributed Avro scan: split planning via the Hadoop input format,
    * record→Row conversion inside each partition iterator (fresh values are
    * extracted before the reader advances, so reader-side object reuse is
    * safe). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = readerSchema(spark, path)
    val st = toStructType(schema)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schema.toString)
    val fields = st.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf
    ).map { case (k, _) =>
      val rec = k.datum()
      Row.fromSeq(fields.toSeq.map { f =>
        val v = rec.get(f.name)
        if (v == null) null
        else f.dataType match {
          case StringType => v.toString
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
          case ArrayType(et, _) =>
            v.asInstanceOf[java.util.Collection[_]].asScala.toSeq.map {
              case u if et == StringType => u.toString
              case u => u
            }
          case _ => v
        }
      })
    }
    spark.createDataFrame(rows, st)
  }
}
