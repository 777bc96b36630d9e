package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PostgreSQL binary COPY container read/write — the Spark analogue of the
  * reference's `COPY ... (FORMAT binary)` connector
  * (/root/reference/server/connector/duckdb_pg_binary_copy.cpp). The format
  * is the public PG spec: an 11-byte signature `PGCOPY\n\377\r\n\0` +
  * int32 flags + int32 header-extension, then per tuple an int16 field
  * count and per field an int32 byte length (-1 = NULL) followed by the
  * network-byte-order payload, closed by an int16 -1 trailer.
  *
  * Write is distributed: one complete container file per partition (each
  * with its own header/trailer), the same sharded-COPY layout the reference
  * streams per-chunk. Read parallelizes per FILE — the container has no
  * sync markers so a single file cannot be split; at scale the writer's
  * one-file-per-partition sharding is what keeps the read parallel.
  *
  * PGCOPY carries no schema (the PG table declares it), so `read` takes the
  * expected StructType, exactly like COPY FROM into a typed table.
  * Supported payloads: int2/int4/int8, float4/float8, bool, text, bytea.
  */
object PgCopyTables {

  private val Signature: Array[Byte] =
    Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xFF.toByte, '\r', '\n', 0x00)

  private def writeField(out: DataOutputStream, dt: DataType, v: Any): Unit = dt match {
    case ShortType => out.writeInt(2); out.writeShort(v.asInstanceOf[Short].toInt)
    case IntegerType => out.writeInt(4); out.writeInt(v.asInstanceOf[Int])
    case LongType => out.writeInt(8); out.writeLong(v.asInstanceOf[Long])
    case FloatType => out.writeInt(4); out.writeFloat(v.asInstanceOf[Float])
    case DoubleType => out.writeInt(8); out.writeDouble(v.asInstanceOf[Double])
    case BooleanType => out.writeInt(1); out.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
    case StringType =>
      val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]
      out.writeInt(b.length); out.write(b)
    case other => throw new IllegalArgumentException(s"pgcopy write: unsupported type $other")
  }

  private def readField(in: DataInputStream, dt: DataType, len: Int): Any = dt match {
    case ShortType => require(len == 2); in.readShort()
    case IntegerType => require(len == 4); in.readInt()
    case LongType => require(len == 8); in.readLong()
    case FloatType => require(len == 4); in.readFloat()
    case DoubleType => require(len == 8); in.readDouble()
    case BooleanType => require(len == 1); in.readByte() != 0
    case StringType =>
      val b = new Array[Byte](len); in.readFully(b); new String(b, StandardCharsets.UTF_8)
    case BinaryType =>
      val b = new Array[Byte](len); in.readFully(b); b
    case other => throw new IllegalArgumentException(s"pgcopy read: unsupported type $other")
  }

  /** Distributed COPY TO: every partition writes its own complete PGCOPY
    * container under `path` (overwrite semantics on the directory). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val st = df.schema
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val n = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val file = new Path(path, f"part-$pid%05d.pgcopy")
      val out = new DataOutputStream(new java.io.BufferedOutputStream(
        file.getFileSystem(confSer.value).create(file, true)))
      try {
        out.write(Signature); out.writeInt(0); out.writeInt(0)
        var count = 0L
        rows.foreach { row =>
          out.writeShort(st.length)
          var i = 0
          while (i < st.length) {
            if (row.isNullAt(i)) out.writeInt(-1)
            else writeField(out, st.fields(i).dataType, row.get(i))
            i += 1
          }
          count += 1
        }
        out.writeShort(-1)
        Iterator.single(count)
      } finally out.close()
    }.sum()
    require(n >= 0) // materialize the job
  }

  /** Distributed COPY FROM: one task per container file, streaming-parsed
    * (never buffers a whole file). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path)).map(_.getPath.toString)
      .filter(_.endsWith(".pgcopy")).sorted
    require(files.nonEmpty, s"no .pgcopy files under $path")
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fields = schema.fields
    val rows = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { f =>
      val p = new Path(f)
      val in = new DataInputStream(new java.io.BufferedInputStream(
        p.getFileSystem(confSer.value).open(p)))
      val sig = new Array[Byte](11); in.readFully(sig)
      require(java.util.Arrays.equals(sig, Signature), s"bad PGCOPY signature in $f")
      val flags = in.readInt()
      require((flags & 0xFFFF) == 0, s"unsupported PGCOPY flags $flags in $f")
      val extLen = in.readInt()
      if (extLen > 0) in.skipBytes(extLen)
      new Iterator[Row] {
        private var nextCount: Int = in.readShort().toInt
        private var closed = false
        override def hasNext: Boolean = {
          if (!closed && nextCount == -1) { in.close(); closed = true }
          nextCount != -1
        }
        override def next(): Row = {
          require(nextCount == fields.length,
            s"tuple field count $nextCount != schema arity ${fields.length} in $f")
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            val len = in.readInt()
            vals(i) = if (len == -1) null else readField(in, fields(i).dataType, len)
            i += 1
          }
          nextCount =
            try in.readShort().toInt
            catch { case _: EOFException => -1 } // tolerate missing trailer
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
