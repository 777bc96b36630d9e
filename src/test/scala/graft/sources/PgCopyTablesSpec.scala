package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Byte-level round-trip of the PGCOPY container across every supported
  * payload type, including NULLs in each column and an empty partition
  * (which must still emit a valid header+trailer container). */
class PgCopyTablesSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i2", ShortType), StructField("i4", IntegerType),
    StructField("i8", LongType), StructField("f4", FloatType),
    StructField("f8", DoubleType), StructField("b", BooleanType),
    StructField("t", StringType), StructField("by", BinaryType)))

  test("all-types round-trip with nulls and empty partitions") {
    val spark = TestSpark.spark
    val rows = Seq(
      Row(1.toShort, 2, 3L, 4.5f, 6.75, true, "héllo", Array[Byte](1, 2, 0, -1)),
      Row(Short.MinValue, Int.MaxValue, Long.MinValue, Float.NaN,
        Double.MaxValue, false, "", Array.empty[Byte]),
      Row(null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5), schema) // 5 parts > 3 rows
    val path = sys.props("java.io.tmpdir") + "/graft-pgcopy-spec"
    PgCopyTables.write(df, path)

    val back = PgCopyTables.read(spark, path, schema).collect()
    assert(back.length == 3)
    // NaN != NaN under ==; normalize so the NaN row still compares equal
    def norm(r: Row): Seq[Any] = r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case f: Float if f.isNaN => "NaN"
      case d: Double if d.isNaN => "NaN"
      case v => v
    }
    assert(back.map(norm).toSet == rows.map(norm).toSet)
  }

  test("header bytes match the PG spec signature") {
    val spark = TestSpark.spark
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1.toShort, 1, 1L, 1f, 1d, true, "x",
        Array[Byte](9))), 1), schema)
    val path = sys.props("java.io.tmpdir") + "/graft-pgcopy-spec-hdr"
    PgCopyTables.write(df, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).find(_.getName.endsWith(".pgcopy")).get
    val in = fs.open(file)
    val head = new Array[Byte](19); in.readFully(head); in.close()
    assert(head.take(11).toSeq == Seq[Byte]('P', 'G', 'C', 'O', 'P', 'Y',
      '\n', 0xFF.toByte, '\r', '\n', 0x00))
    assert(head.drop(11).forall(_ == 0), "flags + extension length must be 0")
  }
}
