package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class AvroTablesSpec extends AnyFunSuite {

  test("avro roundtrip preserves nulls, arrays, binary and all primitives") {
    val spark = TestSpark.spark
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType),
      StructField("small", IntegerType),
      StructField("ratio", DoubleType),
      StructField("f", FloatType),
      StructField("name", StringType),
      StructField("blob", BinaryType),
      StructField("vec", ArrayType(FloatType))))
    val rows = Seq(
      Row(1L, true, 7, 0.5, 1.5f, "alpha", Array[Byte](1, 2, 3), Seq(0.1f, 0.2f)),
      Row(2L, null, null, null, null, null, null, null),
      Row(3L, false, -1, -2.25, 0.0f, "", Array.empty[Byte], Seq.empty[Float]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val path = sys.props("java.io.tmpdir") + s"/graft-avro-spec-${System.nanoTime()}"
    AvroTables.write(df, path)
    val back = AvroTables.read(spark, path)
    assert(back.schema.fieldNames.toSeq == st.fieldNames.toSeq)
    assert(back.schema.fields.map(_.dataType).toSeq == st.fields.map(_.dataType).toSeq)
    def norm(r: Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    assert(back.collect().map(norm).toSet == rows.map(norm).toSet)
  }

  test("avro scan of documents equals the parquet scan") {
    val spark = TestSpark.spark
    val src = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text", "lang", "n_chars")
    val path = sys.props("java.io.tmpdir") + s"/graft-avro-docs-${System.nanoTime()}"
    AvroTables.write(src, path)
    val back = AvroTables.read(spark, path)
    assert(back.rdd.getNumPartitions >= 1) // splittable input format plans real partitions
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }
}
