package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NativeVectorSpec extends AnyFunSuite {

  test("fused native kernels equal the higher-order-function compositions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }.toDF("id", "a", "b")

    val both = rows.select(
      VectorFunctions.l2SqrDistanceHof(col("a"), col("b")).as("hof_l2"),
      call_function("l2sqr_native", col("a"), col("b")).as("nat_l2"),
      VectorFunctions.innerProductHof(col("a"), col("b")).as("hof_ip"),
      call_function("inner_product_native", col("a"), col("b")).as("nat_ip"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "l2 must match bit-for-bit")
      assert(r.getDouble(2) == r.getDouble(3), "ip must match bit-for-bit")
    }
  }

  test("native kernels callable from SQL text and null-safe") {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("nv")
    val r = spark.sql(
      "SELECT l2sqr_native(a, b), inner_product_native(a, b), l2sqr_native(a, CAST(NULL AS ARRAY<FLOAT>)) FROM nv")
      .head()
    assert(r.getDouble(0) == 8.0 && r.getDouble(1) == 11.0)
    assert(r.isNullAt(2))
  }
}
