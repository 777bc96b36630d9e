package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed,
  * deterministic feature extraction (builder brief: decode libs are not in
  * this container, so the DECODE step is a clearly-marked deterministic
  * stand-in — everything around it, the binary-typed schema, the UDF
  * signature over byte arrays, and the downstream plumbing, is real).
  *
  * At 100 TB the media bytes dominate IO: features are extracted in one pass
  * over the binary column and the bytes are dropped from the projection
  * immediately after (column pruning keeps them out of every later stage).
  */
object MultiModal {

  /** STUB DECODER — stands in for an image decode (`???` in a container
    * with codecs): derives (width, height, channels) deterministically from
    * the md5 of the bytes so any engine can recompute it. A real deployment
    * swaps ONLY this function body for a codec call; the signature
    * (Array[Byte] → struct) and everything downstream stay unchanged. */
  val decodeImageStub: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def nib(i: Int): Int = (d(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
      (16 * (1 + nib(0)), 16 * (1 + nib(1)), 1 + nib(2) % 3)
    }

  /** Per-row media features: byte length + stub-decoded dimensions. The
    * binary column never survives past this projection. */
  def imageFeatures(df: DataFrame, binCol: Column): DataFrame =
    df.withColumn("_dec", decodeImageStub(binCol))
      .withColumn("n_bytes", length(binCol).cast("bigint"))
      .withColumn("width", col("_dec._1").cast("bigint"))
      .withColumn("height", col("_dec._2").cast("bigint"))
      .withColumn("channels", col("_dec._3").cast("bigint"))
      .drop("_dec")
}
