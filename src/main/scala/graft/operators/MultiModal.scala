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

  /** Hex nibble `pos` (1-based) of an md5 hex string, as an int column. */
  private def nib(h: Column, pos: Int): Column =
    conv(substring(h, pos, 1), 16, 10).cast("int")

  /** Video-shaped frame sampling over a binary media column: probe the
    * container for its frame count (STUB: derived from the bytes' md5 —
    * a real deployment swaps the probe and the per-frame decode for codec
    * calls), emit one row per `every`-th frame, and extract per-frame
    * features (a perceptual-hash stand-in + a brightness stand-in). The
    * Spark plumbing is the real thing: the fan-out is one `explode` of a
    * `sequence` (no shuffle, no UDF in the row-multiplying step), the
    * media bytes are reduced to a 32-char digest BEFORE the fan-out, and
    * per-frame features are codegen'd column expressions. */
  def frameSample(df: DataFrame, binCol: Column, every: Int): DataFrame = {
    val digest = md5(binCol) // bytes leave the plan here
    val nFrames = (lit(4) * (lit(1) + nib(digest, 4))).as("n_frames")
    val withFrames = df
      .withColumn("_digest", digest)
      .withColumn("n_frames", nFrames)
      .withColumn("frame",
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
      .withColumn("frame", col("frame").cast("bigint"))
    val frameKey = md5(concat(col("_digest"), lit(":"), col("frame").cast("string")))
    withFrames
      .withColumn("_fk", frameKey)
      .withColumn("phash", substring(col("_fk"), 1, 8))
      .withColumn("brightness",
        (nib(col("_fk"), 9) * 16 + nib(col("_fk"), 10)).cast("bigint"))
      .drop("_digest", "_fk")
  }
}
