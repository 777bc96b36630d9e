package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

import ObjectCatalog.SequenceDef

/** Runtime for catalog sequences: the pg nextval/currval/setval contract
  * over a tiny durable counter file (reference server/catalog/sequence.cpp,
  * site_docs/sql/statements/create_sequence corpus — START/INCREMENT/
  * MINVALUE/MAXVALUE/CYCLE and the "reached maximum value" error).
  *
  * The counter advances under a JVM lock + atomic file rename — correct for
  * the single-driver sessions the corpus models. Per-ROW nextval at 100 TB
  * is the same serialization point it is in pg; the scale path is block
  * allocation ([[graft.functions.Sequences.assignIds]]): INSERT reserves
  * one block per batch (one metadata IO) and assigns ids distributively,
  * which is also what the DEFAULT path below does.
  */
object SequenceOps {

  private val mapper = new ObjectMapper()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lock(file: String): Object =
    locks.computeIfAbsent(file, _ => new Object)

  private def fs(p: Path): FileSystem =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  /** Last value handed out, or None before the first nextval. */
  def lastValue(file: String): Option[Long] = {
    val p = new Path(file)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val node = try mapper.readTree(in.readAllBytes()) finally in.close()
      Option(node.get("last")).map(_.asLong())
    }
  }

  private def writeLast(file: String, v: Long): Unit = {
    val p = new Path(file)
    val f = fs(p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val node = mapper.createObjectNode(); node.put("last", v)
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
  }

  private def bounds(s: SequenceDef): (Long, Long) = (
    s.minV.getOrElse(if (s.inc > 0) 1L else Long.MinValue + 1),
    s.maxV.getOrElse(if (s.inc > 0) Long.MaxValue - 1 else -1L))

  /** Advance by one step and return the value (pg nextval). */
  def nextval(s: SequenceDef): Long = nextBlock(s, 1)

  /** Reserve `n` consecutive steps, returning the FIRST value — the bulk
    * allocation a distributed INSERT uses (one counter IO per batch).
    * Closed-form (BigInt): O(1) regardless of block size, so reserving a
    * billion ids costs the same one metadata IO as reserving one. */
  def nextBlock(s: SequenceDef, n: Long): Long = lock(s.file).synchronized {
    require(n >= 1, "sequence block must be >= 1")
    val (minV, maxV) = bounds(s)
    val first = lastValue(s.file) match {
      case None => s.start
      case Some(last) => step(s, last, minV, maxV)
    }
    val last =
      if (n == 1) first
      else {
        val inc = BigInt(s.inc)
        val end = BigInt(first) + inc * (n - 1)
        val inRange = if (s.inc > 0) end <= BigInt(maxV) else end >= BigInt(minV)
        if (inRange) end.toLong
        else if (!s.cycle) throw new IllegalStateException(
          if (s.inc > 0)
            s"""nextval: reached maximum value of sequence "${s.name}" ($maxV)"""
          else
            s"""nextval: reached minimum value of sequence "${s.name}" ($minV)""")
        else {
          // CYCLE: values to the boundary from `first`, then whole cycles of
          // C values restarting at the boundary — position the last value
          // by modular arithmetic instead of stepping n times
          val (edge, home) = if (s.inc > 0) (BigInt(maxV), BigInt(minV))
                             else (BigInt(minV), BigInt(maxV))
          val headCount = ((edge - BigInt(first)) / inc + 1) // first..edge
          val cycleCount = (edge - home) / inc + 1
          val rem = (BigInt(n) - headCount - 1).mod(cycleCount)
          (home + rem * inc).toLong
        }
      }
    writeLast(s.file, last)
    first
  }

  private def step(s: SequenceDef, last: Long, minV: Long, maxV: Long): Long = {
    val next = last + s.inc
    if (s.inc > 0 && (next > maxV || next < last)) {
      if (s.cycle) minV
      else throw new IllegalStateException(
        s"""nextval: reached maximum value of sequence "${s.name}" ($maxV)""")
    } else if (s.inc < 0 && (next < minV || next > last)) {
      if (s.cycle) maxV
      else throw new IllegalStateException(
        s"""nextval: reached minimum value of sequence "${s.name}" ($minV)""")
    } else next
  }

  /** Assign the reserved block's values (`first`, `first+inc`, ...) to the
    * rows of `df` in `ordCol` order as column `outName` — distributed: a
    * range sort plus RDD `zipWithIndex` (per-partition counts then local
    * offsets, two jobs total), never a global single-partition window, so
    * a 100 TB insert batch assigns ids at full parallelism. */
  def assignBlock(df: org.apache.spark.sql.DataFrame, ordCol: String,
      outName: String, first: Long, inc: Long,
      castTo: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val sorted = df.sort(col(ordCol))
    val schema = sorted.schema
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      SRow.fromSeq(r.toSeq :+ (first + i * inc))
    }
    val raw = spark.createDataFrame(withIdx,
      schema.add("__seq_raw", org.apache.spark.sql.types.LongType))
    raw.withColumn(outName, col("__seq_raw").cast(castTo)).drop("__seq_raw")
  }

  /** pg currval: the last value THIS sequence handed out; error before the
    * first nextval (pg SQLSTATE 55000). */
  def currval(s: SequenceDef): Long = lastValue(s.file).getOrElse(
    throw new IllegalStateException(
      s"""currval of sequence "${s.name}" is not yet defined in this session"""))

  def setval(s: SequenceDef, v: Long): Long = lock(s.file).synchronized {
    writeLast(s.file, v); v
  }
}
