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
    * allocation a distributed INSERT uses (one counter IO per batch). */
  def nextBlock(s: SequenceDef, n: Long): Long = lock(s.file).synchronized {
    require(n >= 1, "sequence block must be >= 1")
    val (minV, maxV) = bounds(s)
    var v = lastValue(s.file) match {
      case None => s.start
      case Some(last) => step(s, last, minV, maxV)
    }
    val first = v
    var i = 1L
    while (i < n) { v = step(s, v, minV, maxV); i += 1 }
    writeLast(s.file, v)
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

  /** pg currval: the last value THIS sequence handed out; error before the
    * first nextval (pg SQLSTATE 55000). */
  def currval(s: SequenceDef): Long = lastValue(s.file).getOrElse(
    throw new IllegalStateException(
      s"""currval of sequence "${s.name}" is not yet defined in this session"""))

  def setval(s: SequenceDef, v: Long): Long = lock(s.file).synchronized {
    writeLast(s.file, v); v
  }
}
