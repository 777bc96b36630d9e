package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** INET value functions — the reference vendors duckdb_inet for the pg inet
  * type surface (/root/reference/third_party/duckdb_inet;
  * tests/sqllogic/sdb/pg/simple/inet.test): host/masklen/network/broadcast/
  * set_masklen/family and the `<<=` containment operator.
  *
  * Values are strings `a.b.c.d[/m]` (m defaults to 32), IPv4 — the subset
  * the reference's own tests exercise; every function is a composition of
  * built-in expressions (split / arithmetic / concat), so the whole surface
  * stays inside whole-stage codegen with no UDF. Address arithmetic runs on
  * the 32-bit value as a long; divisions are by powers of two below 2^53,
  * exact in the double `floor` path.
  */
object Inet {

  private def addr(c: Column): Column = regexp_extract(c, "^([^/]+)", 1)

  private def octets(c: Column): Column = split(addr(c), "\\.")

  /** Numeric mask length; absent → 32 (pg semantics for inet). */
  def inetMasklen(c: Column): Column =
    coalesce(nullif(regexp_extract(c, "/(\\d+)$", 1), lit("")).cast("int"), lit(32))

  /** The address as an unsigned 32-bit value in a long. */
  def inetToLong(c: Column): Column = {
    val o = octets(c)
    o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
      o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long")
  }

  private def fromLong(l: Column): Column = concat_ws(".",
    floor(l / 16777216L).cast("long") % 256L,
    floor(l / 65536L).cast("long") % 256L,
    floor(l / 256L).cast("long") % 256L,
    l % 256L)

  /** Host-block size for a mask length: 2^(32−m). */
  private def chunk(mlen: Column): Column = pow(lit(2.0), lit(32) - mlen).cast("long")

  /** Network base address (long) under `mlen`. */
  private def netLong(c: Column, mlen: Column): Column = {
    val sz = chunk(mlen)
    floor(inetToLong(c) / sz).cast("long") * sz
  }

  /** pg `host(inet)` — the bare address text, no mask. */
  def inetHost(c: Column): Column = addr(c)

  /** pg `family(inet)` — 4 for every value this v4 surface accepts. */
  def inetFamily(c: Column): Column = lit(4)

  /** pg `network(inet)` — masked base address with the mask length. */
  def inetNetwork(c: Column): Column =
    concat(fromLong(netLong(c, inetMasklen(c))), lit("/"), inetMasklen(c))

  /** pg `broadcast(inet)` — highest address of the network. */
  def inetBroadcast(c: Column): Column =
    fromLong(netLong(c, inetMasklen(c)) + chunk(inetMasklen(c)) - 1L)

  /** pg `set_masklen(inet, m)`. */
  def inetSetMasklen(c: Column, m: Int): Column = concat(addr(c), lit(s"/$m"))

  /** pg `a <<= b` — a is contained in or equals b: a's mask is at least as
    * long and a's address masked at b's length lands on b's network. */
  def inetContainedBy(a: Column, b: Column): Column = {
    val mb = inetMasklen(b)
    inetMasklen(a) >= mb && netLong(a, mb) === netLong(b, mb)
  }
}
