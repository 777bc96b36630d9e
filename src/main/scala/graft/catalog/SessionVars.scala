package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** pg-style session variables: `SET name [=|TO] value`, `SET LOCAL ...`,
  * `SHOW name`, `RESET name` (reference corpus any/pg/settings/ *.test,
  * sdb/pg/settings — the `sdb_*` engine knobs arrive through this surface,
  * e.g. `SET sdb_levenshtein_max_terms = 5`).
  *
  * Engine knobs map onto the spark conf they control (so `SET
  * sdb_levenshtein_max_terms` really changes the fuzzy-expansion cap);
  * everything else is a plain session variable. Spark's own `SET
  * spark.*=...` keys are NOT intercepted — dotted keys stay native.
  *
  * Variables are PER SparkSession (pg scope = per connection), held in a
  * weak-keyed map so two concurrent sessions' SETs never interleave and a
  * dropped session garbage-collects its variables. Knob values already
  * live in the session's own RuntimeConfig.
  */
object SessionVars {

  /** sdb knob -> spark conf key (the reference spelling on the left). */
  private[catalog] val knobMap: Map[String, String] = Map(
    "sdb_levenshtein_max_terms" -> "spark.graft.levenshteinMaxTerms",
    "sdb_scored_terms_limit" -> "spark.graft.scoredTermsLimit",
    "sdb_strict_claims" -> "spark.graft.strictClaims",
    // pg/duck `SET TimeZone` rides on Spark's session zone (rendering and
    // NTZ↔instant conversions)
    "timezone" -> "spark.sql.session.timeZone")

  /** Knob defaults, pg-visible through SHOW before any SET and restored by
    * RESET (config_variables.cpp:391-434: levenshtein_max_terms 64,
    * scored_terms_limit 1024). */
  private val knobDefaults: Map[String, String] = Map(
    "sdb_levenshtein_max_terms" -> "64",
    "sdb_scored_terms_limit" -> "1024",
    "sdb_strict_claims" -> "false")

  /** SET-time validation, pg's per-GUC check functions
    * (config_variables.cpp: non-negative integers for the caps). */
  private def validate(name: String, value: String): Unit = {
    def bad(): Nothing = throw new IllegalArgumentException(
      s"""invalid value for parameter "$name": "$value"""")
    name match {
      case "sdb_levenshtein_max_terms" | "sdb_scored_terms_limit" =>
        val n = try value.trim.toInt catch { case _: NumberFormatException => bad() }
        if (n < 0) bad()
      case "sdb_strict_claims" =>
        if (!Set("true", "false", "on", "off", "0", "1")
          .contains(value.trim.toLowerCase)) bad()
      case _ =>
    }
  }

  private val varsBySession =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, TrieMap[String, String]]())
  @volatile private[catalog] var varsVersion: Long = 0L

  private def vars(spark: SparkSession): TrieMap[String, String] =
    varsBySession.synchronized {
      var m = varsBySession.get(spark)
      if (m == null) { m = TrieMap.empty[String, String]; varsBySession.put(spark, m) }
      m
    }

  /** Built-in parameters with pg's defaults: SHOW works before any SET,
    * and RESET returns here (variables/scopes corpus). */
  private val defaults: Map[String, String] = Map(
    "default_transaction_isolation" -> "read committed",
    "search_path" -> "\"$user\", public",
    "application_name" -> "",
    "client_encoding" -> "UTF8",
    "default_transaction_read_only" -> "off",
    "in_hot_standby" -> "off")

  def get(spark: SparkSession, name: String): Option[String] = {
    val n = name.toLowerCase
    knobMap.get(n) match {
      case Some(conf) => spark.conf.getOption(conf).orElse(knobDefaults.get(n))
      case None => vars(spark).get(n).orElse(defaults.get(n))
    }
  }

  /** Returns the previous value (for SET LOCAL undo). */
  def set(spark: SparkSession, name: String, value: String): Option[String] = {
    val n = name.toLowerCase
    validate(n, value)
    val prev = get(spark, n)
    knobMap.get(n) match {
      case Some(conf) => spark.conf.set(conf, value)
      case None => vars(spark).put(n, value)
    }
    varsVersion += 1
    prev
  }

  def reset(spark: SparkSession, name: String): Unit = {
    val n = name.toLowerCase
    knobMap.get(n) match {
      case Some(conf) => spark.conf.unset(conf)
      case None => vars(spark).remove(n)
    }
    varsVersion += 1
  }

  private[catalog] def restore(spark: SparkSession, name: String,
      prev: Option[String]): Unit = prev match {
    case Some(v) => set(spark, name, v)
    case None => reset(spark, name)
  }

  /** The schemas a bare name resolves against, in order — the session's
    * search_path with `"$user"` skipped (no per-user schemas here) and
    * pg_catalog implicitly first, as pg does. */
  def searchPathSchemas(spark: SparkSession): Seq[String] =
    "pg_catalog" +: get(spark, "search_path").getOrElse("public")
      .split(",").iterator.map(_.trim.stripPrefix("\"").stripSuffix("\"").toLowerCase)
      .filter(s => s.nonEmpty && s != "$user").toSeq

  /** pg CURRENT_SCHEMA: the first concrete schema on search_path. */
  def currentSchema(spark: SparkSession): String =
    searchPathSchemas(spark).find(_ != "pg_catalog").getOrElse("public")

  /** All plain variables + materialized knob values, for pg_settings. */
  def all(spark: SparkSession): Seq[(String, String)] =
    (vars(spark).toSeq ++ knobMap.toSeq.flatMap { case (n, conf) =>
      spark.conf.getOption(conf).map(n -> _)
    }).sortBy(_._1)

  /** pg RESET ALL: clear every variable of THIS session (defaults and
    * knob confs revert to their unset readings). */
  def resetSession(spark: SparkSession): Unit = {
    vars(spark).clear()
    knobMap.valuesIterator.foreach(spark.conf.unset)
    varsVersion += 1
  }

  private[graft] def resetAll(): Unit = varsBySession.synchronized {
    val it = varsBySession.values().iterator()
    while (it.hasNext) it.next().clear()
    varsVersion += 1
  }
}
