package graft.search

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Role-based access control — the reference's plan-time privilege layer
  * (/root/reference/server/connector/optimizer/rbac.{h,cpp};
  * tests/sqllogic/sdb/pg/rbac/). Scope here is the query-engine slice:
  * roles, SELECT grants on tables (scan roots), role membership, and a
  * session-scoped current role — not wire auth (passwords/connections are
  * the pg protocol layer SURVEY §0 scopes out).
  *
  * Model (PG semantics): with no current role the session is the
  * superuser and unrestricted. After `SET ROLE r`, a scan of table T is
  * allowed iff `r` (or a role `r` is a member of, transitively) holds a
  * SELECT grant on T's scan root. Tables nobody ever granted are still
  * protected FROM a set role (deny-by-default, like PG non-owner access).
  *
  * Enforcement is deliberately NOT an optimizer rule: the reference's
  * enf_disable_optimizer_bypass.test pins that disabling the optimizer
  * cannot skip the check, so it runs as a mandatory pre-planning pass —
  * here a planner Strategy ([[graft.plans.RbacCheck]]), which Spark's
  * `spark.sql.optimizer.excludedRules` cannot exclude, fired on the FINAL
  * optimized plan. Because claim rules may have replaced the protected
  * scan with index-artifact reads, the check also maps index-artifact
  * paths back to their source roots through the index catalogs.
  */
object Rbac {
  /** conf key holding the session's current role ("" = superuser). SET
    * ROLE writes it; being session conf, it is naturally session-scoped. */
  val RoleConf = "spark.graft.role"

  private[search] val roles = TrieMap.empty[String, Boolean]
  /** role → roles it is a member of (direct edges). */
  private[search] val memberOf = TrieMap.empty[String, Set[String]]
  /** scan root → roles granted SELECT. */
  private[search] val grants = TrieMap.empty[String, Set[String]]

  def createRole(name: String): Unit = roles.put(name.toLowerCase, true)

  def dropRole(name: String): Unit = {
    val n = name.toLowerCase
    roles.remove(n)
    memberOf.remove(n)
    memberOf.transform((_, s) => s - n)
    grants.transform((_, s) => s - n)
  }

  def exists(name: String): Boolean = roles.contains(name.toLowerCase)

  def grantSelect(root: String, role: String): Unit = {
    require(exists(role), s"role $role does not exist")
    grants.updateWith(root)(s => Some(s.getOrElse(Set.empty) + role.toLowerCase))
  }

  def revokeSelect(root: String, role: String): Unit =
    grants.updateWith(root)(_.map(_ - role.toLowerCase))

  def grantRole(granted: String, to: String): Unit = {
    require(exists(granted), s"role $granted does not exist")
    require(exists(to), s"role $to does not exist")
    memberOf.updateWith(to.toLowerCase)(s => Some(s.getOrElse(Set.empty) + granted.toLowerCase))
  }

  /** The role set `role` effectively holds: itself + transitive memberships. */
  private def effective(role: String): Set[String] = {
    val seen = scala.collection.mutable.Set(role)
    val queue = scala.collection.mutable.Queue(role)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      memberOf.getOrElse(r, Set.empty).foreach { m =>
        if (seen.add(m)) queue.enqueue(m)
      }
    }
    seen.toSet
  }

  /** Whether any access restriction exists at all — the zero-cost fast
    * path for sessions that never touch RBAC. */
  def active: Boolean = grants.nonEmpty || roles.nonEmpty

  def currentRole(spark: SparkSession): Option[String] =
    Option(spark.conf.get(RoleConf, "")).map(_.trim.toLowerCase).filter(_.nonEmpty)

  /** Check one scan root against the session's current role; throws the
    * reference's "permission denied" on failure. No current role =
    * superuser = allowed. A root with no grant row is deny-by-default for
    * a set role — but only once RBAC is in use at all. */
  def check(spark: SparkSession, root: String, tableLabel: String): Unit =
    currentRole(spark).foreach { role =>
      val eff = effective(role)
      val ok = grants.getOrElse(root, Set.empty).exists(eff.contains)
      if (!ok) throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" -> s"permission denied for table $tableLabel (role $role)"))
    }

  /** Test hook. */
  private[graft] def reset(): Unit = {
    roles.clear(); memberOf.clear(); grants.clear()
  }
}
