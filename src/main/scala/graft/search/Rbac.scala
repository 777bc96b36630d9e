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

  /** One SELECT grant: `columns` None = whole table, Some = just those
    * columns (PG column privileges); `grantOption` allows re-granting
    * (WITH GRANT OPTION). */
  final case class Grant(columns: Option[Set[String]], grantOption: Boolean)

  /** PUBLIC pseudo-role: every role implicitly holds its grants, it always
    * exists and can never be dropped (PG semantics; the reference corpus'
    * xog_f_revoke_public_vs_role.test distinguishes PUBLIC grants from
    * direct ones — revoking one never removes the other). */
  val Public = "public"

  /** name → INHERIT attribute (PG CREATE ROLE [NO]INHERIT): a NOINHERIT
    * role does not automatically use the privileges of roles it belongs
    * to — and breaks inheritance CHAINS passing through it
    * (xmb_inherit_override_not_transitive.test) — though SET ROLE to a
    * membership remains allowed. */
  private[search] val roles = TrieMap.empty[String, Boolean]
  /** role → (role it is a member of → ADMIN OPTION on that edge). */
  private[search] val memberOf = TrieMap.empty[String, Map[String, Boolean]]
  /** scan root → role → grant. */
  private[search] val grants = TrieMap.empty[String, Map[String, Grant]]

  def createRole(name: String, inherit: Boolean = true): Unit =
    roles.put(name.toLowerCase, inherit)

  def dropRole(name: String): Unit = {
    val n = name.toLowerCase
    require(n != Public, "cannot drop role public")
    roles.remove(n)
    memberOf.remove(n)
    memberOf.transform((_, s) => s - n)
    grants.transform((_, m) => m - n)
  }

  def exists(name: String): Boolean =
    name.toLowerCase == Public || roles.contains(name.toLowerCase)

  private def inherits(role: String): Boolean = roles.getOrElse(role, true)

  private def merge(a: Grant, b: Grant): Grant = Grant(
    columns = (a.columns, b.columns) match {
      case (None, _) | (_, None) => None // table-level subsumes
      case (Some(x), Some(y)) => Some(x ++ y)
    },
    grantOption = a.grantOption || b.grantOption)

  /** Whether `role` (with memberships) may CONFER this privilege — holds a
    * covering grant WITH GRANT OPTION (PG: grant option required to
    * re-grant). Superuser (None) always may. */
  private def mayGrant(root: String, role: Option[String],
      columns: Option[Set[String]]): Boolean = role match {
    case None => true
    case Some(r) =>
      val eff = effective(r)
      val held = grants.getOrElse(root, Map.empty)
        .filter { case (g, gr) => eff.contains(g) && gr.grantOption }
      held.values.exists(gr => gr.columns.isEmpty ||
        columns.exists(cs => cs.subsetOf(gr.columns.get)))
  }

  /** `GRANT SELECT [(cols)] ON root TO role [WITH GRANT OPTION]
    * [GRANTED BY by]` with the PG authorization rules: a non-superuser
    * issuer needs a covering grant option; `GRANTED BY r` additionally
    * requires the issuer to be (a member of) r, and the grant is then
    * attributed to r's authority (r needs the grant option). */
  def grantSelect(spark: SparkSession, root: String, role: String,
      columns: Option[Set[String]] = None, grantOption: Boolean = false,
      grantedBy: Option[String] = None): Unit = {
    require(exists(role), s"role $role does not exist")
    val issuer = currentRole(spark)
    grantedBy.foreach { by =>
      require(exists(by), s"role $by does not exist")
      // PG: you may only attribute a grant to a role whose privileges you
      // inherit (the reference's membership rule — and the SAME rule for
      // table and column paths, gb_column_granted_by_membership.test)
      issuer.foreach { r =>
        require(effective(r).contains(by.toLowerCase),
          s"must be member of role $by")
      }
      require(mayGrant(root, Some(by.toLowerCase), columns),
        s"role $by lacks the grant option on this table")
    }
    if (grantedBy.isEmpty)
      require(mayGrant(root, issuer, columns), "permission denied to grant")
    val g = Grant(columns.map(_.map(_.toLowerCase)), grantOption)
    grants.updateWith(root) { m =>
      val cur = m.getOrElse(Map.empty)
      Some(cur.updated(role.toLowerCase,
        cur.get(role.toLowerCase).map(merge(_, g)).getOrElse(g)))
    }
  }

  def revokeSelect(root: String, role: String,
      columns: Option[Set[String]] = None): Unit =
    grants.updateWith(root)(_.map { m =>
      (columns, m.get(role.toLowerCase)) match {
        case (None, _) => m - role.toLowerCase
        case (Some(cs), Some(g)) =>
          g.columns match {
            case Some(held) =>
              val left = held -- cs.map(_.toLowerCase)
              if (left.isEmpty) m - role.toLowerCase
              else m.updated(role.toLowerCase, g.copy(columns = Some(left)))
            case None => m // table-level grant: column revoke is a no-op (PG)
          }
        case _ => m
      }
    })

  /** `GRANT granted TO to [WITH ADMIN OPTION]`. A non-superuser issuer must
    * hold the ADMIN OPTION on `granted` (directly or through membership) —
    * PG's authorization rule for conferring membership
    * (xmb_set_admin_membership.test, xmb_edge_option_combos.test). */
  def grantRole(spark: SparkSession, granted: String, to: String,
      admin: Boolean = false): Unit = {
    require(exists(granted), s"role $granted does not exist")
    require(exists(to), s"role $to does not exist")
    currentRole(spark).foreach { issuer =>
      require(hasAdminOn(issuer, granted.toLowerCase),
        s"must have admin option on role $granted")
    }
    memberOf.updateWith(to.toLowerCase) { s =>
      val cur = s.getOrElse(Map.empty)
      // admin once granted is sticky under a plain re-grant (PG keeps it)
      Some(cur.updated(granted.toLowerCase,
        admin || cur.getOrElse(granted.toLowerCase, false)))
    }
  }

  def revokeRole(granted: String, from: String): Unit =
    memberOf.updateWith(from.toLowerCase)(_.map(_ - granted.toLowerCase))

  /** Whether `role` holds the ADMIN OPTION on `granted`: some role it is
    * a member of (membership closure — admin rides membership, not
    * inheritance) carries an admin edge to `granted`. */
  private def hasAdminOn(role: String, granted: String): Boolean =
    (membershipClosure(role) + role).exists(r =>
      memberOf.getOrElse(r, Map.empty).getOrElse(granted, false))

  /** root → role → write privileges held ("insert"/"update"/"delete").
    * Write enforcement hooks sit on the DML surface itself (the reference's
    * EnforceTablePrivilege hooks on insert/update/delete,
    * rbac/div_enforcement.test; MERGE requires the privilege matching each
    * WHEN action it performs, enf_merge_privilege.test). */
  private[search] val writeGrants = TrieMap.empty[String, Map[String, Set[String]]]

  def grantWrite(root: String, role: String, privs: Set[String]): Unit = {
    require(exists(role), s"role $role does not exist")
    require(privs.subsetOf(Set("insert", "update", "delete", "truncate")),
      s"unknown write privilege in $privs")
    writeGrants.updateWith(root) { m =>
      val cur = m.getOrElse(Map.empty)
      Some(cur.updated(role.toLowerCase,
        cur.getOrElse(role.toLowerCase, Set.empty) ++ privs))
    }
  }

  def revokeWrite(root: String, role: String, privs: Set[String]): Unit =
    writeGrants.updateWith(root)(_.map { m =>
      m.get(role.toLowerCase) match {
        case Some(held) =>
          val left = held -- privs
          if (left.isEmpty) m - role.toLowerCase
          else m.updated(role.toLowerCase, left)
        case None => m
      }
    })

  /** Enforce one write action against the session role; superuser (no
    * role) passes. Called from the DML entry points, not the planner —
    * writes are library verbs here, and hooking the verb is the analogue
    * of the reference enforcing before the physical insert/update/delete
    * operators run. */
  def checkWrite(spark: SparkSession, root: String, priv: String,
      tableLabel: String = ""): Unit =
    currentRole(spark).foreach { role =>
      val eff = effective(role)
      val ok = writeGrants.getOrElse(resolveKey(writeGrants.keys, root), Map.empty)
        .exists { case (g, privs) => eff.contains(g) && privs.contains(priv) }
      if (!ok) throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          (s"permission denied for table " +
            (if (tableLabel.nonEmpty) tableLabel else root.split("/").last) +
            s" (role $role lacks $priv)")))
    }

  /** The role set whose PRIVILEGES `role` effectively holds: itself, PUBLIC
    * (whose grants apply to everyone), and transitive memberships reached
    * through INHERIT roles only — a NOINHERIT role neither starts nor
    * relays automatic privilege use (PG pre-16 role-attribute semantics;
    * SET ROLE remains the explicit escape hatch). */
  private def effective(role: String): Set[String] = {
    val seen = scala.collection.mutable.Set(role)
    val queue = scala.collection.mutable.Queue.empty[String]
    if (inherits(role)) queue.enqueue(role)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      memberOf.getOrElse(r, Map.empty).keys.foreach { m =>
        if (seen.add(m) && inherits(m)) queue.enqueue(m)
      }
    }
    seen.toSet + Public
  }

  /** Pure MEMBERSHIP closure (ignores INHERIT): what `SET ROLE` may switch
    * to and what `pg_has_role(..., 'member')` reports. */
  private def membershipClosure(role: String): Set[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val queue = scala.collection.mutable.Queue(role)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      memberOf.getOrElse(r, Map.empty).keys.foreach { m =>
        if (seen.add(m)) queue.enqueue(m)
      }
    }
    seen.toSet
  }

  /** `pg_has_role(role, target, mode)` — mode `member`: target reachable
    * through membership regardless of INHERIT; mode `usage`: target's
    * privileges are usable without SET ROLE (inheritance path). A role
    * always has both on itself. */
  def hasRole(role: String, target: String, mode: String): Boolean = {
    val (r, t) = (role.toLowerCase, target.toLowerCase)
    require(exists(r), s"role $role does not exist")
    require(exists(t), s"role $target does not exist")
    mode.toLowerCase match {
      case "member" => r == t || membershipClosure(r).contains(t)
      case "usage" => r == t || effective(r).contains(t)
      case other => throw new IllegalArgumentException(
        s"pg_has_role: unknown privilege '$other' (member|usage)")
    }
  }

  /** Whether the session may `SET ROLE name`: superuser always; otherwise
    * the current role must be (a member of) the target (PG). */
  def maySetRole(spark: SparkSession, name: String): Boolean =
    currentRole(spark) match {
      case None => true
      case Some(r) =>
        val t = name.toLowerCase
        r == t || membershipClosure(r).contains(t)
    }

  /** Whether any access restriction exists at all — the zero-cost fast
    * path for sessions that never touch RBAC. */
  def active: Boolean = grants.nonEmpty || roles.nonEmpty

  def currentRole(spark: SparkSession): Option[String] =
    Option(spark.conf.get(RoleConf, "")).map(_.trim.toLowerCase).filter(_.nonEmpty)

  /** Check one scan root (and the column set the plan actually reads)
    * against the session's current role; throws the reference's
    * "permission denied" on failure. No current role = superuser =
    * allowed. A root with no grant row is deny-by-default for a set role.
    * Column grants allow the scan iff every read column is covered by the
    * union of the effective roles' column sets (a table-level grant
    * covers everything). */
  /** The grant key a scan path answers to: itself, or the longest granted
    * ancestor directory — an Iceberg table's per-file scan roots resolve
    * to the table dir the grant was issued on. */
  private def resolveKey(keys: Iterable[String], root: String): String =
    if (keys.exists(_ == root)) root
    else keys.filter(k => root.startsWith(k + "/"))
      .maxByOption(_.length).getOrElse(root)

  def check(spark: SparkSession, root: String, tableLabel: String,
      usedColumns: Set[String] = Set.empty): Unit =
    currentRole(spark).foreach { role =>
      val eff = effective(role)
      val held = grants.getOrElse(resolveKey(grants.keys, root), Map.empty)
        .collect { case (g, gr) if eff.contains(g) => gr }
      def deny(): Nothing = throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" -> (s"permission denied for table $tableLabel (role $role" +
          (if (usedColumns.nonEmpty) s"; columns ${usedColumns.toSeq.sorted.mkString(",")}"
           else "") + ")")))
      if (held.isEmpty) deny()
      if (!held.exists(_.columns.isEmpty)) {
        val allowedCols = held.flatMap(_.columns).flatten.toSet
        // PG: count(*) (no column read) passes with any column privilege
        if (!usedColumns.map(_.toLowerCase).subsetOf(allowedCols)) deny()
      }
    }

  /** Introspection rows for the pg_roles system view (name, inherit). */
  def roleRows: Seq[(String, Boolean)] = roles.toSeq.sortBy(_._1)

  /** Introspection rows for pg_auth_members (member, role, admin_option). */
  def membershipRows: Seq[(String, String, Boolean)] =
    memberOf.toSeq.flatMap { case (m, of) =>
      of.toSeq.map { case (r, admin) => (m, r, admin) }
    }.sorted

  /** Introspection rows for information_schema privilege views:
    * (scan root, grantee, granted columns or None=table, grant option). */
  def selectGrantRows: Seq[(String, String, Option[Set[String]], Boolean)] =
    grants.toSeq.flatMap { case (root, m) =>
      m.toSeq.map { case (role, g) => (root, role, g.columns, g.grantOption) }
    }.sortBy(r => (r._1, r._2))

  /** (scan root, grantee, write privilege) rows. */
  def writeGrantRows: Seq[(String, String, String)] =
    writeGrants.toSeq.flatMap { case (root, m) =>
      m.toSeq.flatMap { case (role, ps) => ps.toSeq.map(p => (root, role, p)) }
    }.sorted

  /** information_schema.enabled_roles: the session role plus its usable
    * (INHERIT-respecting) closure; empty when running as superuser. */
  def enabledRolesOf(spark: SparkSession): Seq[String] =
    currentRole(spark).toSeq
      .flatMap(r => effective(r) - Public).distinct.sorted

  /** Bumped on any role-graph mutation; system views key freshness off it.
    * Size-derived rather than a counter threaded through every mutator: a
    * revoke+grant pair that restores identical sizes can momentarily read
    * stale in pg_roles, which the corpus never observes (reads always
    * follow a size-changing mutation). */
  def stateVersion: Long =
    roles.size.toLong * 1000003L + memberOf.valuesIterator.map(_.size).sum * 4093L +
      grants.valuesIterator.map(_.size).sum * 31L +
      writeGrants.valuesIterator.map(_.size).sum * 7L

  /** Test hook. */
  private[graft] def reset(): Unit = {
    roles.clear(); memberOf.clear(); grants.clear(); writeGrants.clear()
  }
}
