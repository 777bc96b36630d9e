package graft.search

import scala.collection.mutable.ArrayBuffer

/** pg/DuckDB EXPRESSION spellings the reference's SQL surface accepts
  * inside otherwise-ordinary statements, rewritten to Spark SQL text
  * before parsing (reference surface: the vector corpus —
  * tests/sqllogic/sdb/pg/index/vector_*.test writes
  * `ORDER BY emb <-> [1, 2, 3]::FLOAT[3] LIMIT 1` — and DuckDB's bracket
  * list constructor, site_docs/sql/data_types/list):
  *
  *  - `[e1, e2, ...]` in expression position → `array(e1, e2, ...)`.
  *    A `[` directly after an identifier / `)` / `]` / string is a
  *    SUBSCRIPT and is left alone (`arr[0]`, `map['k']` keep Spark's
  *    meaning) — the same previous-token disambiguation DuckDB's lexer
  *    uses.
  *  - `::T[n]` / `::T[]` → `::ARRAY<T'>` (fixed-size hints drop; Spark
  *    arrays are unsized — the same collapse CatalogDdl applies to
  *    column types). Scalar `::T` casts pass through untouched: Spark 4
  *    parses `expr::type` natively.
  *  - the pgvector distance operators become the claimable distance
  *    functions: `a <-> b` → `ann_l2(a, b)`, `a <=> b` → `ann_cosine`,
  *    `a <#> b` → `ann_ip` — so `ORDER BY a <-> q LIMIT k` hits
  *    ClaimAnnTopK exactly like the spelled-out form. DEVIATION: Spark's
  *    own `<=>` (null-safe equality) is shadowed in SQL text — this
  *    dialect is pg-flavored, where that spelling is cosine distance and
  *    null-safe equality is `IS NOT DISTINCT FROM` (which Spark also
  *    parses).
  *
  * Everything is token-level and quote-aware: single-quoted strings
  * (with `''` escapes), double-quoted identifiers, line and block
  * comments pass through byte-identical, so a tsquery literal containing
  * `<->` adjacency is never touched.
  */
object PgDialect {

  /** Cheap trigger — rewriting tokenizes, so skip statements that cannot
    * contain any of the spellings. `[` alone is common in Spark SQL
    * (subscripts), but the tokenizer pass is only O(n) and subscripts
    * come out byte-identical. */
  private val castArrayRe = """::\s*\w+\s*\[""".r
  private val castStructRe = """(?i)::\s*struct\s*\(""".r

  private val atTimeZoneRe = """(?is)\bAT\s+TIME\s+ZONE\b""".r
  private val castTsRe =
    """(?is)::\s*(timestamptz?|text|int[248]|float[48]|bool|u(?:tiny|small|big)?int(?:eger)?)\b""".r
  private val rowLitRe = """(?i)\brow\s*\(""".r

  def needed(sql: String): Boolean = {
    (sql.indexOf('[') >= 0 &&
      (hasLiteralBracket(sql) || castArrayRe.findFirstIn(sql).isDefined)) ||
      castStructRe.findFirstIn(sql).isDefined ||
      atTimeZoneRe.findFirstIn(sql).isDefined ||
      castTsRe.findFirstIn(sql).isDefined ||
      sql.contains("->") || sql.contains("<=>") || sql.contains("<#>") ||
      sql.contains("<+>") ||
      sql.contains(":=") || rowLitRe.findFirstIn(sql).isDefined ||
      srfAliasRe.findFirstIn(sql).isDefined
  }

  /** A FROM/JOIN-position generate_series with a possible bare alias —
    * cheap gate for [[rewriteSrfAlias]]. */
  private val srfAliasRe = """(?i)\b(from|join)\s+generate_series\s*\(""".r

  def rewrite(sql: String): String = {
    if (!needed(sql)) return sql
    val toks = lex(sql)
    val afterCasts = rewriteCastTypes(toks)
    val afterLists = rewriteBracketLists(afterCasts)
    val afterTz = rewriteAtTimeZone(afterLists)
    val afterOps = rewriteDistanceOps(afterTz)
    val afterJson = rewriteJsonArrows(afterOps)
    val afterNamed = rewriteUnionValueArgs(afterJson)
    val afterRow = rewriteRowLiterals(afterNamed)
    val afterSrf = rewriteSrfAlias(afterRow)
    afterSrf.map(_.text).mkString
  }

  /** pg scalar-SRF alias semantics (ivf_pq.test filler INSERTs): in
    * `FROM generate_series(...) g` the bare alias names the single output
    * COLUMN too — Spark's table alias would leave the column named
    * `generate_series`, so the alias re-renders as `AS g(g)`. An explicit
    * column list (`AS t(i)`) passes through untouched, and only FROM/JOIN
    * position rewrites (a scalar call keeps its shape). */
  private val srfStopKw = Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
    "UNION", "EXCEPT", "INTERSECT", "ON", "JOIN", "INNER", "LEFT", "RIGHT",
    "FULL", "CROSS", "NATURAL", "USING", "QUALIFY", "WINDOW", "OFFSET",
    "FETCH", "RETURNING", "SELECT", "VALUES", "SET")
  // keywords that end a FROM-list context (for the COMMA trigger below):
  // a comma in SELECT/GROUP BY/ORDER BY position must NOT count as
  // lateral-join position — `SELECT a, generate_series(1,3) g FROM t` was
  // being rewritten to `g(g)`, an analysis error (r18 ADVICE #2)
  private val fromClearKw = Set("SELECT", "WHERE", "GROUP", "ORDER",
    "HAVING", "LIMIT", "UNION", "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY",
    "OFFSET", "FETCH", "RETURNING", "SET", "VALUES")
  private def rewriteSrfAlias(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    var prevMeaning: Option[Tok] = None
    // paren-scoped "inside a FROM list" state: each LPAREN opens a fresh
    // expression/subquery context (false), FROM/JOIN flips the current
    // level on, clause keywords flip it off
    var inFrom = List(false)
    while (i < toks.length) {
      val t = toks(i)
      t.kind match {
        case LPAREN => inFrom = false :: inFrom
        case RPAREN => if (inFrom.tail.nonEmpty) inFrom = inFrom.tail
        case IDENT if Set("FROM", "JOIN").contains(t.text.toUpperCase) =>
          inFrom = true :: inFrom.tail
        case IDENT if fromClearKw.contains(t.text.toUpperCase) =>
          inFrom = false :: inFrom.tail
        case _ => ()
      }
      if (t.kind == IDENT && t.text.equalsIgnoreCase("generate_series") &&
          prevMeaning.exists(p => (p.kind == COMMA && inFrom.head) ||
            (p.kind == IDENT &&
            Set("FROM", "JOIN").contains(p.text.toUpperCase)))) {
        val lp = skipWsF(toks, i + 1)
        if (lp < toks.length && toks(lp).kind == LPAREN) {
          var depth = 0; var j = lp; var end = -1
          while (j < toks.length && end < 0) {
            toks(j).kind match {
              case LPAREN => depth += 1
              case RPAREN => depth -= 1; if (depth == 0) end = j
              case _ => ()
            }
            j += 1
          }
          if (end > 0) {
            var a = skipWsF(toks, end + 1)
            if (a < toks.length && toks(a).kind == IDENT &&
                toks(a).text.equalsIgnoreCase("as"))
              a = skipWsF(toks, a + 1)
            if (a < toks.length && toks(a).kind == IDENT &&
                !srfStopKw.contains(toks(a).text.toUpperCase)) {
              val hasColList = {
                val nxt = skipWsF(toks, a + 1)
                nxt < toks.length && toks(nxt).kind == LPAREN
              }
              if (!hasColList) {
                val alias = toks(a).text
                toks = toks.patch(a, Seq(Tok(IDENT, alias), Tok(LPAREN, "("),
                  Tok(IDENT, alias), Tok(RPAREN, ")")), 1)
              }
            }
          }
        }
      }
      prevMeaning = t.kind match { case WS | COMMENT => prevMeaning; case _ => Some(t) }
      i += 1
    }
    toks
  }

  /** DuckDB/pg `ROW(a, b, ...)` anonymous-struct literals → Spark
    * `struct(a, b, ...)` (simple/unsigned_int.test). Only the call form
    * rewrites (IDENT `row` immediately before `(`); the ROWS/ROW keywords
    * of window frames are not followed by a paren. */
  private def rewriteRowLiterals(toks: Vector[Tok]): Vector[Tok] =
    toks.zipWithIndex.map { case (t, i) =>
      if (t.kind == IDENT && t.text.equalsIgnoreCase("row") && {
        val n = skipWsF(toks, i + 1); n < toks.length && toks(n).kind == LPAREN
      }) Tok(IDENT, "struct")
      else t
    }

  /** DuckDB named-argument spelling inside union_value calls
    * (simple/union.test): `union_value(num := 1)` →
    * `union_value('num', 1)`. Scoped to union_value parens only — `:=`
    * elsewhere passes through untouched. */
  private def rewriteUnionValueArgs(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == IDENT && t.text.equalsIgnoreCase("union_value")) {
        val open = skipWsF(toks, i + 1)
        if (open < toks.length && toks(open).kind == LPAREN) {
          val close = matchF(toks, open)
          var j = open + 1
          while (j < close) {
            if (toks(j).kind == OP && toks(j).text == ":=") {
              val nm = skipWsB(toks, j - 1)
              if (nm >= 0 && toks(nm).kind == IDENT) {
                toks = toks.patch(nm, Seq(Tok(STR, s"'${toks(nm).text}'")), 1)
                  .patch(j, Seq(Tok(COMMA, ", ")), 1)
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }
    toks
  }

  // ---- lexer ---------------------------------------------------------------

  sealed trait Kind
  case object WS extends Kind
  case object STR extends Kind      // '...' (with '' escapes)
  case object QIDENT extends Kind   // "..."
  case object COMMENT extends Kind  // -- ... or /* ... */
  case object NUM extends Kind
  case object IDENT extends Kind
  case object LPAREN extends Kind
  case object RPAREN extends Kind
  case object LBRACK extends Kind
  case object RBRACK extends Kind
  case object COMMA extends Kind
  case object DCOLON extends Kind   // ::
  case object DIST extends Kind     // <-> <=> <#> <+>
  case object OP extends Kind       // everything else operator-ish
  final case class Tok(kind: Kind, text: String)

  private val multiOps = Seq("<->", "<=>", "<#>", "<+>", "::", ":=", "||", "<=", ">=",
    "<>", "!=", "->>", "->", "**", "//")

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        val j = { var k = i; while (k < n && s.charAt(k).isWhitespace) k += 1; k }
        out += Tok(WS, s.substring(i, j)); i = j
      } else if (c == '\'') {
        var j = i + 1
        var closed = false
        while (!closed && j < n) {
          if (s.charAt(j) == '\'') {
            if (j + 1 < n && s.charAt(j + 1) == '\'') j += 2
            else { closed = true; j += 1 }
          } else j += 1
        }
        out += Tok(STR, s.substring(i, j)); i = j
      } else if (c == '"') {
        var j = i + 1
        while (j < n && s.charAt(j) != '"') j += 1
        if (j < n) j += 1
        out += Tok(QIDENT, s.substring(i, j)); i = j
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        var j = i
        while (j < n && s.charAt(j) != '\n') j += 1
        out += Tok(COMMENT, s.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        var j = i + 2
        while (j + 1 < n && !(s.charAt(j) == '*' && s.charAt(j + 1) == '/')) j += 1
        j = math.min(n, j + 2)
        out += Tok(COMMENT, s.substring(i, j)); i = j
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        var j = i
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        // exponent
        if (j < n && (s.charAt(j) == 'e' || s.charAt(j) == 'E') && {
          val k = if (j + 1 < n && (s.charAt(j + 1) == '+' || s.charAt(j + 1) == '-')) j + 2 else j + 1
          k < n && s.charAt(k).isDigit
        }) {
          j += 1
          if (s.charAt(j) == '+' || s.charAt(j) == '-') j += 1
          while (j < n && s.charAt(j).isDigit) j += 1
        }
        out += Tok(NUM, s.substring(i, j)); i = j
      } else if (c.isLetter || c == '_' || c == '$') {
        var j = i
        while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' || s.charAt(j) == '$')) j += 1
        out += Tok(IDENT, s.substring(i, j)); i = j
      } else multiOps.find(op => s.startsWith(op, i)) match {
        case Some(op) =>
          val kind = op match {
            case "<->" | "<=>" | "<#>" | "<+>" => DIST
            case "::" => DCOLON
            case _ => OP
          }
          out += Tok(kind, op); i += op.length
        case None =>
          val kind = c match {
            case '(' => LPAREN
            case ')' => RPAREN
            case '[' => LBRACK
            case ']' => RBRACK
            case ',' => COMMA
            case _ => OP
          }
          out += Tok(kind, c.toString); i += 1
      }
    }
    out.result()
  }

  /** Pre-tokenizer peek used by [[needed]]: is there any `[` in literal
    * position outside quotes/comments? Mirrors the token rule cheaply. */
  private def hasLiteralBracket(sql: String): Boolean =
    lex(sql).foldLeft((false, Option.empty[Tok])) {
      case ((found, prev), t) =>
        val f = found || (t.kind == LBRACK && isLiteralContext(prev))
        val p = t.kind match { case WS | COMMENT => prev; case _ => Some(t) }
        (f, p)
    }._1

  /** SQL keywords an expression can directly follow — a `[` after one of
    * these is a list literal, not a subscript of the keyword. */
  private val exprKeywords = Set(
    "SELECT", "WHERE", "VALUES", "AND", "OR", "NOT", "WHEN", "THEN", "ELSE",
    "BY", "ON", "IN", "HAVING", "RETURNING", "SET", "DISTINCT", "ALL",
    "CASE", "END", "BETWEEN", "LIKE", "ILIKE", "IS", "UNION", "EXCEPT",
    "INTERSECT", "OVER", "PARTITION", "ROW", "ARRAY_CONTAINS", "COALESCE")

  /** `[` after one of these starts a list literal; after an identifier /
    * closing bracket / string it's a subscript. */
  private def isLiteralContext(prev: Option[Tok]): Boolean = prev match {
    case None => true
    case Some(t) => t.kind match {
      case IDENT if exprKeywords.contains(t.text.toUpperCase) => true
      case IDENT | QIDENT | RPAREN | RBRACK | STR | NUM => false
      case _ => true
    }
  }

  // ---- pass 1: ::T[n] → ::ARRAY<T> ------------------------------------------

  private def mapScalar(t: String): String = t.toUpperCase match {
    case "INT" | "INTEGER" | "INT4" => "INT"
    case "BIGINT" | "INT8" => "BIGINT"
    case "SMALLINT" | "INT2" => "SMALLINT"
    case "FLOAT" | "FLOAT4" | "REAL" => "FLOAT"
    case "DOUBLE" | "FLOAT8" => "DOUBLE"
    case "VARCHAR" | "TEXT" => "STRING"
    case "BOOLEAN" | "BOOL" => "BOOLEAN"
    case "TIMESTAMP" => "TIMESTAMP_NTZ" // pg TIMESTAMP is naive
    case "TIMESTAMPTZ" => "TIMESTAMP"   // Spark TIMESTAMP is an instant
    case "UTINYINT" => "SMALLINT"       // unsigned → next-wider signed
    case "USMALLINT" => "INT"
    case "UINTEGER" | "UINT" => "BIGINT"
    case "UBIGINT" => "DECIMAL(20,0)"
    case other => other
  }

  /** Scalar-cast mapping for `::T` where pg's spelling differs from
    * Spark's — null when the name needs no rewrite (left untouched, so
    * arbitrary Spark types keep working). */
  private def mapScalarCast(t: String): String = t.toUpperCase match {
    case "TEXT" => "STRING"
    case "INT4" => "INT"
    case "INT8" => "BIGINT"
    case "INT2" => "SMALLINT"
    case "FLOAT4" => "FLOAT"
    case "FLOAT8" => "DOUBLE"
    case "BOOL" => "BOOLEAN"
    case "TIMESTAMP" => "TIMESTAMP_NTZ"
    case "TIMESTAMPTZ" => "TIMESTAMP"
    // unsigned ints map to the next-wider SIGNED type (SURVEY §1.2; Spark
    // has no unsigned family) — UBIGINT needs DECIMAL(20,0) for its top half
    case "UTINYINT" => "SMALLINT"
    case "USMALLINT" => "INT"
    case "UINTEGER" | "UINT" => "BIGINT"
    case "UBIGINT" => "DECIMAL(20,0)"
    case _ => null
  }

  private def rewriteCastTypes(toks: Vector[Tok]): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    def peekAt(from: Int): Int = { // next non-ws/comment index, or -1
      var k = from
      while (k < toks.length && (toks(k).kind == WS || toks(k).kind == COMMENT)) k += 1
      if (k < toks.length) k else -1
    }
    /** Parse a pg type spelling at token index `k0`: a scalar name or
      * `struct(name type, ...)`, followed by zero or more `[n]` groups
      * (multi-dim nests ARRAY<>; size hints drop). Returns the Spark DDL
      * text, the index after the type, and whether the type is compound
      * (has brackets or struct) — scalar casts stay untouched. */
    def parseTypeAt(k0: Int): Option[(String, Int, Boolean)] = {
      if (k0 < 0 || k0 >= toks.length) return None
      var base: String = null
      var compound = false
      var k = k0
      if (toks(k).kind == IDENT && toks(k).text.equalsIgnoreCase("struct") && {
        val p = peekAt(k + 1); p >= 0 && toks(p).kind == LPAREN
      }) {
        val p = peekAt(k + 1)
        var fields = Vector.empty[String]
        var j = peekAt(p + 1)
        var bad = false; var done = false
        while (!done && !bad) {
          if (j >= 0 && toks(j).kind == RPAREN) done = true
          else if (j >= 0 && (toks(j).kind == IDENT || toks(j).kind == QIDENT)) {
            val fname = toks(j).text.stripPrefix("\"").stripSuffix("\"")
            parseTypeAt(peekAt(j + 1)) match {
              case Some((fddl, after, _)) =>
                fields :+= s"$fname: $fddl"
                val c = peekAt(after)
                if (c >= 0 && toks(c).kind == COMMA) j = peekAt(c + 1)
                else if (c >= 0 && toks(c).kind == RPAREN) { j = c; done = true }
                else bad = true
              case None => bad = true
            }
          } else bad = true
        }
        if (bad) return None
        base = fields.mkString("STRUCT<", ", ", ">")
        compound = true
        k = j + 1
      } else if (toks(k).kind == IDENT) {
        base = mapScalar(toks(k).text)
        k = k + 1
      } else return None
      var go = true
      while (go) {
        val b = peekAt(k)
        if (b >= 0 && toks(b).kind == LBRACK) {
          val si = peekAt(b + 1)
          val ci = if (si >= 0 && toks(si).kind == NUM) peekAt(si + 1) else si
          if (ci >= 0 && toks(ci).kind == RBRACK) {
            base = s"ARRAY<$base>"; compound = true; k = ci + 1
          } else go = false
        } else go = false
      }
      Some((base, k, compound))
    }
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == DCOLON && {
        val ti = peekAt(i + 1)
        ti >= 0 && toks(ti).kind == IDENT &&
          mapScalarCast(toks(ti).text) != null && {
            val bi = peekAt(ti + 1); !(bi >= 0 && toks(bi).kind == LBRACK)
          }
      }) {
        // pg scalar names Spark lacks: TEXT→STRING, INT4→INT, …; and the
        // timestamp mapping (naive TIMESTAMP is Spark TIMESTAMP_NTZ,
        // TIMESTAMPTZ is Spark TIMESTAMP, an instant)
        val ti = peekAt(i + 1)
        out += Tok(DCOLON, "::")
        out += Tok(IDENT, mapScalarCast(toks(ti).text))
        i = ti + 1
      } else if (t.kind == DCOLON) {
        parseTypeAt(peekAt(i + 1)) match {
          case Some((ddl, after, true)) =>
            // a STRING-LITERAL operand parses through from_pg_text (both
            // pg `{...}` and duck `[...]` text); everything else keeps the
            // plain Spark cast to the translated type
            var last = out.length - 1
            while (last >= 0 && (out(last).kind == WS || out(last).kind == COMMENT))
              last -= 1
            if (last >= 0 && out(last).kind == STR) {
              val lit = out(last)
              out.remove(last, out.length - last)
              out += Tok(IDENT, "from_pg_text")
              out += Tok(LPAREN, "(")
              out += lit
              out += Tok(COMMA, ", ")
              out += Tok(STR, "'" + ddl.replace("'", "''") + "'")
              out += Tok(RPAREN, ")")
            } else {
              out += Tok(DCOLON, "::")
              out += Tok(IDENT, ddl)
            }
            i = after
          case _ => out += t; i += 1
        }
      } else { out += t; i += 1 }
    }
    out.toVector
  }

  // ---- pass 2: bracket lists → array(...) ------------------------------------

  private def rewriteBracketLists(toks: Vector[Tok]): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var prev: Option[Tok] = None
    val stack = ArrayBuffer.empty[Boolean] // true = literal bracket
    toks.foreach { t =>
      t.kind match {
        case LBRACK if prev.exists(p =>
            p.kind == IDENT && p.text.equalsIgnoreCase("array")) =>
          // pg's explicit ARRAY[...] constructor (ivf_pq.test filler
          // INSERTs): the keyword itself becomes the array( call — drop the
          // ARRAY ident already emitted, keep any whitespace after it
          val idx = out.lastIndexWhere(t0 =>
            t0.kind == IDENT && t0.text.equalsIgnoreCase("array"))
          out.remove(idx)
          stack += true
          out += Tok(IDENT, "array"); out += Tok(LPAREN, "(")
        case LBRACK if isLiteralContext(prev) =>
          stack += true
          out += Tok(IDENT, "array"); out += Tok(LPAREN, "(")
        case LBRACK =>
          stack += false; out += t
        case RBRACK if stack.nonEmpty && stack.last =>
          stack.remove(stack.length - 1); out += Tok(RPAREN, ")")
        case RBRACK =>
          if (stack.nonEmpty) stack.remove(stack.length - 1)
          out += t
        case _ => out += t
      }
      prev = t.kind match { case WS | COMMENT => prev; case _ => Some(t) }
    }
    out.toVector
  }

  // ---- pass: AT TIME ZONE → at_time_zone(expr, zone) --------------------------

  /** `<operand> AT TIME ZONE <operand>` → `at_time_zone(l, r)` — the pg
    * keyword form; direction (naive→instant vs instant→naive) resolves by
    * operand type inside [[graft.functions.AtTimeZone]]. */
  private def rewriteAtTimeZone(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    def findKeyword(): Int = toks.indices.find { k =>
      toks(k).kind == IDENT && toks(k).text.equalsIgnoreCase("at") && {
        val t1 = skipWsF(toks, k + 1)
        t1 < toks.length && toks(t1).kind == IDENT &&
          toks(t1).text.equalsIgnoreCase("time") && {
            val t2 = skipWsF(toks, t1 + 1)
            t2 < toks.length && toks(t2).kind == IDENT &&
              toks(t2).text.equalsIgnoreCase("zone")
          }
      }
    }.getOrElse(-1)
    var at = findKeyword()
    var guard = 0
    while (at >= 0 && guard < 64) {
      val t1 = skipWsF(toks, at + 1)
      val t2 = skipWsF(toks, t1 + 1)
      val lStart = operandStart(toks, at - 1)
      val rEnd = operandEnd(toks, t2 + 1)
      val left = toks.slice(lStart, skipWsB(toks, at - 1) + 1)
      val right = toks.slice(skipWsF(toks, t2 + 1), rEnd)
      if (left.isEmpty || right.isEmpty) return toks // malformed; let Spark error
      val call = Vector(Tok(IDENT, "at_time_zone"), Tok(LPAREN, "(")) ++ left ++
        Vector(Tok(COMMA, ", ")) ++ right :+ Tok(RPAREN, ")")
      toks = toks.take(lStart) ++ call ++ toks.drop(rEnd)
      at = findKeyword()
      guard += 1
    }
    toks
  }

  // ---- pass 3: distance operators → function calls ----------------------------

  private def distFn(op: String): String = op match {
    case "<->" => "ann_l2"
    case "<=>" => "ann_cosine"
    case "<+>" => "ann_l1" // pgvector Manhattan (ivf_panorama.test l1 leg)
    case _ => "ann_ip"
  }

  private def rewriteDistanceOps(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var idx = toks.indexWhere(_.kind == DIST)
    var guard = 0
    while (idx >= 0 && guard < 64) {
      toks = rewriteOneDist(toks, idx)
      idx = toks.indexWhere(_.kind == DIST)
      guard += 1
    }
    toks
  }

  private def skipWsF(toks: Vector[Tok], from: Int): Int = {
    var k = from
    while (k < toks.length && (toks(k).kind == WS || toks(k).kind == COMMENT)) k += 1
    k
  }
  private def skipWsB(toks: Vector[Tok], from: Int): Int = {
    var k = from
    while (k >= 0 && (toks(k).kind == WS || toks(k).kind == COMMENT)) k -= 1
    k
  }

  /** End index (exclusive) of the operand starting at `start`. */
  private def operandEnd(toks: Vector[Tok], start: Int): Int = {
    var i = skipWsF(toks, start)
    if (i >= toks.length) return i
    // primary
    toks(i).kind match {
      case IDENT | QIDENT =>
        i += 1
        // dotted name
        var go = true
        while (go) {
          val d = skipWsF(toks, i)
          if (d < toks.length && toks(d).kind == OP && toks(d).text == "." ) {
            val nm = skipWsF(toks, d + 1)
            if (nm < toks.length && (toks(nm).kind == IDENT || toks(nm).kind == QIDENT)) i = nm + 1
            else go = false
          } else go = false
        }
        // call parens
        val p = skipWsF(toks, i)
        if (p < toks.length && toks(p).kind == LPAREN) i = matchF(toks, p) + 1
      case NUM | STR => i += 1
      case LPAREN => i = matchF(toks, i) + 1
      case OP if toks(i).text == "-" || toks(i).text == "+" =>
        return operandEnd(toks, i + 1)
      case _ => return i // give up: leave text as-is downstream
    }
    // postfix chain
    var go = true
    while (go) {
      val k = skipWsF(toks, i)
      if (k < toks.length) toks(k).kind match {
        case DCOLON =>
          val tn = skipWsF(toks, k + 1)
          if (tn < toks.length && toks(tn).kind == IDENT) i = tn + 1 else go = false
        case LBRACK => i = matchF(toks, k) + 1
        case _ => go = false
      } else go = false
    }
    i
  }

  /** Start index of the operand ending at `end` (inclusive scan backwards). */
  private def operandStart(toks: Vector[Tok], end: Int): Int = {
    var i = skipWsB(toks, end)
    if (i < 0) return 0
    def primaryBack(j0: Int): Int = {
      var j = j0
      toks(j).kind match {
        case RPAREN | RBRACK =>
          j = matchB(toks, j)
          // call? identifier before the open paren
          val nm = skipWsB(toks, j - 1)
          if (nm >= 0 && (toks(nm).kind == IDENT || toks(nm).kind == QIDENT)) nm
          else j
        case IDENT | QIDENT | NUM | STR => j
        case _ => j
      }
    }
    var start = primaryBack(i)
    // leading chains: `a.b`, `x::T` — the token before start
    var go = true
    while (go) {
      val d = skipWsB(toks, start - 1)
      if (d >= 0 && (toks(d).kind == DCOLON ||
          (toks(d).kind == OP && toks(d).text == "."))) {
        val p = skipWsB(toks, d - 1)
        if (p >= 0) { start = primaryBack(p); }
        else go = false
      } else go = false
    }
    start
  }

  private def matchF(toks: Vector[Tok], open: Int): Int = {
    var depth = 0; var i = open
    while (i < toks.length) {
      toks(i).kind match {
        case LPAREN | LBRACK => depth += 1
        case RPAREN | RBRACK =>
          depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    toks.length - 1
  }
  private def matchB(toks: Vector[Tok], close: Int): Int = {
    var depth = 0; var i = close
    while (i >= 0) {
      toks(i).kind match {
        case RPAREN | RBRACK => depth += 1
        case LPAREN | LBRACK =>
          depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i -= 1
    }
    0
  }

  /** The `<=>` spelling is pg-flavored cosine distance here, but it is ALSO
    * Spark's null-safe equality — a global rewrite would silently change
    * ported Spark SQL. The session flag opts back into Spark's meaning
    * (`SET spark.graft.pgDialectCosineEq=false`); `<->`/`<#>` have no Spark
    * meaning and always rewrite. */
  /** pg JSON extraction operators (reference inverted_index_json.test,
    * site_docs json_indexing.md):
    *   `expr ->> 'k'` → `get_json_object(expr, '$.k')` — text extraction;
    *   `expr ->  'k'` → the same call. DEVIATION: pg's `->` returns JSON
    *     (a string leaf keeps its quotes); get_json_object unquotes string
    *     leaves. Chaining into objects/arrays — what `->` exists for — is
    *     identical, and `->>` (the leaf-text form) is exact.
    * Only a STRING right operand rewrites: `-> <non-string>` stays Spark
    * syntax untouched because `->` is ALSO Spark's lambda arrow
    * (`transform(a, x -> x + 1)`). A lambda whose body is a bare string
    * literal (`transform(a, x -> 'tag')`) would still collide, so `->` is
    * additionally skipped when its left side has lambda-parameter SHAPE in
    * lambda-parameter POSITION: a bare identifier (or parenthesized
    * identifier list) standing as a direct argument of one of Spark's
    * higher-order builtins — the only place the lambda grammar is legal.
    * `->>` has no Spark meaning and needs no such gate. The whole pass is
    * also gated by `spark.graft.pgDialectJsonArrow` (default on) like the
    * `<=>` rewrite.
    * Leftmost-first with a rescan so chains nest:
    * `c->'a'->>'b'` → `get_json_object(get_json_object(c,'$.a'),'$.b')`. */
  private def jsonArrowEnabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.pgDialectJsonArrow", "true") != "false"
    catch { case _: Exception => true }

  private def rewriteJsonArrows(toks0: Vector[Tok]): Vector[Tok] = {
    if (!jsonArrowEnabled) return toks0
    var toks = toks0
    var from = 0
    var guard = 0
    while (guard < 256) {
      guard += 1
      val idx = toks.indexWhere(
        t => t.kind == OP && (t.text == "->" || t.text == "->>"), from)
      if (idx < 0) return toks
      val r = skipWsF(toks, idx + 1)
      val lStart = operandStart(toks, idx - 1)
      val left = toks.slice(lStart, skipWsB(toks, idx - 1) + 1)
      // `->>` also accepts an INTEGER subscript (`content->'tags'->>0` —
      // array element as text); safe because Spark has no `->>` at all,
      // while `-> <num>` stays untouched (it parses as a lambda body)
      val numSubscript = r < toks.length && toks(r).kind == NUM &&
        toks(idx).text == "->>" && toks(r).text.matches("\\d+")
      val lambdaHazard = toks(idx).text == "->" &&
        looksLikeLambdaParam(toks, lStart, left)
      if (r < toks.length && (toks(r).kind == STR || numSubscript) &&
          left.nonEmpty && !lambdaHazard) {
        val pathLit = if (numSubscript) "'$[" + toks(r).text + "]'" else {
          val raw = toks(r).text
          val key = raw.substring(1, raw.length - 1).replace("''", "'")
          if (key.matches("[A-Za-z0-9_]+")) "'$." + key + "'"
          // bracket path for keys with punctuation; embedded quotes double
          // twice (once for the path grammar, once for the SQL literal)
          else "'$[''" + key.replace("'", "''''") + "'']'"
        }
        val call = Vector(Tok(IDENT, "get_json_object"), Tok(LPAREN, "(")) ++
          left ++ Vector(Tok(COMMA, ", "), Tok(STR, pathLit), Tok(RPAREN, ")"))
        toks = toks.take(lStart) ++ call ++ toks.drop(r + 1)
        from = 0 // rescan: the call we just built may be the next op's operand
      } else from = idx + 1
    }
    toks
  }

  /** Spark's complete higher-order-builtin surface — lambdas are ONLY legal
    * as direct arguments of these (there are no user-defined HOFs in Spark
    * SQL), so the whitelist fully decides the `->` ambiguity. */
  private val hofNames = Set("transform", "filter", "exists", "forall",
    "aggregate", "reduce", "zip_with", "map_filter", "transform_keys",
    "transform_values", "array_sort", "map_zip_with")

  /** Whether the `->` at hand reads as a lambda: left side is a bare
    * identifier or a parenthesized identifier list, AND it stands as a
    * direct argument (first, or after a top-level comma) of a call whose
    * callee is a higher-order builtin. `length(c -> 'k')` and
    * `WHERE c -> 'k'` both fail the callee test and still rewrite.
    * "Direct argument" is enforced literally: the token immediately before
    * the operand (ws-skipped) must be the argument list's LPAREN or an
    * argument-separating COMMA — `exists` and `filter` are ALSO SQL
    * keywords, so without this a bare identifier deep inside
    * `WHERE EXISTS (SELECT ... c -> 'k')` or `agg FILTER (WHERE c -> 'k')`
    * would wrongly read as a lambda and skip the JSON rewrite. */
  private def looksLikeLambdaParam(toks: Vector[Tok], lStart: Int,
      left: Vector[Tok]): Boolean = {
    val meat = left.filter(t => t.kind != WS && t.kind != COMMENT)
    val bareIdent = meat.length == 1 && meat.head.kind == IDENT
    val parenIdents = meat.length >= 3 &&
      meat.head.kind == LPAREN && meat.last.kind == RPAREN &&
      meat.drop(1).dropRight(1).forall(t => t.kind == IDENT || t.kind == COMMA)
    if (!bareIdent && !parenIdents) return false
    // direct-argument gate: nothing but the opening paren or a separating
    // comma may precede the operand
    val prev = skipWsB(toks, lStart - 1)
    if (prev < 0 ||
        (toks(prev).kind != LPAREN && toks(prev).kind != COMMA)) return false
    // walk back to the LPAREN that opens the argument list this operand
    // sits in (skipping over any complete sibling-argument groups)
    var i = prev
    var depth = 0
    while (i >= 0) {
      toks(i).kind match {
        case RPAREN | RBRACK => depth += 1
        case LPAREN | LBRACK if depth > 0 => depth -= 1
        case LPAREN =>
          val callee = skipWsB(toks, i - 1)
          return callee >= 0 && toks(callee).kind == IDENT &&
            hofNames.contains(toks(callee).text.toLowerCase(java.util.Locale.ROOT))
        case _ => ()
      }
      i -= 1
    }
    false
  }

  private def cosineEqEnabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.pgDialectCosineEq", "true") != "false"
    catch { case _: Exception => true }

  private def rewriteOneDist(toks: Vector[Tok], opIdx: Int): Vector[Tok] = {
    if (toks(opIdx).text == "<=>" && !cosineEqEnabled)
      return toks.updated(opIdx, Tok(OP, "<=>"))
    val fn = distFn(toks(opIdx).text)
    val lStart = operandStart(toks, opIdx - 1)
    val rEnd = operandEnd(toks, opIdx + 1)
    val left = toks.slice(lStart, skipWsB(toks, opIdx - 1) + 1)
    val right = toks.slice(skipWsF(toks, opIdx + 1), rEnd)
    if (left.isEmpty || right.isEmpty)
      // cannot parse — demote the token so the loop terminates; Spark will
      // report the original syntax error
      return toks.updated(opIdx, Tok(OP, toks(opIdx).text))
    // `<->` is pgvector's EUCLIDEAN distance; ann_l2 scores in squared-L2
    // units (monotone for ORDER BY, wrong for `<-> < r` radii and value
    // projection), so the rewrite wraps the sqrt — the claim rules see
    // through it (AnnShapes.annUdf / ClaimAnnRange square the threshold)
    val inner = Vector(Tok(IDENT, fn), Tok(LPAREN, "(")) ++ left ++
      Vector(Tok(COMMA, ", ")) ++ right :+ Tok(RPAREN, ")")
    val call =
      if (fn == "ann_l2")
        Vector(Tok(IDENT, "sqrt"), Tok(LPAREN, "(")) ++ inner :+ Tok(RPAREN, ")")
      else inner
    toks.take(lStart) ++ call ++ toks.drop(rEnd)
  }
}
