package graft.search

/** Wire format for the reference's TSQUERY-constructor functions
  * (search.h:42-71: `ts_phrase`, `ts_like`, `ts_starts_with`,
  * `ts_levenshtein`, `ts_ngram`, `ts_between`, `ts_ge/gt/le/lt`,
  * `ts_any`/`ts_all`, `boost`, `slop`) — used with `@@` in the reference,
  * here as `ts_match(col, ts_like('s%m'), dict)`. Each constructor is a
  * plain deterministic String function returning a control-char-marked
  * encoding of the query leaf; `ts_match`/`tsquery_match` (row-eval) and
  * ClaimTsMatch (index claim) both decode through [[TsQueryCodec.decode]],
  * so the claimed and unclaimed paths share one algebra exactly like the
  * text syntaxes do. Text-bearing leaves (phrase/any/all) analyze at
  * DECODE time with the ts_match dict, mirroring the reference binding
  * the constructor to the indexed column's dictionary. */
object TsQueryCodec {
  val Mark = '\u0001'
  private val Sep = '\u0002'

  def isEncoded(s: String): Boolean = s != null && s.nonEmpty && s.charAt(0) == Mark

  def startsWith(p: String): String = s"${Mark}S$Sep$p"
  def like(p: String): String = s"${Mark}L$Sep$p"
  def regexp(r: String): String = s"${Mark}R$Sep$r"
  /** ts_levenshtein(text[, distance[, transpositions[, prefix]]]) —
    * reference arg surface (ts_levenshtein.cpp:34-76): distance omitted →
    * auto-ladder by term length (0 for ≤2 chars, 1 for 3-5, 2 for ≥6);
    * distance 0-4, 0-3 when transpositions (the default) are on. */
  def levenshtein(t: String, maxD: Int = -1, transpositions: Boolean = true,
      prefix: String = ""): String = {
    val d =
      if (maxD == -1) { val n = t.length; if (n <= 2) 0 else if (n <= 5) 1 else 2 }
      else maxD
    if (d < 0 || d > 4) throw new IllegalArgumentException(
      s"ts_levenshtein distance must be between 0 and 4, got $d")
    if (transpositions && d > 3) throw new IllegalArgumentException(
      s"ts_levenshtein distance must be between 0 and 3 when transpositions " +
        s"is true, got $d")
    s"${Mark}F$Sep$d$Sep${if (transpositions) 1 else 0}$Sep$prefix$Sep$t"
  }
  def ngram(q: String, minJ: Double): String = s"${Mark}N$Sep$minJ$Sep$q"
  def phrase(text: String): String = s"${Mark}P${Sep}0$Sep$text"
  def any(text: String): String = s"${Mark}A$Sep$text"
  def all(text: String): String = s"${Mark}E$Sep$text"
  def between(lo: String, hi: String): String = s"${Mark}B$Sep$lo$Sep$hi"
  def cmp(op: String, bound: String): String = s"${Mark}C$Sep$op$Sep$bound"
  /** Wraps any encoded (or plain-websearch) query — the inner rides last,
    * so nesting needs no escaping. */
  def boost(inner: String, w: Double): String = s"${Mark}W$Sep$w$Sep$inner"
  def slop(inner: String, n: Int): String = s"${Mark}Y$Sep$n$Sep$inner"

  /** TSQUERY combinators — the reference's `&&` / `||` / `!!` operators
    * (search.h:82-91), spelled `ts_and`/`ts_or`/`ts_not` here. Binary forms
    * length-prefix the first operand so two variable-length encoded inners
    * need no escaping. */
  def or(a: String, b: String): String = s"${Mark}O$Sep${a.length}$Sep$a$b"
  def and(a: String, b: String): String = s"${Mark}D$Sep${a.length}$Sep$a$b"
  def not(inner: String): String = s"${Mark}X$Sep$inner"

  /** Decode an encoded constructor string (see [[isEncoded]]). A plain
    * (un-marked) string decodes as the websearch dialect — so
    * `boost`/`slop` wrap either kind. */
  def decode(s: String, a: graft.analysis.Analyzer): TsQuery = {
    if (!isEncoded(s)) return TsQueryParser.websearch(s, a)
    val body = s.substring(1)
    val tag = body.charAt(0)
    def fields(n: Int): Array[String] = body.substring(2).split(Sep.toString, n)
    tag match {
      case 'S' => TsQuery.Prefix(fields(1)(0))
      case 'L' => TsQuery.Wildcard(fields(1)(0))
      case 'R' => TsQuery.Regexp(fields(1)(0))
      case 'F' =>
        val f = fields(4)
        if (f.length == 2) TsQuery.Fuzzy(f(1), f(0).toInt) // legacy 2-field form
        else TsQuery.Fuzzy(f(3), f(0).toInt, f(1) == "1", f(2))
      case 'N' => val f = fields(2); TsQuery.NgramSim(f(1), f(0).toDouble)
      case 'P' =>
        val f = fields(2)
        val ts = a.tokens(f(1))
        if (ts.size < 2 || f(0).toInt == 0) TsQuery.Phrase(ts)
        else TsQuery.SlopPhrase(ts, f(0).toInt)
      case 'A' => TsQuery.Or(a.tokens(fields(1)(0)).map(TsQuery.Term.apply))
      case 'E' => TsQuery.And(a.tokens(fields(1)(0)).map(TsQuery.Term.apply))
      case 'B' => val f = fields(2); TsQuery.TermRange(Some(f(0)), Some(f(1)), true, true)
      case 'C' => fields(2) match {
        case Array("ge", b) => TsQuery.TermRange(Some(b), None, true, false)
        case Array("gt", b) => TsQuery.TermRange(Some(b), None, false, false)
        case Array("le", b) => TsQuery.TermRange(None, Some(b), false, true)
        case Array("lt", b) => TsQuery.TermRange(None, Some(b), false, false)
        case other => throw new IllegalArgumentException(s"bad ts cmp: ${other.mkString}")
      }
      case 'W' => val f = fields(2); TsQuery.Boost(decode(f(1), a), f(0).toDouble)
      case 'O' =>
        val f = fields(2); val n = f(0).toInt
        TsQuery.Or(Seq(decode(f(1).substring(0, n), a), decode(f(1).substring(n), a)))
      case 'D' =>
        val f = fields(2); val n = f(0).toInt
        TsQuery.And(Seq(decode(f(1).substring(0, n), a), decode(f(1).substring(n), a)))
      case 'X' => TsQuery.Not(decode(body.substring(2), a))
      case 'Y' =>
        val f = fields(2)
        val n = f(0).toInt
        decode(f(1), a) match {
          case TsQuery.Phrase(ts) if ts.size >= 2 && n > 0 => TsQuery.SlopPhrase(ts, n)
          case TsQuery.SlopPhrase(ts, _) if n > 0 => TsQuery.SlopPhrase(ts, n)
          case inner => inner // slop 0 or single-term phrase: no-op
        }
      case other => throw new IllegalArgumentException(s"bad tsquery encoding tag: $other")
    }
  }
}
