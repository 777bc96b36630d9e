package graft.search

/** `ts_highlight(text, offsets[, options])` — the reference's POSTINGS
  * overload (tests/sqllogic/sdb/pg/index/headline.test): `offsets` is a
  * flat [start, end) character-offset list (the shape `ts_offsets`
  * produces) and `options` is the PG headline option string
  * (`StartSel=… , StopSel=… , MaxWords=n, MinWords=n, HighlightAll=bool`).
  * Semantics pinned by the ported goldens:
  *   - every token intersecting a hit range is wrapped in StartSel/StopSel;
  *   - HighlightAll (or a doc within MaxWords) renders the whole doc;
  *   - a longer doc renders a MaxWords word-window starting at the first
  *     hit (clamped so the window stays inside the doc);
  *   - no hits → PG's fallback: the first MaxWords tokens;
  *   - bad options fail loudly (non-numeric or zero MaxWords).
  * Pure per-row string work — a presentation function, evaluated row-side
  * exactly as the reference evaluates its scalar. */
object Headline {

  private case class Opts(startSel: String, stopSel: String,
      maxWords: Int, highlightAll: Boolean)

  private def parseOpts(s: String): Opts = {
    val kv = Option(s).getOrElse("").split(",").map(_.trim).filter(_.nonEmpty)
      .map { p =>
        val i = p.indexOf('=')
        require(i > 0, s"ts_highlight: bad option '$p'")
        p.substring(0, i).trim -> p.substring(i + 1).trim
      }.toMap
    def int(k: String, dflt: Int): Int = kv.get(k) match {
      case None => dflt
      case Some(v) =>
        val n = try v.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"ts_highlight: $k must be a positive integer, got '$v'")
        }
        require(n > 0, s"ts_highlight: $k must be a positive integer, got $n")
        n
    }
    Opts(kv.getOrElse("StartSel", "<b>"), kv.getOrElse("StopSel", "</b>"),
      int("MaxWords", 35),
      kv.get("HighlightAll").exists(_.equalsIgnoreCase("true")))
  }

  def render(text: String, offsets: Seq[Int], options: String): String = {
    if (text == null) return null
    val o = parseOpts(options)
    require(offsets == null || offsets.size % 2 == 0,
      "ts_highlight: offsets must be [start, end) pairs")
    val ranges = Option(offsets).getOrElse(Seq.empty)
      .grouped(2).map { case Seq(a, b) => (a, b) }.toSeq
    // tokens with their character spans
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    while (i < text.length) {
      if (!text.charAt(i).isWhitespace) {
        val start = i
        while (i < text.length && !text.charAt(i).isWhitespace) i += 1
        tokens += ((text.substring(start, i), start, i))
      } else i += 1
    }
    def hit(t: (String, Int, Int)): Boolean =
      ranges.exists { case (a, b) => a < t._3 && t._2 < b }
    val firstHit = tokens.indexWhere(hit)
    val window: Seq[(String, Int, Int)] =
      if (o.highlightAll || tokens.size <= o.maxWords) tokens.toSeq
      else if (firstHit < 0) tokens.take(o.maxWords).toSeq
      else {
        val start = math.min(firstHit, math.max(0, tokens.size - o.maxWords))
        tokens.slice(start, start + o.maxWords).toSeq
      }
    window.map(t => if (hit(t)) o.startSel + t._1 + o.stopSel else t._1)
      .mkString(" ")
  }
}
