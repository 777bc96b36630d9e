package graft.analysis

import java.text.Normalizer
import java.util.Locale
import scala.util.hashing.MurmurHash3

/** Token-stream analyzer — the Spark-side counterpart of the reference's
  * analyzer registry (/root/reference/server/pg/tokenizer_options.h:419-444,
  * impls under /root/reference/libs/iresearch/include/iresearch/analysis/).
  *
  * Analyzers are pure, serializable `String => Seq[String]` functions so they
  * can run inside codegen'd Spark UDFs at both index-build and query time.
  * Positions are implicit: token i of the output sits at position i (matching
  * the `position` field feature of the reference's inverted index).
  */
trait Analyzer extends Serializable {
  def apply(text: String): Seq[String]
  final def tokens(text: String): Seq[String] =
    if (text == null) Seq.empty else apply(text)
}

/** Whole input as a single term (`keyword`, irs::StringTokenizer). */
case object KeywordAnalyzer extends Analyzer {
  def apply(t: String): Seq[String] = Seq(t)
}

/** Split on whitespace runs. */
final case class WhitespaceAnalyzer(lowercase: Boolean = false) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val s = if (lowercase) t.toLowerCase(Locale.ROOT) else t
    s.split("\\s+").toSeq.filter(_.nonEmpty)
  }
}

/** UAX#29-style word segmentation, approximated as letter/digit runs
  * (`segmentation` analyzer). */
final case class SegmentationAnalyzer(lowercase: Boolean = true) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val s = if (lowercase) t.toLowerCase(Locale.ROOT) else t
    // underscore is UAX#29 ExtendNumLet: it JOINS words, so
    // 'percent_not_contain' is ONE term (term_ops.test depends on the
    // ICU behavior — a ts_like with a literal-escaped `\_` must hit it)
    s.split("[^\\p{L}\\p{N}_]+").toSeq.filter(_.nonEmpty)
  }
}

/** Case/accent normalization to a single token (`norm` analyzer). */
final case class NormAnalyzer(lowercase: Boolean = true, accentFold: Boolean = true)
    extends Analyzer {
  def apply(t: String): Seq[String] = Seq(Analyzers.normalize(t, lowercase, accentFold))
}

/** Character n-grams (`ngram` analyzer: min/max gram, preserve original). */
final case class NGramAnalyzer(minGram: Int = 3, maxGram: Int = 3,
    preserveOriginal: Boolean = false) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (preserveOriginal) out += t
    var n = minGram
    while (n <= maxGram) {
      var i = 0
      while (i + n <= t.length) { out += t.substring(i, i + n); i += 1 }
      n += 1
    }
    out.toSeq
  }
}

/** Edge n-grams (the reference's `text` sub-template `edgengram`). */
final case class EdgeNGramAnalyzer(minGram: Int = 1, maxGram: Int = 10) extends Analyzer {
  def apply(t: String): Seq[String] =
    (minGram to math.min(maxGram, t.length)).map(t.substring(0, _))
}

/** Single-character delimiter split (`delimiter` analyzer). */
final case class DelimiterAnalyzer(delimiter: String) extends Analyzer {
  def apply(t: String): Seq[String] =
    t.split(java.util.regex.Pattern.quote(delimiter)).toSeq.filter(_.nonEmpty)
}

/** Multiple delimiters (`multi_delimiter` analyzer). */
final case class MultiDelimiterAnalyzer(delimiters: Seq[String]) extends Analyzer {
  private val pattern = delimiters.map(java.util.regex.Pattern.quote).mkString("|")
  def apply(t: String): Seq[String] = t.split(pattern).toSeq.filter(_.nonEmpty)
}

/** RE2-style split/extract (`pattern` analyzer). mode="split" uses the regex
  * as a separator; mode="match" emits every match of it. */
final case class PatternAnalyzer(regex: String, mode: String = "split") extends Analyzer {
  @transient private lazy val p = java.util.regex.Pattern.compile(regex)
  def apply(t: String): Seq[String] = mode match {
    case "split" => p.split(t).toSeq.filter(_.nonEmpty)
    case _ =>
      val m = p.matcher(t)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
  }
}

/** Stopword removal wrapper (`stopwords` analyzer). */
final case class StopwordsAnalyzer(inner: Analyzer, stopwords: Set[String]) extends Analyzer {
  def apply(t: String): Seq[String] = inner(t).filterNot(stopwords)
}

/** Stemming wrapper (`stemming` analyzer; Porter for English). */
final case class StemmingAnalyzer(inner: Analyzer, locale: String = "en") extends Analyzer {
  def apply(t: String): Seq[String] =
    if (locale.startsWith("en")) inner(t).map(Porter.stem) else inner(t)
}

/** The main `text` analyzer: segmentation + case fold + accent fold +
  * stopwords + stemming (tokenizer_options.h `text` template). */
final case class TextAnalyzer(
    locale: String = "en",
    lowercase: Boolean = true,
    accentFold: Boolean = true,
    stopwords: Set[String] = Set.empty,
    stemming: Boolean = true) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val segs = SegmentationAnalyzer(lowercase = false)(t)
    val normed = segs.map(Analyzers.normalize(_, lowercase, accentFold))
    val kept = if (stopwords.isEmpty) normed else normed.filterNot(stopwords)
    if (stemming && locale.startsWith("en")) kept.map(Porter.stem) else kept
  }
}

/** Chain analyzers: each stage re-tokenizes the previous stage's tokens
  * (`pipeline` analyzer). */
final case class PipelineAnalyzer(stages: Seq[Analyzer]) extends Analyzer {
  def apply(t: String): Seq[String] =
    stages.foldLeft(Seq(t))((toks, a) => toks.flatMap(a.apply))
}

/** Path hierarchy (`path_hierarchy`; tokenizers corpus
  * path_hierarchy_tokenizer.test): prefix tokens at delimiter boundaries —
  * /a/b/c → /a, /a/b, /a/b/c; an unanchored path keeps no leading
  * delimiter (a/b/c → a, a/b, a/b/c). `replacement` swaps the delimiter in
  * the OUTPUT, `reverse` emits suffixes (domain-style), `skip` drops
  * leading parts (trailing when reversed) — skipped forward tokens keep a
  * leading delimiter and skipped reverse tokens a trailing one, matching
  * the reference's goldens. */
final case class PathHierarchyAnalyzer(delimiter: String = "/",
    replacement: Option[String] = None, reverse: Boolean = false,
    skip: Int = 0) extends Analyzer {
  require(delimiter.nonEmpty, "path_hierarchy: empty delimiter")
  private val d = delimiter
  private val rep = replacement.filter(_.nonEmpty).getOrElse(d)

  // The tokenizer walks DELIMITER POSITIONS in the raw string (as the
  // reference does — split+filter(_.nonEmpty) collapsed consecutive
  // delimiters, dropped the lone-"/" token and lost reverse-mode trailing
  // delimiters; r15 ADVICE): every prefix (or suffix) boundary is a found
  // delimiter index, with the final token running to the end (or the
  // window start), so empty parts and boundary delimiters survive.
  def apply(t: String): Seq[String] =
    if (t.isEmpty) Nil else if (reverse) reverseTokens(t) else forwardTokens(t)

  private def render(s: String): String = if (rep == d) s else s.replace(d, rep)

  private def forwardTokens(t: String): Seq[String] = {
    val ds = d.length
    var prefixStart = 0
    if (skip > 0) {
      // a leading delimiter counts as one extra step (/a/b/c ≡ a/b/c)
      val steps = skip + (if (t.startsWith(d)) 1 else 0)
      var scanFrom = 0
      var i = 0
      while (i < steps) {
        val p = t.indexOf(d, scanFrom)
        if (p < 0) return Nil
        prefixStart = p
        scanFrom = p + ds
        i += 1
      }
    }
    // bump past a delimiter AT the cursor so the first segment isn't empty
    var cursor = prefixStart + (if (t.startsWith(d, prefixStart)) ds else 0)
    val out = Seq.newBuilder[String]
    var eof = false
    while (!eof) {
      val p = t.indexOf(d, cursor)
      val end = if (p < 0) { eof = true; t.length } else { cursor = p + ds; p }
      out += render(t.substring(prefixStart, end))
    }
    out.result()
  }

  private def reverseTokens(t: String): Seq[String] = {
    val ds = d.length
    // skip drops TRAILING segments; the window keeps its trailing delimiter
    var windowEnd = t.length
    var i = 0
    while (i < skip) {
      if (windowEnd <= ds) return Nil
      val p = t.lastIndexOf(d, windowEnd - ds - 1)
      if (p < 0) return Nil
      windowEnd = p + ds
      i += 1
    }
    val rendered = render(t.substring(0, windowEnd))
    if (rendered.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    var startIn = 0   // suffix left edge in the input
    var startBuf = 0  // suffix left edge in the rendered window
    var eof = false
    while (!eof) {
      out += rendered.substring(startBuf)
      val p = t.indexOf(d, startIn)
      if (p < 0 || p >= windowEnd) eof = true
      else {
        startBuf += (p - startIn) + rep.length
        startIn = p + ds
        if (startIn >= windowEnd) eof = true
      }
    }
    out.result()
  }
}

/** Synonym expansion over an inner analyzer (`solr_synonyms`/`wordnet_synonyms`
  * simplified to an explicit mapping). */
final case class SynonymAnalyzer(inner: Analyzer, synonyms: Map[String, Seq[String]])
    extends Analyzer {
  def apply(t: String): Seq[String] =
    inner(t).flatMap(tok => tok +: synonyms.getOrElse(tok, Seq.empty))
}

/** `geopoint` analyzer (reference libs/iresearch/.../analysis geopoint:
  * positions become covering-cell terms so geo predicates claim as term
  * queries): input "lat,lon" (or whitespace-separated) → the point's
  * geohash cell at `maxPrecision` plus every coarser prefix, so a query
  * covering cells at ANY precision ≤ maxPrecision matches by plain term
  * equality. Malformed input analyzes to no tokens (never throws — analyzer
  * contract). */
final case class GeoPointAnalyzer(maxPrecision: Int = 7) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val parts = t.split("[,;\\s]+").filter(_.nonEmpty)
    if (parts.length != 2) Seq.empty
    else try {
      val lat = parts(0).toDouble
      val lon = parts(1).toDouble
      if (lat.isNaN || lon.isNaN || math.abs(lat) > 90 || math.abs(lon) > 180) Seq.empty
      else {
        val h = graft.functions.Geo.geohash(lat, lon, maxPrecision)
        (1 to maxPrecision).map(h.substring(0, _))
      }
    } catch { case _: NumberFormatException => Seq.empty }
  }
}

/** `geojson` analyzer (reference geojson analyzer surface): GeoJSON Point →
  * its cell prefixes like [[GeoPointAnalyzer]] (coordinates are [lon, lat]);
  * Polygon → the envelope's covering cells at `precision` plus coarser
  * prefixes (a superset covering is correct — exact refine is the query's
  * job, same contract as Geo.coverPolygon). Non-geometry input → no
  * tokens. */
final case class GeoJsonAnalyzer(precision: Int = 5) extends Analyzer {
  def apply(t: String): Seq[String] = try {
    val norm = t.replaceAll("\\s+", "")
    if (norm.contains("\"type\":\"Point\"")) {
      val m = java.util.regex.Pattern
        .compile("\"coordinates\":\\[([-0-9.eE+]+),([-0-9.eE+]+)\\]").matcher(norm)
      if (!m.find()) Seq.empty
      else {
        val lon = m.group(1).toDouble
        val lat = m.group(2).toDouble
        val h = graft.functions.Geo.geohash(lat, lon, precision)
        (1 to precision).map(h.substring(0, _))
      }
    } else if (norm.contains("\"type\":\"Polygon\"")) {
      val vs = graft.functions.Geo.parseGeoJsonPolygon(t)
      graft.functions.Geo.coverBox(
          vs.map(_._1).min, vs.map(_._2).min, vs.map(_._1).max, vs.map(_._2).max, precision)
        .flatMap(c => (1 to precision).map(c.substring(0, _))).distinct
    } else Seq.empty
  } catch { case _: Exception => Seq.empty }
}

/** Dictionary-mapping analyzer backing `ts_lexize` (pg ts_lexize semantics;
  * the reference's solr_synonyms/wordnet_synonyms analyzers,
  * libs/iresearch/include/iresearch/analysis/): each inner token maps to its
  * dictionary OUTPUT lexemes (which may replace the token — `a => b` — or
  * expand it — equivalence groups). `passThrough` controls unmapped tokens:
  * solr dictionaries pass them through unchanged; wordnet dictionaries emit
  * NOTHING for unknown words (both observable in the reference's
  * inverted_index_synonyms.test). Distinct from [[SynonymAnalyzer]], which
  * only ever APPENDS synonyms. */
final case class LexizeAnalyzer(inner: Analyzer, mapping: Map[String, Seq[String]],
    passThrough: Boolean = true) extends Analyzer {
  def apply(t: String): Seq[String] =
    inner(t).flatMap(tok =>
      mapping.getOrElse(tok, if (passThrough) Seq(tok) else Seq.empty))
}

/** Per-token Porter stemming (`stem` dictionary template; English only —
  * the reference delegates to snowball per locale). */
final case class StemAnalyzer(inner: Analyzer, locale: String = "en")
    extends Analyzer {
  def apply(t: String): Seq[String] = {
    val toks = inner(t).map(_.toLowerCase(Locale.ROOT))
    if (locale.startsWith("en")) toks.map(Porter.stem) else toks
  }
}

/** Drop stop tokens, pass everything else (`stopwords` dictionary
  * template). */
final case class StopTokensAnalyzer(inner: Analyzer, stopwords: Set[String])
    extends Analyzer {
  def apply(t: String): Seq[String] =
    inner(t).filterNot(tok => stopwords.contains(tok.toLowerCase(Locale.ROOT)))
}


/** Parsers for the two public synonym-file formats the reference's
  * analyzers consume (Solr `synonyms.txt`, WordNet prolog `wn_s.pl`) —
  * file contents are passed as text (this environment has no model/data
  * files; the formats themselves are what's implemented). */
object SynonymFormats {
  /** Solr format: `#` comments; `a, b, c` equivalence groups (each member
    * maps to the whole group, Lucene's expand=true); `a, b => c, d`
    * explicit mappings (LHS terms map to RHS lexemes only). */
  def parseSolr(text: String): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[String, Seq[String]]
    text.split("[\\n;]").map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach { line =>
        def terms(s: String): Seq[String] =
          s.split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty).toSeq
        line.split("=>") match {
          case Array(lhs, rhs) =>
            val to = terms(rhs)
            terms(lhs).foreach(t => out(t) = out.getOrElse(t, Seq.empty) ++ to)
          case Array(group) =>
            val g = terms(group)
            g.foreach(t => out(t) = (out.getOrElse(t, Seq.empty) ++ g).distinct)
          case _ => throw new IllegalArgumentException(s"bad solr synonym line: $line")
        }
      }
    out.toMap
  }

  /** WordNet prolog format: `s(synset_id, w_num, 'word', ss_type, ...)` —
    * a word lexizes to its SYNSET ID(s) (the reference's observable
    * `ts_lexize` output, inverted_index_synonyms.test: `come` →
    * `{100000002}`): words sharing a synset map to the same id token, which
    * is exactly what makes them match each other in the index. Unknown
    * words emit nothing (LexizeAnalyzer passThrough=false). Multi-word
    * entries keep underscores as single lexemes. Non-blank lines that are
    * not `s(...)` records fail the parse (DDL-time error, as the reference
    * rejects malformed dictionaries). */
  def parseWordNet(text: String): Map[String, Seq[String]] = {
    val entry = """s\(\s*(\d+)\s*,\s*\d+\s*,\s*'((?:[^']|'')*)'\s*,.*\)\s*\.?""".r
    val rows = text.split("\n").map(_.trim).filter(_.nonEmpty).map {
      case entry(syn, w) =>
        w.replace("''", "'").toLowerCase(java.util.Locale.ROOT).replace(' ', '_') -> syn
      case bad => throw new IllegalArgumentException(
        s"wordnet_synonyms: failed to parse synonyms (bad record: $bad)")
    }
    rows.map(_._1).distinct.map { w =>
      w -> rows.collect { case (`w`, s) => s }.distinct.toSeq
    }.toMap
  }
}

/** Merge several analyzers' token streams (`union` analyzer — the
  * reference's multi-analyzer merge). Order: first analyzer's tokens first;
  * duplicates across analyzers dropped. */
final case class UnionAnalyzer(inners: Seq[Analyzer]) extends Analyzer {
  def apply(t: String): Seq[String] = inners.flatMap(_.apply(t)).distinct
}

/** Collation sort key as a single hex token (`collation` analyzer — the
  * reference uses ICU sort keys; java.text.Collator is the JDK equivalent).
  * At PRIMARY strength, case and accent variants collate to the same key,
  * which is exactly what makes the term-dict range/equality semantics
  * locale-correct. */
final case class CollationAnalyzer(locale: String = "en",
    strength: Int = java.text.Collator.PRIMARY) extends Analyzer {
  @transient private lazy val collator = {
    val c = java.text.Collator.getInstance(
      java.util.Locale.forLanguageTag(locale))
    c.setStrength(strength)
    c
  }
  def apply(t: String): Seq[String] =
    Seq(collator.getCollationKey(t).toByteArray.map("%02x".format(_)).mkString)
}

/** Sparse code-search grams via winnowing (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — public algorithm; the reference's `sparse_ngram`): of all
  * character k-grams, keep per sliding window of `window` grams the one with
  * the minimal hash (rightmost wins ties). Guarantees any shared substring
  * of length ≥ window + k - 1 contributes at least one shared gram, at a
  * fraction ≈ 2/(window+1) of the full gram set — the sparse index that
  * makes code search affordable. */
final case class SparseNGramAnalyzer(k: Int = 4, window: Int = 4) extends Analyzer {
  def apply(t: String): Seq[String] = {
    if (t.length < k) return Seq.empty
    val grams = (0 to t.length - k).map(i => t.substring(i, i + k))
    val hashes = grams.map(g => MurmurHash3.stringHash(g) & 0x7fffffff)
    if (grams.size <= window) return Seq(grams(rightmostMin(hashes, 0, hashes.size)))
    val picks = scala.collection.mutable.LinkedHashSet.empty[Int]
    var w = 0
    while (w + window <= hashes.size) {
      picks += rightmostMin(hashes, w, w + window)
      w += 1
    }
    picks.toSeq.map(grams)
  }
  private def rightmostMin(hs: Seq[Int], from: Int, until: Int): Int = {
    var best = from
    var i = from + 1
    while (i < until) { if (hs(i) <= hs(best)) best = i; i += 1 }
    best
  }
}

/** Text-labeling analyzer (`classification` — the reference backs it with a
  * fastText model, libs/iresearch/.../analysis/classification_tokenizer.cpp).
  * The MODEL is pluggable: any `Seq[String] => Seq[(String, Double)]` token
  * scorer; the built-in default is a transparent keyword-profile scorer
  * (fraction of tokens hitting each label's profile), so behavior is
  * deterministic and test-checkable without model files. Emits the top-k
  * labels as tokens — indexing them makes docs searchable by label. */
final case class ClassificationAnalyzer(
    inner: Analyzer,
    profiles: Map[String, Set[String]],
    topK: Int = 1) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val toks = inner(t)
    if (toks.isEmpty) return Seq.empty
    profiles.toSeq
      .map { case (label, words) => (label, toks.count(words).toDouble / toks.size) }
      .filter(_._2 > 0)
      .sortBy { case (label, s) => (-s, label) }
      .take(topK)
      .map(_._1)
  }
}

/** Synonym-by-embedding analyzer (`nearest_neighbors` — fastText-backed in
  * the reference): each token expands to its k nearest neighbors in a
  * provided embedding table. The embedding lookup is pluggable; the unit
  * tests drive it with a small explicit table. */
final case class NearestNeighborsAnalyzer(
    inner: Analyzer,
    embeddings: Map[String, Array[Double]],
    k: Int = 2) extends Analyzer {
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
  def apply(t: String): Seq[String] =
    inner(t).flatMap { tok =>
      embeddings.get(tok) match {
        case None => Seq(tok)
        case Some(e) =>
          tok +: embeddings.toSeq.filter(_._1 != tok)
            .map { case (w, we) => (w, cos(e, we)) }
            .sortBy { case (w, s) => (-s, w) }
            .take(k).map(_._1)
      }
    }
}

/** fastText TEXT-format (`.vec`) word vectors: an `N dim` header line, then
  * one `word v1 .. vdim` row per word — the public format
  * `fasttext print-word-vectors` / `save_model` text export emits. Rows
  * whose word carries the supervised-training `__label__` prefix are split
  * out as label vectors, so one file can back both `nearest_neighbors`
  * (word rows) and `classification` (label rows). Loaded once per analyzer
  * instance on the driver; analyzers ship to executors as part of the
  * serialized closure like every other dictionary-backed analyzer. */
object FastTextVec {
  final case class Model(words: Map[String, Array[Double]],
      labels: Map[String, Array[Double]])

  def load(path: String): Model = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val it = src.getLines().filter(_.trim.nonEmpty)
      require(it.hasNext, s"empty vector file: $path")
      val header = it.next().trim.split("\\s+")
      require(header.length == 2 && header.forall(_.forall(_.isDigit)),
        s"expected fastText `N dim` header in $path, got: ${header.mkString(" ")}")
      val dim = header(1).toInt
      val words = Map.newBuilder[String, Array[Double]]
      val labels = Map.newBuilder[String, Array[Double]]
      it.foreach { line =>
        val parts = line.trim.split("\\s+")
        require(parts.length == dim + 1,
          s"malformed vector row (want $dim dims): ${line.take(80)}")
        val vec = Array.tabulate(dim)(i => parts(i + 1).toDouble)
        if (parts(0).startsWith("__label__"))
          labels += parts(0).stripPrefix("__label__") -> vec
        else words += parts(0) -> vec
      }
      Model(words.result(), labels.result())
    } finally src.close()
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}

/** Model-backed text labeling: mean of the tokens' word vectors scored by
  * cosine against each `__label__` vector, top-k labels emitted as tokens —
  * the fastText-supervised scoring shape behind the reference's
  * `classification` analyzer (classification_tokenizer.cpp), driven here by
  * the public text vector format instead of the binary .bin. Deterministic:
  * ties break on label name. */
final case class VecClassificationAnalyzer(
    inner: Analyzer,
    model: FastTextVec.Model,
    topK: Int = 1) extends Analyzer {
  require(model.labels.nonEmpty, "classification model has no __label__ rows")
  def apply(t: String): Seq[String] = {
    val vecs = inner(t).flatMap(model.words.get)
    if (vecs.isEmpty) return Seq.empty
    val dim = vecs.head.length
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / vecs.size)
    model.labels.toSeq
      .map { case (l, v) => (l, FastTextVec.cosine(mean, v)) }
      .sortBy { case (l, s) => (-s, l) }
      .take(topK)
      .map(_._1)
  }
}

/** Word shingles: n consecutive tokens joined by a space — the unit set for
  * document-level Jaccard/MinHash dedup (inputs shorter than n emit nothing). */
final case class ShingleAnalyzer(inner: Analyzer, n: Int = 3) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val toks = inner(t)
    if (toks.size < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq
  }
}

/** Dictionary-driven compound-word decomposition (the decompounding token
  * filter family; complements the reference's ts_compound bucket query).
  * Greedy longest-match: repeatedly take the longest dictionary word
  * (≥ minLen chars) prefixing the remainder; a token that does not fully
  * decompose is kept whole. */
object Decompound {
  def split(token: String, isWord: String => Boolean, minLen: Int = 3): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < token.length) {
      var j = token.length
      var found = -1
      while (found < 0 && j - i >= minLen) {
        if (isWord(token.substring(i, j))) found = j else j -= 1
      }
      if (found < 0) return Seq(token)
      out += token.substring(i, found)
      i = found
    }
    out.toSeq
  }
}

/** Decompounding analyzer: each inner token is emitted as-is, and — when it
  * fully decomposes into ≥ 2 dictionary words — its subwords as well (the
  * emit-both convention of standard decompound filters, so both the exact
  * compound and its parts are searchable). */
final case class DecompoundAnalyzer(inner: Analyzer, dictionary: Set[String],
    minLen: Int = 3) extends Analyzer {
  def apply(t: String): Seq[String] = inner(t).flatMap { tok =>
    val parts = Decompound.split(tok, dictionary, minLen)
    if (parts.lengthCompare(1) > 0) tok +: parts else Seq(tok)
  }
}

/** MinHash signature tokens — the reference's `minhash` analyzer
  * (the LSH dedup primitive, SURVEY.md §2.11). Emits `i:h` where h is the
  * minimum of the i-th universal hash over the inner token stream; equal
  * tokens across two documents witness per-permutation signature equality.
  */
final case class MinHashAnalyzer(inner: Analyzer, numHashes: Int = 64) extends Analyzer {
  def apply(t: String): Seq[String] = {
    val sig = Analyzers.minHashSignature(inner(t), numHashes)
    sig.indices.map(i => s"$i:${sig(i)}")
  }
}

object Analyzers {
  val MersennePrime: Long = (1L << 61) - 1

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Full-width 61-bit multiplier/offset per permutation. A narrow (30-bit)
    * multiplier would make a·x+b almost never wrap mod p, leaving the map
    * monotone — every permutation then picks the SAME argmin and the sketch
    * degenerates to "is the globally-min token shared" instead of a
    * per-permutation Bernoulli(J). */
  def hashA(i: Int): Long = {
    val a = splitmix64(2L * i + 1) & MersennePrime
    if (a == 0L || a == MersennePrime) 1L else a
  }
  def hashB(i: Int): Long = splitmix64(2L * i + 2) & MersennePrime

  /** (a·b) mod 2^61-1 without overflow: 128-bit product via multiplyHigh,
    * then Mersenne folding (2^64 ≡ 2^3 mod p). */
  def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val res = ((hi << 3) | (lo >>> 61)) + (lo & MersennePrime)
    val r = (res & MersennePrime) + (res >>> 61)
    if (r >= MersennePrime) r - MersennePrime else r
  }

  /** MinHash signature of a token bag (min over the set per permutation;
    * duplicates can't change a minimum). Empty input → empty signature. */
  def minHashSignature(toks: Seq[String], numHashes: Int): Array[Long] = {
    if (toks.isEmpty) return Array.empty
    val base = toks.map(tok => MurmurHash3.stringHash(tok).toLong & 0xffffffffL).distinct
    Array.tabulate(numHashes) { i =>
      val a = hashA(i); val b = hashB(i)
      var min = Long.MaxValue
      base.foreach { x =>
        val h = {
          val s = mulMod61(a, x) + b // < 2^62: safe
          if (s >= MersennePrime) s - MersennePrime else s
        }
        if (h < min) min = h
      }
      min
    }
  }

  /** Whitespace tokens with character offsets into the ORIGINAL text —
    * the `offset` field feature of the reference's index
    * (/root/reference/server/pg/tokenizer_options.h:243-245), feeding
    * ts_offsets/ts_highlight (ts_offsets.cpp, ts_highlight.cpp). Returns
    * (lowercased token, 1-based start, 1-based one-past-end). */
  def tokenOffsets(text: String): Seq[(String, Int, Int)] = {
    if (text == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val start = i
        while (i < n && !text.charAt(i).isWhitespace) i += 1
        out += ((text.substring(start, i).toLowerCase(Locale.ROOT), start + 1, i + 1))
      }
    }
    out.toSeq
  }

  def normalize(t: String, lowercase: Boolean, accentFold: Boolean): String = {
    var s = t
    if (accentFold)
      s = Normalizer.normalize(s, Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", "")
    if (lowercase) s = s.toLowerCase(Locale.ROOT)
    s
  }

  val EnglishStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")
}

/** Named analyzer registry — the `CREATE TEXT SEARCH DICTIONARY` equivalent
  * (/root/reference/server/pg/commands/create_tsdictionary.cpp; catalog
  * object /root/reference/server/catalog/tokenizer.h). Template + options →
  * analyzer instance, looked up by name at index-build and query time.
  */
object AnalyzerRegistry {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Analyzer]()

  /** Which schema a user dictionary was created in (pg catalogs scope
    * dictionaries per schema; opclass_name_resolution.test depends on a
    * dictionary NOT resolving once search_path moves off its schema).
    * Built-ins registered below have no entry → treated as pg_catalog,
    * visible everywhere. */
  private val dictSchema = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(name: String, analyzer: Analyzer): Unit = registry.put(name, analyzer)
  def unregister(name: String): Boolean = {
    dictSchema.remove(name)
    registry.remove(name) != null
  }
  def exists(name: String): Boolean = registry.containsKey(name)
  def recordSchema(name: String, schema: String): Unit =
    dictSchema.put(name, schema.toLowerCase(Locale.ROOT))
  def schemaOf(name: String): String =
    Option(dictSchema.get(name)).getOrElse("pg_catalog")
  def get(name: String): Analyzer = {
    val a = registry.get(name)
    require(a != null, s"unknown text search dictionary: $name")
    a
  }
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }

  /** Build + register from a template name + options (the
    * `CREATE TEXT SEARCH DICTIONARY` execution path). */
  def create(name: String, template: String, options: Map[String, String] = Map.empty): Analyzer = {
    val a = build(template, options)
    register(name, a)
    a
  }

  /** `'"a", "b", "c"'`-style quoted lists (the reference's stopwords /
    * delimiters option format); unquoted input splits on commas. */
  private def quotedList(s: String): Seq[String] = {
    val q = "\"([^\"]*)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq
    if (q.nonEmpty) q else s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Build WITHOUT registering — compound templates (pipeline/union) build
    * their member stages through this. Option keys are case-insensitive and
    * the reference's aliases are honored (`synonyms`→rules,
    * `mingram`/`maxgram`→min/max). */
  def build(template: String, rawOptions: Map[String, String]): Analyzer = {
    val options = rawOptions.map { case (k, v) =>
      (k.toLowerCase(Locale.ROOT) match {
        case "synonyms" => "rules"
        case "mingram" => "min"
        case "maxgram" => "max"
        case other => other
      }) -> v
    }
    def opt(k: String, d: String) = options.getOrElse(k, d)
    // nested-template options: `<prefix>template` names the member template,
    // every other `<prefix>*` option is passed through prefix-stripped
    // (reference pipeline step1_*/union tokenizer1_* conventions)
    def sub(prefix: String): Option[Analyzer] = {
      val subOpts = options.collect {
        case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }
      subOpts.get("template").map(t => build(t, subOpts - "template"))
    }
    def requiredRules(tpl: String): String = options.getOrElse("rules",
      throw new IllegalArgumentException(
        s"""$tpl: required parameter "synonyms" was not found"""))
    // option applicability (tokenizers corpus path_hierarchy_tokenizer
    // .test error block): the path_hierarchy-only knobs error loudly on
    // other templates instead of being silently ignored
    if (template != "path_hierarchy") {
      val pathOnly = Seq("replacement", "reverse", "skip", "buffersize") ++
        (if (template == "delimiter" || template == "wildcard") Nil
         else Seq("delimiter"))
      pathOnly.find(options.contains).foreach(k =>
        throw new IllegalArgumentException(
          s"""option "$k" is not applicable in this context"""))
    }
    val a: Analyzer = template match {
      case "keyword" => KeywordAnalyzer
      case "whitespace" => WhitespaceAnalyzer(opt("case", "none") == "lower")
      case "segmentation" => SegmentationAnalyzer(opt("case", "lower") == "lower")
      case "norm" => NormAnalyzer(opt("case", "lower") == "lower", opt("accent", "false") != "true")
      case "ngram" => NGramAnalyzer(opt("min", "3").toInt, opt("max", "3").toInt,
        opt("preserve_original", "false") == "true")
      case "edgengram" => EdgeNGramAnalyzer(opt("min", "1").toInt, opt("max", "10").toInt)
      case "delimiter" => DelimiterAnalyzer(opt("delimiter", " "))
      case "pattern" => PatternAnalyzer(opt("pattern", "\\W+"), opt("mode", "split"))
      case "path_hierarchy" => PathHierarchyAnalyzer(
        // the DDL layer coerces an empty delimiter to the default (the
        // reference corpus: "empty delimiter -> /"); the tokenizer itself
        // rejects empty (path_hierarchy_tokenizer.cpp Make)
        Some(opt("delimiter", "/")).filter(_.nonEmpty).getOrElse("/"),
        options.get("replacement"),
        opt("reverse", "false") == "true", opt("skip", "0").toInt)
      case "minhash" => MinHashAnalyzer(
        WhitespaceAnalyzer(lowercase = true), opt("num_hashes", "64").toInt)
      case "collation" => CollationAnalyzer(opt("locale", "en"),
        opt("strength", "primary") match {
          case "primary" => java.text.Collator.PRIMARY
          case "secondary" => java.text.Collator.SECONDARY
          case _ => java.text.Collator.TERTIARY
        })
      case "sparse_ngram" => SparseNGramAnalyzer(
        opt("k", "4").toInt, opt("window", "4").toInt)
      case "copy_from" => get(options("from"))
      case "solr_synonyms" => LexizeAnalyzer(
        options.get("from").map(get).getOrElse(WhitespaceAnalyzer(lowercase = true)),
        try SynonymFormats.parseSolr(requiredRules("solr_synonyms"))
        catch {
          case e: IllegalArgumentException if e.getMessage.contains("was not found") => throw e
          case e: Exception => throw new IllegalArgumentException(
            s"solr_synonyms: failed to parse synonyms (${e.getMessage})")
        })
      case "wordnet_synonyms" => LexizeAnalyzer(
        options.get("from").map(get).getOrElse(WhitespaceAnalyzer(lowercase = true)),
        try SynonymFormats.parseWordNet(requiredRules("wordnet_synonyms"))
        catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("was not found") ||
                e.getMessage.contains("failed to parse") => throw e
          case e: Exception => throw new IllegalArgumentException(
            s"wordnet_synonyms: failed to parse synonyms (${e.getMessage})")
        },
        // unknown words emit NOTHING (reference: ts_lexize → {})
        passThrough = false)
      // --- reference dictionary templates (create_text_search_dictionary
      // corpus): per-token filters default to treating the input as ONE
      // token (pg ts_lexize semantics), with an optional tokenizer_* member
      case "stem" =>
        StemAnalyzer(sub("tokenizer_").getOrElse(KeywordAnalyzer), opt("locale", "en"))
      case "stopwords" =>
        StopTokensAnalyzer(sub("tokenizer_").getOrElse(KeywordAnalyzer),
          quotedList(options.getOrElse("stopwords",
            throw new IllegalArgumentException(
              """stopwords: required parameter "stopwords" was not found""")))
            .map(_.toLowerCase(Locale.ROOT)).toSet)
      case "multi_delimiter" =>
        MultiDelimiterAnalyzer(quotedList(options.getOrElse("delimiters",
          throw new IllegalArgumentException(
            """multi_delimiter: required parameter "delimiters" was not found"""))))
      case "union" =>
        val members = (1 to 9).flatMap(i => sub(s"tokenizer${i}_"))
        require(members.nonEmpty, "union: no tokenizerN_template members found")
        UnionAnalyzer(members)
      case "pipeline" =>
        val stages = (1 to 9).flatMap(i => sub(s"step${i}_"))
        require(stages.nonEmpty, "pipeline: no stepN_template stages found")
        PipelineAnalyzer(stages)
      case "nearest_neighbors" =>
        // model_location = fastText .vec file; without one the analyzer is
        // the deterministic stand-in (empty table -> tokens pass through)
        NearestNeighborsAnalyzer(
          options.get("from").map(get).getOrElse(WhitespaceAnalyzer(lowercase = true)),
          options.get("model_location")
            .map(p => FastTextVec.load(p).words).getOrElse(Map.empty),
          opt("top_k", "2").toInt)
      case "classification" =>
        val inner = options.get("from").map(get)
          .getOrElse(WhitespaceAnalyzer(lowercase = true))
        options.get("model_location") match {
          case Some(p) =>
            VecClassificationAnalyzer(inner, FastTextVec.load(p), opt("top_k", "1").toInt)
          case None =>
            // deterministic stand-in: explicit keyword profiles
            // `label1:w1,w2;label2:w3`
            val profiles = opt("profiles", "").split(";").filter(_.contains(":"))
              .map { s =>
                val Array(l, ws) = s.split(":", 2)
                l.trim -> ws.split(",").map(_.trim).filter(_.nonEmpty).toSet
              }.toMap
            ClassificationAnalyzer(inner, profiles, opt("top_k", "1").toInt)
        }
      case "geopoint" => GeoPointAnalyzer(opt("max_precision", "7").toInt)
      case "geojson" => GeoJsonAnalyzer(opt("precision", "5").toInt)
      case "shingle" => ShingleAnalyzer(
        WhitespaceAnalyzer(lowercase = true), opt("n", "3").toInt)
      case "text" => TextAnalyzer(
        locale = opt("locale", "en").takeWhile(_ != '_'),
        lowercase = opt("case", "lower") == "lower",
        accentFold = opt("accent", "false") != "true",
        stopwords = if (opt("stopwords", "none") == "english") Analyzers.EnglishStopwords else Set.empty,
        stemming = opt("stemming", "true") == "true")
      case "wildcard" =>
        // ngram-accelerated LIKE dispatch (reference ByWildcardNgram,
        // term_ops.test): this engine evaluates LIKE exactly on the
        // relation view, so only the TOKENIZATION is observable — the
        // ngramsize shapes the index layout, not results
        options.get("tokenizer_template") match {
          case Some("delimiter") =>
            DelimiterAnalyzer(opt("tokenizer_delimiter", " "))
          case _ => WhitespaceAnalyzer()
        }
      case other => throw new IllegalArgumentException(s"unknown analyzer template: $other")
    }
    a
  }

  // Default dictionaries available out of the box.
  register("keyword", KeywordAnalyzer)
  register("whitespace", WhitespaceAnalyzer(lowercase = true))
  register("simple", SegmentationAnalyzer())
  register("english", TextAnalyzer(stopwords = Analyzers.EnglishStopwords))
  register("text_en", TextAnalyzer())
  register("ngram3", NGramAnalyzer(3, 3))
  register("minhash64", MinHashAnalyzer(WhitespaceAnalyzer(lowercase = true), 64))
  register("shingle3", ShingleAnalyzer(WhitespaceAnalyzer(lowercase = true), 3))
}
