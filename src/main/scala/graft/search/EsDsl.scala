package graft.search

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.analysis.Analyzer

/** Elasticsearch query-DSL → clause-tree translator — the Spark analogue of
  * the reference's ES HTTP layer (/root/reference/server/network/http/es/
  * dsl.cpp:147-394): `match` (analyzed disjunction by default, conjunction
  * with `"operator":"and"`), `match_phrase`, `term`, `range`, `bool` with
  * must/should/must_not/filter + `minimum_should_match`, `match_all`.
  * Beyond the reference's surface we accept the ES-standard clauses an
  * ES-migrating user hits in week one: `multi_match` (per-field analyzed
  * match OR'd across the listed fields), `exists` (JSON field presence),
  * `ids` (handlers.cpp:1280 `_mget` body shape as a query clause), and
  * `match_phrase_prefix` (type-ahead phrase, last slot prefix-expanded).
  * json4s ships with Spark — no extra dependency.
  */
object EsDsl {

  /** A translated query clause. `TokenClause(None, q)` evaluates over the
    * request's designated/indexed field; `Some(f)` names an explicit
    * `_source` field (multi_match) — equal to the designated field it still
    * drives the index, otherwise it row-evaluates over `_source.f`.
    * Exists/Ids are doc-level (no tokens). Bool nests arbitrarily with full
    * counting semantics (dsl.cpp:326-349). */
  sealed trait Clause
  final case class TokenClause(field: Option[String], q: TsQuery) extends Clause
  final case class ExistsClause(field: String) extends Clause
  final case class IdsClause(values: Seq[String]) extends Clause
  final case class BoolClause(must: Seq[Clause], mustNot: Seq[Clause],
      should: Seq[Clause], minShouldMatch: Int) extends Clause

  /** Legacy single-field bool shape (QueryLang's ts_compound bridge). */
  final case class Bool(
      must: Seq[TsQuery], mustNot: Seq[TsQuery],
      should: Seq[TsQuery], minShouldMatch: Int)

  /** The reference's aggregation surface (dsl.cpp: terms buckets,
    * date_histogram with calendar_interval, and the metric kinds
    * min/max/avg/sum/value_count/cardinality) plus the ES-standard
    * histogram (fixed numeric interval), filters (named bucket per
    * sub-query), and top_hits (request-level: top docs by sort). */
  sealed trait Agg { def name: String }
  final case class TermsAgg(name: String, field: String, size: Int,
      topHits: Option[TopHitsAgg] = None) extends Agg
  final case class DateHistogramAgg(name: String, field: String,
      interval: String) extends Agg
  final case class MetricAgg(name: String, kind: String, field: String) extends Agg
  final case class HistogramAgg(name: String, field: String,
      interval: Double) extends Agg
  final case class FiltersAgg(name: String,
      buckets: Seq[(String, Clause)]) extends Agg
  final case class TopHitsAgg(name: String, size: Int,
      sort: Seq[(String, Boolean)]) extends Agg

  private val metricKinds =
    Set("min", "max", "avg", "sum", "value_count", "cardinality")
  private val calendarIntervals =
    Set("minute", "hour", "day", "week", "month", "quarter", "year")

  /** Request-level options around the query (dsl.cpp:680-697): `from`/`size`
    * pagination, `sort` entries as (field, ascending) with `_id` allowed,
    * and `aggs` aggregations. */
  final case class Request(clause: Clause, from: Int,
      size: Option[Int], sort: Seq[(String, Boolean)], aggs: Seq[Agg])

  /** Parse `{"query": {...}}` (or a bare query object) into the clause tree. */
  def parseClause(json: String, analyzer: Analyzer): Clause = {
    val root = JsonMethods.parse(json) match {
      case o: JObject => (o \ "query") match {
        case q: JObject => q
        case _ => o
      }
      case other => throw new IllegalArgumentException(s"ES DSL: expected object, got $other")
    }
    translate(root, analyzer)
  }

  /** Legacy shape: a plain query or a single-level bool of single-field
    * queries. Field-aware/doc-level clauses (multi_match on another field,
    * exists, ids) cannot be flattened — use [[parseClause]]. */
  def parse(json: String, analyzer: Analyzer): Either[Bool, TsQuery] =
    parseClause(json, analyzer) match {
      case TokenClause(_, q) => Right(q)
      case BoolClause(m, mn, s, msm) =>
        Left(Bool(m.map(flatTs), mn.map(flatTs), s.map(flatTs), msm))
      case other => throw new IllegalArgumentException(
        s"ES DSL: clause $other needs the field-aware path (parseClause)")
    }

  /** Parse the full request: query + from/size/sort/aggs. */
  def parseRequest(json: String, analyzer: Analyzer): Request = {
    val o = JsonMethods.parse(json) match {
      case obj: JObject => obj
      case other => throw new IllegalArgumentException(s"ES DSL: expected object, got $other")
    }
    val from = (o \ "from") match {
      case JInt(n) => n.toInt
      case _ => 0
    }
    val size = (o \ "size") match {
      case JInt(n) => Some(n.toInt)
      case _ => None
    }
    // "sort": ["f1", {"f2": "desc"}, {"f3": {"order": "asc"}}] or a single
    // entry of those forms (dsl.cpp:434-456)
    def sortEntry(v: JValue): (String, Boolean) = v match {
      case JString(f) => (f, true)
      case JObject(List((f, JString(ord)))) => (f, ord.toLowerCase != "desc")
      case JObject(List((f, body: JObject))) => (body \ "order") match {
        case JString(ord) => (f, ord.toLowerCase != "desc")
        case _ => (f, true)
      }
      case other => throw new IllegalArgumentException(s"ES DSL: bad sort entry $other")
    }
    def sortOf(v: JValue): Seq[(String, Boolean)] = v match {
      case JArray(entries) => entries.map(sortEntry)
      case JNothing => Nil
      case single => Seq(sortEntry(single))
    }
    val sort = sortOf(o \ "sort")
    val aggs = ((o \ "aggs") match {
      case a: JObject => a.obj
      case _ => Nil
    }).map {
      case (name, body) =>
        def fieldOf(o: JValue, what: String): String = (o \ "field") match {
          case JString(f) => f
          case _ => throw new IllegalArgumentException(
            s"ES DSL: $what aggregation $name needs a field")
        }
        (body \ "terms", body \ "date_histogram", body \ "histogram",
          body \ "filters", body \ "top_hits") match {
          case (t: JObject, _, _, _, _) =>
            val sz = (t \ "size") match { case JInt(n) => n.toInt; case _ => 10 }
            // nested sub-aggregation: the common "top N docs per bucket"
            // shape — {"terms": {...}, "aggs": {"<n>": {"top_hits": {...}}}}
            val sub = (body \ "aggs") match {
              case JObject(List((thName, thBody))) =>
                (thBody \ "top_hits") match {
                  case th: JObject =>
                    val tsz = (th \ "size") match {
                      case JInt(n) => n.toInt; case _ => 3 }
                    Some(TopHitsAgg(thName, tsz, sortOf(th \ "sort")))
                  case _ => throw new IllegalArgumentException(
                    s"ES DSL: terms aggregation $name supports only a " +
                      "top_hits sub-aggregation")
                }
              case JNothing => None
              case _ => throw new IllegalArgumentException(
                s"ES DSL: terms aggregation $name takes at most one " +
                  "top_hits sub-aggregation")
            }
            TermsAgg(name, fieldOf(t, "terms"), sz, sub)
          case (_, dh: JObject, _, _, _) =>
            // calendar_interval minute/hour/day/week/month/quarter/year —
            // each maps 1:1 onto a Spark date_trunc unit
            val interval = (dh \ "calendar_interval") match {
              case JString(i) if calendarIntervals.contains(i) => i
              case JString(i) => throw new IllegalArgumentException(
                s"ES DSL: unsupported calendar_interval '$i'")
              case _ => throw new IllegalArgumentException(
                s"ES DSL: date_histogram $name needs calendar_interval")
            }
            DateHistogramAgg(name, fieldOf(dh, "date_histogram"), interval)
          case (_, _, h: JObject, _, _) =>
            // fixed-width numeric buckets: key = floor(v/interval)*interval
            val interval = (h \ "interval") match {
              case JInt(n) => n.toDouble
              case JDouble(d) => d
              case _ => throw new IllegalArgumentException(
                s"ES DSL: histogram $name needs a numeric interval")
            }
            require(interval > 0, s"ES DSL: histogram $name interval must be > 0")
            HistogramAgg(name, fieldOf(h, "histogram"), interval)
          case (_, _, _, f: JObject, _) =>
            // {"filters": {"filters": {"name": <query>, ...}}} — one named
            // bucket per sub-query, counted over the request's hit set
            val buckets = (f \ "filters") match {
              case JObject(entries) => entries.map { case (bn, q) =>
                bn -> translate(q, analyzer)
              }
              case _ => throw new IllegalArgumentException(
                s"ES DSL: filters aggregation $name needs a filters object")
            }
            require(buckets.nonEmpty, s"ES DSL: filters aggregation $name is empty")
            FiltersAgg(name, buckets)
          case (_, _, _, _, th: JObject) =>
            // request-level top_hits; the bucket-nested form rides inside
            // TermsAgg (terms + aggs.top_hits)
            val sz = (th \ "size") match { case JInt(n) => n.toInt; case _ => 3 }
            TopHitsAgg(name, sz, sortOf(th \ "sort"))
          case _ =>
            body match {
              case JObject(List((kind, m: JObject))) if metricKinds.contains(kind) =>
                MetricAgg(name, kind, fieldOf(m, kind))
              case _ => throw new IllegalArgumentException(
                s"ES DSL: unsupported aggregation $name (terms, date_histogram, " +
                  s"histogram, filters, top_hits, ${metricKinds.mkString("/")})")
            }
        }
    }
    Request(parseClause(json, analyzer), from, size, sort, aggs)
  }

  private def translate(q: JValue, analyzer: Analyzer): Clause =
    q match {
      case JObject(List((kind, body))) => kind match {
        case "match_all" => TokenClause(None, TsQuery.All)
        case "match" =>
          val (f, text, operator) = fieldTextOp(body)
          val toks = analyzer.tokens(text).map(TsQuery.Term.apply)
          TokenClause(Some(f),
            if (operator == "and") TsQuery.And(toks) else TsQuery.Or(toks))
        case "match_phrase" =>
          val (f, text, _) = fieldTextOp(body)
          TokenClause(Some(f), TsQuery.Phrase(analyzer.tokens(text)))
        case "match_phrase_prefix" =>
          // type-ahead: exact phrase over all but the last analyzed token,
          // last slot prefix-expanded (ES semantics; expansion runs
          // distributed over the term dict — no max_expansions cap needed)
          val (f, text, _) = fieldTextOp(body)
          val toks = analyzer.tokens(text)
          TokenClause(Some(f),
            if (toks.isEmpty) TsQuery.Or(Seq.empty)
            else TsQuery.PhrasePrefix(toks.init, toks.last))
        case "multi_match" =>
          // {"multi_match": {"query": ..., "fields": [...], "operator"?,
          //  "type"?}} — per-field match, OR'd (ES best_fields matching
          // semantics; scoring differences don't apply to the boolean hit
          // set). `field^boost` suffixes are accepted and ignored.
          val mm = body match {
            case o: JObject => o
            case other => throw new IllegalArgumentException(
              s"ES DSL: bad multi_match clause $other")
          }
          val text = (mm \ "query") match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException(
              "ES DSL: multi_match needs a query string")
          }
          val op = (mm \ "operator") match {
            case JString(s) => s.toLowerCase; case _ => "or"
          }
          val tpe = (mm \ "type") match {
            case JString(s) => s.toLowerCase; case _ => "best_fields"
          }
          val fields = (mm \ "fields") match {
            case JArray(fs) => fs.map {
              case JString(f) => f.split("\\^").head
              case other => throw new IllegalArgumentException(
                s"ES DSL: multi_match field must be a string, got $other")
            }
            case _ => Nil
          }
          val toks = analyzer.tokens(text)
          val perField: TsQuery = tpe match {
            case "phrase" => TsQuery.Phrase(toks)
            case "phrase_prefix" =>
              if (toks.isEmpty) TsQuery.Or(Seq.empty)
              else TsQuery.PhrasePrefix(toks.init, toks.last)
            case _ =>
              val ts = toks.map(TsQuery.Term.apply)
              if (op == "and") TsQuery.And(ts) else TsQuery.Or(ts)
          }
          if (fields.isEmpty) TokenClause(None, perField)
          else if (fields.size == 1) TokenClause(Some(fields.head), perField)
          else BoolClause(Nil, Nil,
            fields.map(f => TokenClause(Some(f), perField)), 1)
        case "exists" =>
          // {"exists": {"field": "f"}} — the doc's _source has a non-null f
          body match {
            case o: JObject => (o \ "field") match {
              case JString(f) => ExistsClause(f)
              case _ => throw new IllegalArgumentException(
                "ES DSL: exists needs a field")
            }
            case other => throw new IllegalArgumentException(
              s"ES DSL: bad exists clause $other")
          }
        case "ids" =>
          // {"ids": {"values": ["1", "2"]}} — _id membership (the _mget
          // body shape, handlers.cpp:1280, as a query clause)
          body match {
            case o: JObject => (o \ "values") match {
              case JArray(vs) =>
                val ids = vs.map {
                  case JString(s) => s
                  case JInt(n) => n.toString
                  case other => throw new IllegalArgumentException(
                    s"ES DSL: ids values must be strings, got $other")
                }
                require(ids.nonEmpty, "ES DSL: empty ids clause")
                IdsClause(ids)
              case _ => throw new IllegalArgumentException(
                "ES DSL: ids needs a values array")
            }
            case other => throw new IllegalArgumentException(
              s"ES DSL: bad ids clause $other")
          }
        case "term" =>
          val (f, value, _) = fieldTextOp(body)
          TokenClause(Some(f), TsQuery.Term(value))
        case "prefix" =>
          // {"prefix": {"field": "va"}} — dsl.cpp's prefix clause →
          // the index's term-range prefix walk
          val (f, value, _) = fieldTextOp(body)
          TokenClause(Some(f), TsQuery.Prefix(value))
        case "wildcard" =>
          // ES wildcard syntax (`*` any run, `?` one char) → the internal
          // LIKE-style pattern the automaton walk consumes
          val (f, value, _) = fieldTextOp(body)
          TokenClause(Some(f),
            TsQuery.Wildcard(value.replace('*', '%').replace('?', '_')))
        case "regexp" =>
          // ES regexp is WHOLE-TERM anchored (Lucene semantics)
          val (f, value, _) = fieldTextOp(body)
          TokenClause(Some(f), TsQuery.Regexp("^" + value + "$"))
        case "fuzzy" =>
          // {"fuzzy": {"field": {"value": v, "fuzziness": n|"AUTO"}}};
          // AUTO = ES's length ladder (0 for <3 chars, 1 to 5, else 2)
          val (f, value, _) = fieldTextOp(body)
          val fz = body match {
            case JObject(List((_, o: JObject))) => (o \ "fuzziness") match {
              case JInt(n) => n.toInt
              case JString("AUTO") | JNothing =>
                if (value.length < 3) 0 else if (value.length <= 5) 1 else 2
              case JString(s) => s.toInt
              case other => throw new IllegalArgumentException(
                s"ES DSL: bad fuzziness $other")
            }
            case _ => if (value.length < 3) 0 else if (value.length <= 5) 1 else 2
          }
          TokenClause(Some(f),
            if (fz == 0) TsQuery.Term(value) else TsQuery.Fuzzy(value, fz))
        case "terms" =>
          // {"terms": {"field": ["v1", "v2", ...]}} — any-of over exact
          // terms (dsl.cpp's terms clause): the disjunction of Term leaves
          body match {
            case JObject(List((f, JArray(vs)))) =>
              val terms = vs.map {
                case JString(v) => TsQuery.Term(v)
                case other => throw new IllegalArgumentException(
                  s"ES DSL: terms values must be strings, got $other")
              }
              require(terms.nonEmpty, "ES DSL: empty terms clause")
              TokenClause(Some(f), TsQuery.Or(terms))
            case other =>
              throw new IllegalArgumentException(s"ES DSL: bad terms clause $other")
          }
        case "range" =>
          // {"field": {"gt"/"gte": ..., "lt"/"lte": ...}} (dsl.cpp:257) —
          // lexicographic over the analyzed tokens, like `term`
          body match {
            case JObject(List((f, o: JObject))) =>
              def bound(k: String): Option[String] = (o \ k) match {
                case JString(s) => Some(s)
                // stringifying a numeric bound would silently compare
                // lexicographically ('10' < '9') — not ES's numeric-field
                // range semantics. Reject loudly (round-7 ADVICE).
                case JInt(_) | JDouble(_) =>
                  throw new IllegalArgumentException(
                    "ES DSL: numeric range bounds are not supported — range " +
                      "compares analyzed tokens lexicographically; pass string " +
                      "bounds (zero-padded if numeric order is intended)")
                case _ => None
              }
              val (gte, gt, lte, lt) =
                (bound("gte"), bound("gt"), bound("lte"), bound("lt"))
              require((gte.isEmpty || gt.isEmpty) && (lte.isEmpty || lt.isEmpty),
                "ES DSL: range with both inclusive and exclusive bound")
              val q = TsQuery.TermRange(gte.orElse(gt), lte.orElse(lt),
                loInc = gte.nonEmpty, hiInc = lte.nonEmpty)
              require(q.lo.nonEmpty || q.hi.nonEmpty, "ES DSL: empty range clause")
              TokenClause(Some(f), q)
            case other =>
              throw new IllegalArgumentException(s"ES DSL: bad range clause $other")
          }
        case "bool" =>
          def clause(name: String): Seq[Clause] = (body \ name) match {
            case JArray(items) => items.map(translate(_, analyzer))
            case o: JObject => Seq(translate(o, analyzer))
            case _ => Seq.empty
          }
          val must = clause("must") ++ clause("filter") // filter = non-scoring must
          val should = clause("should")
          val mustNot = clause("must_not")
          val msm = (body \ "minimum_should_match") match {
            case JInt(n) => n.toInt
            case JString(s) => s.toInt
            // ES default: 1 when should is the only clause group, else 0
            case _ => if (must.isEmpty && mustNot.isEmpty && should.nonEmpty) 1 else 0
          }
          BoolClause(must, mustNot, should, msm)
        case other =>
          throw new IllegalArgumentException(s"ES DSL: unsupported query kind '$other'")
      }
      case other => throw new IllegalArgumentException(s"ES DSL: expected single-key object, got $other")
    }

  /** `{"field": "text"}` or `{"field": {"query"/"value": ..., "operator": ...}}`. */
  private def fieldTextOp(body: JValue): (String, String, String) = body match {
    case JObject(List((field, JString(text)))) => (field, text, "or")
    case JObject(List((field, o: JObject))) =>
      val text = (o \ "query") match {
        case JString(s) => s
        case _ => (o \ "value") match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException("ES DSL: missing query/value")
        }
      }
      val op = (o \ "operator") match { case JString(s) => s.toLowerCase; case _ => "or" }
      (field, text, op)
    case other => throw new IllegalArgumentException(s"ES DSL: bad field clause $other")
  }

  /** Flatten a clause to a field-less TsQuery for the legacy [[parse]]
    * shape. Nested bools with counting semantics (msm > 1) and doc-level
    * clauses cannot flatten — those need the clause-tree path. */
  private def flatTs(c: Clause): TsQuery = c match {
    case TokenClause(_, q) => q
    case BoolClause(must, mustNot, should, msm) =>
      val shouldQ =
        if (should.isEmpty) Seq.empty
        else if (msm <= 1) Seq(TsQuery.Or(should.map(flatTs)))
        else throw new IllegalArgumentException(
          "ES DSL: nested bool with minimum_should_match > 1 unsupported in " +
            "the flattened shape")
      TsQuery.And(must.map(flatTs) ++
        mustNot.map(c => TsQuery.Not(flatTs(c))) ++ shouldQ)
    case other => throw new IllegalArgumentException(
      s"ES DSL: $other cannot flatten to a single-field TsQuery")
  }
}
