package graft.search

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.analysis.Analyzer

/** Elasticsearch query-DSL → [[TsQuery]] translator — the Spark analogue of
  * the reference's ES HTTP layer (/root/reference/server/network/http/es/
  * dsl.cpp:147-394): `match` (analyzed disjunction by default, conjunction
  * with `"operator":"and"`), `match_phrase`, `term`, `range`, `bool` with
  * must/should/must_not/filter + `minimum_should_match`, `match_all`.
  * json4s ships with Spark — no extra dependency.
  */
object EsDsl {

  final case class Bool(
      must: Seq[TsQuery], mustNot: Seq[TsQuery],
      should: Seq[TsQuery], minShouldMatch: Int)

  /** The reference's aggregation surface (dsl.cpp: terms buckets,
    * date_histogram with calendar_interval, and the metric kinds
    * min/max/avg/sum/value_count/cardinality). */
  sealed trait Agg { def name: String }
  final case class TermsAgg(name: String, field: String, size: Int) extends Agg
  final case class DateHistogramAgg(name: String, field: String,
      interval: String) extends Agg
  final case class MetricAgg(name: String, kind: String, field: String) extends Agg

  private val metricKinds =
    Set("min", "max", "avg", "sum", "value_count", "cardinality")
  private val calendarIntervals =
    Set("minute", "hour", "day", "week", "month", "quarter", "year")

  /** Request-level options around the query (dsl.cpp:680-697): `from`/`size`
    * pagination, `sort` entries as (field, ascending) with `_id` allowed,
    * and `aggs` terms aggregations. */
  final case class Request(query: Either[Bool, TsQuery], from: Int,
      size: Option[Int], sort: Seq[(String, Boolean)], aggs: Seq[Agg])

  /** Parse `{"query": {...}}` (or a bare query object). Returns either a
    * plain query or a bool compound. */
  def parse(json: String, analyzer: Analyzer): Either[Bool, TsQuery] = {
    val root = JsonMethods.parse(json) match {
      case o: JObject => (o \ "query") match {
        case q: JObject => q
        case _ => o
      }
      case other => throw new IllegalArgumentException(s"ES DSL: expected object, got $other")
    }
    translate(root, analyzer)
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
    val sort = (o \ "sort") match {
      case JArray(entries) => entries.map(sortEntry)
      case JNothing => Nil
      case single => Seq(sortEntry(single))
    }
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
        (body \ "terms", body \ "date_histogram") match {
          case (t: JObject, _) =>
            val sz = (t \ "size") match { case JInt(n) => n.toInt; case _ => 10 }
            TermsAgg(name, fieldOf(t, "terms"), sz)
          case (_, dh: JObject) =>
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
          case _ =>
            body match {
              case JObject(List((kind, m: JObject))) if metricKinds.contains(kind) =>
                MetricAgg(name, kind, fieldOf(m, kind))
              case _ => throw new IllegalArgumentException(
                s"ES DSL: unsupported aggregation $name (terms, date_histogram, " +
                  s"${metricKinds.mkString("/")})")
            }
        }
    }
    Request(parse(json, analyzer), from, size, sort, aggs)
  }

  private def translate(q: JValue, analyzer: Analyzer): Either[Bool, TsQuery] =
    q match {
      case JObject(List((kind, body))) => kind match {
        case "match_all" => Right(TsQuery.All)
        case "match" =>
          val (_, text, operator) = fieldTextOp(body)
          val toks = analyzer.tokens(text).map(TsQuery.Term.apply)
          Right(if (operator == "and") TsQuery.And(toks) else TsQuery.Or(toks))
        case "match_phrase" =>
          val (_, text, _) = fieldTextOp(body)
          Right(TsQuery.Phrase(analyzer.tokens(text)))
        case "term" =>
          val (_, value, _) = fieldTextOp(body)
          Right(TsQuery.Term(value))
        case "prefix" =>
          // {"prefix": {"field": "va"}} — dsl.cpp's prefix clause →
          // the index's term-range prefix walk
          val (_, value, _) = fieldTextOp(body)
          Right(TsQuery.Prefix(value))
        case "wildcard" =>
          // ES wildcard syntax (`*` any run, `?` one char) → the internal
          // LIKE-style pattern the automaton walk consumes
          val (_, value, _) = fieldTextOp(body)
          Right(TsQuery.Wildcard(value.replace('*', '%').replace('?', '_')))
        case "regexp" =>
          // ES regexp is WHOLE-TERM anchored (Lucene semantics)
          val (_, value, _) = fieldTextOp(body)
          Right(TsQuery.Regexp("^" + value + "$"))
        case "fuzzy" =>
          // {"fuzzy": {"field": {"value": v, "fuzziness": n|"AUTO"}}};
          // AUTO = ES's length ladder (0 for <3 chars, 1 to 5, else 2)
          val (_, value, _) = fieldTextOp(body)
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
          Right(if (fz == 0) TsQuery.Term(value) else TsQuery.Fuzzy(value, fz))
        case "terms" =>
          // {"terms": {"field": ["v1", "v2", ...]}} — any-of over exact
          // terms (dsl.cpp's terms clause): the disjunction of Term leaves
          body match {
            case JObject(List((_, JArray(vs)))) =>
              val terms = vs.map {
                case JString(v) => TsQuery.Term(v)
                case other => throw new IllegalArgumentException(
                  s"ES DSL: terms values must be strings, got $other")
              }
              require(terms.nonEmpty, "ES DSL: empty terms clause")
              Right(TsQuery.Or(terms))
            case other =>
              throw new IllegalArgumentException(s"ES DSL: bad terms clause $other")
          }
        case "range" =>
          // {"field": {"gt"/"gte": ..., "lt"/"lte": ...}} (dsl.cpp:257) —
          // lexicographic over the analyzed tokens, like `term`
          body match {
            case JObject(List((_, o: JObject))) =>
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
              Right(q)
            case other =>
              throw new IllegalArgumentException(s"ES DSL: bad range clause $other")
          }
        case "bool" =>
          def clause(name: String): Seq[TsQuery] = (body \ name) match {
            case JArray(items) => items.map(i => flat(translate(i, analyzer)))
            case o: JObject => Seq(flat(translate(o, analyzer)))
            case _ => Seq.empty
          }
          val must = clause("must") ++ clause("filter") // filter = non-scoring must
          val should = clause("should")
          val msm = (body \ "minimum_should_match") match {
            case JInt(n) => n.toInt
            case JString(s) => s.toInt
            // ES default: 1 when should is the only clause group, else 0
            case _ => if (must.isEmpty && clause("must_not").isEmpty && should.nonEmpty) 1 else 0
          }
          Left(Bool(must, clause("must_not"), should, msm))
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

  private def flat(e: Either[Bool, TsQuery]): TsQuery = e match {
    case Right(q) => q
    case Left(Bool(must, mustNot, should, msm)) =>
      // nested bool without counting semantics when msm <= 1: OR the shoulds
      val shouldQ =
        if (should.isEmpty) Seq.empty
        else if (msm <= 1) Seq(TsQuery.Or(should))
        else throw new IllegalArgumentException(
          "ES DSL: nested bool with minimum_should_match > 1 unsupported")
      TsQuery.And(must ++ mustNot.map(TsQuery.Not.apply) ++ shouldQ)
  }
}
