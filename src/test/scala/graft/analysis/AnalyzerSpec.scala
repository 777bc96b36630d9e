package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  test("whitespace splits on runs and lowercases when asked") {
    assert(WhitespaceAnalyzer(lowercase = true)("Hello   World\tfoo\nBar")
      == Seq("hello", "world", "foo", "bar"))
    assert(WhitespaceAnalyzer()("A b") == Seq("A", "b"))
    assert(WhitespaceAnalyzer().tokens(null) == Seq.empty)
  }

  test("segmentation keeps letter/digit runs only") {
    assert(SegmentationAnalyzer()("It's 42, okay?!") == Seq("it", "s", "42", "okay"))
  }

  test("norm folds case and accents") {
    assert(NormAnalyzer()("Crème BRÛLÉE") == Seq("creme brulee"))
  }

  test("ngram emits all grams in min..max") {
    assert(NGramAnalyzer(2, 3)("abcd")
      == Seq("ab", "bc", "cd", "abc", "bcd"))
    assert(NGramAnalyzer(3, 3, preserveOriginal = true)("ab") == Seq("ab"))
  }

  test("edge ngram emits prefixes") {
    assert(EdgeNGramAnalyzer(1, 3)("abcd") == Seq("a", "ab", "abc"))
  }

  test("shingle emits n-token windows, nothing for short docs") {
    val sh = ShingleAnalyzer(WhitespaceAnalyzer(lowercase = true), 3)
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b") == Seq.empty)
    val sh4 = ShingleAnalyzer(WhitespaceAnalyzer(lowercase = true), 4)
    assert(sh4("a b c d e") == Seq("a b c d", "b c d e"))
  }

  test("path hierarchy emits each prefix path") {
    assert(PathHierarchyAnalyzer()("/a/b/c") == Seq("/a", "/a/b", "/a/b/c"))
    assert(PathHierarchyAnalyzer()("a/b/c") == Seq("a", "a/b", "a/b/c"))
  }

  test("path hierarchy delimiter-position edges match the reference") {
    // path_hierarchy_tokenizer_test.cpp goldens
    val p = PathHierarchyAnalyzer()
    assert(p("/") == Seq("/"))                       // test_only_delimiter
    assert(p("//") == Seq("/", "//"))                // test_only_delimiters
    assert(p("/a/b/") == Seq("/a", "/a/b", "/a/b/")) // trailing boundary
    assert(p("") == Seq.empty)
    val rev = PathHierarchyAnalyzer(reverse = true)
    assert(rev("/a/b/c/") == Seq("/a/b/c/", "a/b/c/", "b/c/", "c/"))
    assert(rev("a/b/c") == Seq("a/b/c", "b/c", "c"))
    assert(rev("/") == Seq("/"))
    assert(rev("//") == Seq("//", "/"))
    val revSkip = PathHierarchyAnalyzer(reverse = true, skip = 1)
    assert(revSkip("/a/b/c/") == Seq("/a/b/", "a/b/", "b/"))
    assert(revSkip("/") == Seq.empty)
    assert(revSkip("//") == Seq("/"))
    val fwdSkip = PathHierarchyAnalyzer(skip = 1)
    assert(fwdSkip("/a/b/c") == Seq("/b", "/b/c"))
    assert(fwdSkip("a/b/c/") == Seq("/b", "/b/c", "/b/c/"))
    assert(fwdSkip("/") == Seq.empty)
    assert(fwdSkip("//") == Seq("/"))
    // replacement applies to every delimiter in the OUTPUT
    val repl = PathHierarchyAnalyzer(replacement = Some("//"))
    assert(repl("/a/b/c") == Seq("//a", "//a//b", "//a//b//c"))
    val revRepl = PathHierarchyAnalyzer(replacement = Some("-"),
      reverse = true, skip = 2, delimiter = ".")
    assert(revRepl("a.b.c.d.e") == Seq("a-b-c-", "b-c-", "c-"))
  }

  test("pattern split and match modes") {
    assert(PatternAnalyzer("[,;]")("a,b;c") == Seq("a", "b", "c"))
    assert(PatternAnalyzer("[0-9]+", "match")("a12b003") == Seq("12", "003"))
  }

  test("text analyzer folds, stops, stems") {
    val a = TextAnalyzer(stopwords = Analyzers.EnglishStopwords)
    assert(a("The Relational engines are failing!")
      == Seq("relat", "engin", "fail"))
  }

  test("pipeline re-tokenizes stage by stage") {
    val p = PipelineAnalyzer(Seq(DelimiterAnalyzer("/"), DelimiterAnalyzer(".")))
    assert(p("a.b/c") == Seq("a", "b", "c"))
  }

  test("synonyms expand after the inner analyzer") {
    val a = SynonymAnalyzer(WhitespaceAnalyzer(lowercase = true),
      Map("fast" -> Seq("quick")))
    assert(a("Fast car") == Seq("fast", "quick", "car"))
  }

  test("minhash signature: length, determinism, duplicate invariance") {
    val toks = Seq("a b c", "b c d", "c d e")
    val sig = Analyzers.minHashSignature(toks, 64)
    assert(sig.length == 64)
    assert(sig.toSeq == Analyzers.minHashSignature(toks, 64).toSeq)
    assert(sig.toSeq == Analyzers.minHashSignature(toks ++ toks, 64).toSeq,
      "minimum over a set is duplicate-invariant")
    assert(Analyzers.minHashSignature(Seq.empty, 64).isEmpty)
  }

  test("minhash similarity estimates Jaccard") {
    // two 75%-overlapping shingle sets: signature agreement ≈ J = 0.6
    val base = (0 until 100).map(i => s"tok$i")
    val a = Analyzers.minHashSignature(base.take(80), 256)
    val b = Analyzers.minHashSignature(base.drop(20), 256)
    val agree = a.zip(b).count { case (x, y) => x == y } / 256.0
    val j = 60.0 / 100.0
    assert(math.abs(agree - j) < 0.15, s"agreement $agree vs J $j")
  }

  test("union merges analyzer outputs in order, deduped") {
    val u = UnionAnalyzer(Seq(
      WhitespaceAnalyzer(lowercase = true), EdgeNGramAnalyzer(2, 3)))
    assert(u("Ab cd") == Seq("ab", "cd", "Ab", "Ab "))
  }

  test("collation keys fold case and accents at primary strength") {
    val c = CollationAnalyzer("en")
    assert(c("Cafe") == c("cafe"))
    assert(c("café") == c("cafe"))
    assert(c("cafe") != c("cafd"))
  }

  test("sparse ngram winnowing: sparse but shares a gram for long matches") {
    val a = SparseNGramAnalyzer(k = 4, window = 4)
    val shared = "return fibonacci(n-1)"
    val s1 = s"def f(n): $shared + fibonacci(n-2)"
    val s2 = s"int g(int n) {{ $shared + fib(n-2); }}"
    val (g1, g2) = (a(s1).toSet, a(s2).toSet)
    assert((g1 & g2).nonEmpty, "winnowing must keep a shared gram for a long shared substring")
    assert(g1.size < (s1.length - 3), "must be sparser than the full gram set")
    assert(a("abc").isEmpty)
  }

  test("classification emits top label tokens from token profiles") {
    val a = ClassificationAnalyzer(WhitespaceAnalyzer(lowercase = true),
      Map("db" -> Set("query", "index", "join"), "ml" -> Set("model", "train")),
      topK = 2)
    assert(a("the query planner uses a join index") == Seq("db"))
    assert(a("train the model on query logs") == Seq("ml", "db"))
    assert(a("nothing relevant here") == Seq.empty)
  }

  test("nearest neighbors expands tokens by embedding cosine") {
    val e = Map(
      "cat" -> Array(1.0, 0.0), "kitten" -> Array(0.9, 0.1),
      "dog" -> Array(0.0, 1.0), "puppy" -> Array(0.1, 0.9))
    val a = NearestNeighborsAnalyzer(WhitespaceAnalyzer(lowercase = true), e, k = 1)
    assert(a("cat") == Seq("cat", "kitten"))
    assert(a("dog stuff") == Seq("dog", "puppy", "stuff"))
  }

  test("fastText .vec model file backs nearest_neighbors and classification") {
    val path = getClass.getResource("/fasttext-mini.vec").getPath
    val m = FastTextVec.load(path)
    assert(m.words.size == 7 && m.labels.keySet == Set("royalty", "fruit"))

    // registry template with a model path: expansion by model cosine
    val nn = AnalyzerRegistry.create("ft_nn_spec", "nearest_neighbors",
      Map("model_location" -> path, "top_k" -> "1"))
    assert(nn("king") == Seq("king", "queen"))
    assert(nn("apple pie") == Seq("apple", "banana", "pie"))

    // classification: mean token vector vs __label__ vectors
    val cls = AnalyzerRegistry.create("ft_cls_spec", "classification",
      Map("model_location" -> path))
    assert(cls("king queen") == Seq("royalty"))
    assert(cls("apple banana unknownword") == Seq("fruit"))
    assert(cls("unknownword only") == Seq.empty)

    // without a model both templates stay deterministic stand-ins
    val plain = AnalyzerRegistry.create("ft_nn_plain_spec", "nearest_neighbors", Map.empty)
    assert(plain("king cabbage") == Seq("king", "cabbage"))
    val prof = AnalyzerRegistry.create("ft_cls_plain_spec", "classification",
      Map("profiles" -> "db:query,index;ml:model,train"))
    assert(prof("the query index") == Seq("db"))

    // malformed files fail loudly
    val bad = java.nio.file.Files.createTempFile("ft-bad", ".vec")
    java.nio.file.Files.writeString(bad, "not a header\nword 1 2\n")
    intercept[IllegalArgumentException](FastTextVec.load(bad.toString))
  }

  test("decompound splits greedily and keeps unsplittable tokens whole") {
    val dict = Set("stream", "processing", "hash", "join", "has")
    assert(Decompound.split("streamprocessing", dict) == Seq("stream", "processing"))
    // greedy longest-match: 'hash' (4) wins over 'has' (3)
    assert(Decompound.split("hashjoin", dict) == Seq("hash", "join"))
    // no full decomposition -> original token unchanged
    assert(Decompound.split("streamline", dict) == Seq("streamline"))
    assert(Decompound.split("hi", dict) == Seq("hi"))

    val a = DecompoundAnalyzer(WhitespaceAnalyzer(lowercase = true), dict)
    assert(a("HashJoin wins") == Seq("hashjoin", "hash", "join", "wins"))
  }

  test("registry creates parameterized analyzers") {
    val a = AnalyzerRegistry.create("t_ngram2", "ngram", Map("min" -> "2", "max" -> "2"))
    assert(a("abc") == Seq("ab", "bc"))
    assert(AnalyzerRegistry.get("t_ngram2") == a)
    val cp = AnalyzerRegistry.create("t_copy", "copy_from", Map("from" -> "t_ngram2"))
    assert(cp == a)
    intercept[IllegalArgumentException](AnalyzerRegistry.get("nope_missing"))
  }

  test("solr synonym format: groups expand, => replaces, comments skipped") {
    val m = SynonymFormats.parseSolr(
      "# comment\nGPS, global positioning system\npixima => canon")
    assert(m("gps") == Seq("gps", "global positioning system"))
    assert(m("global positioning system") == Seq("gps", "global positioning system"))
    assert(m("pixima") == Seq("canon"))
    assert(!m.contains("canon")) // RHS of => is output-only

    val a = AnalyzerRegistry.create("t_solr_syn", "solr_synonyms",
      Map("rules" -> "stream, flow; vector => embedding"))
    assert(a("Stream of vector data") ==
      Seq("stream", "flow", "of", "embedding", "data"))
  }

  test("geopoint analyzer emits the cell and every coarser prefix") {
    val a = GeoPointAnalyzer(maxPrecision = 7)
    // classic geohash test vector: (57.64911, 10.40744) -> u4pruyd
    assert(a("57.64911,10.40744") ==
      Seq("u", "u4", "u4p", "u4pr", "u4pru", "u4pruy", "u4pruyd"))
    assert(a("57.64911 10.40744") == a("57.64911,10.40744"))
    assert(a("not a point").isEmpty)
    assert(a("91.0,0.0").isEmpty) // out-of-range lat
    val reg = AnalyzerRegistry.create("t_geopoint", "geopoint", Map("max_precision" -> "3"))
    assert(reg("57.64911,10.40744") == Seq("u", "u4", "u4p"))
  }

  test("geojson analyzer tokenizes Point and Polygon to covering cells") {
    val a = GeoJsonAnalyzer(precision = 5)
    val pt = a("""{"type": "Point", "coordinates": [10.40744, 57.64911]}""")
    assert(pt == Seq("u", "u4", "u4p", "u4pr", "u4pru"))
    val poly = a(
      """{"type": "Polygon", "coordinates": [[[10.0, 57.0], [11.0, 57.0],
        |[11.0, 58.0], [10.0, 58.0], [10.0, 57.0]]]}""".stripMargin)
    // the polygon's covering cells must include the point's cell (the point
    // lies inside the polygon) — the containment property the index uses
    assert(poly.contains("u4pru"))
    assert(poly.nonEmpty && poly.forall(_.length <= 5))
    assert(a("""{"type": "LineString", "coordinates": []}""").isEmpty)
  }

  test("wordnet prolog format: words lexize to their synset ids") {
    // the reference's observable ts_lexize output
    // (inverted_index_synonyms.test): a word maps to its synset ID(s) —
    // words sharing a synset share a token, which is what makes them match
    // each other in the index; unknown words emit nothing
    val m = SynonymFormats.parseWordNet(
      """s(100001740,1,'entity',n,1,11).
        |s(100001740,2,'thing',n,1,11).
        |s(202560585,1,'run',v,1,2).
        |s(202560585,2,'go',v,1,2).
        |s(301234567,1,'run',v,2,1).
        |s(301234567,2,'sprint',v,1,1).""".stripMargin)
    assert(m("entity") == Seq("100001740"))
    assert(m("thing") == Seq("100001740"))
    // a word in two synsets maps to both ids, in record order
    assert(m("run") == Seq("202560585", "301234567"))
    val a = AnalyzerRegistry.create("t_wn_syn", "wordnet_synonyms",
      Map("rules" -> "s(1,1,'fast',a,1,0).\ns(1,2,'quick',a,1,0)."))
    assert(a("fast quick") == Seq("1", "1"))
    assert(a("data") == Seq.empty, "unknown words lexize to nothing")
    // malformed input is a DDL-time error, not a silent empty dictionary
    val err = intercept[IllegalArgumentException] {
      SynonymFormats.parseWordNet("not a wordnet record")
    }
    assert(err.getMessage.contains("failed to parse"))
  }

  test("stem / stopwords / multi_delimiter / union / pipeline templates") {
    val stem = AnalyzerRegistry.build("stem", Map("locale" -> "en"))
    assert(stem("running") == Seq("run"))
    val stop = AnalyzerRegistry.build("stopwords",
      Map("stopwords" -> "\"the\",\"a\",\"an\",\"is\""))
    assert(stop("the") == Seq.empty)
    assert(stop("query") == Seq("query"))
    val md = AnalyzerRegistry.build("multi_delimiter",
      Map("delimiters" -> "\":\", \";\", \" \""))
    assert(md("key:value; key2:value2") == Seq("key", "value", "key2", "value2"))
    val u = AnalyzerRegistry.build("union", Map(
      "TOKENIZER1_TEMPLATE" -> "keyword",
      "TOKENIZER2_TEMPLATE" -> "ngram", "TOKENIZER2_MINGRAM" -> "2",
      "TOKENIZER2_MAXGRAM" -> "2"))
    assert(u("abcd") == Seq("abcd", "ab", "bc", "cd"))
    val p = AnalyzerRegistry.build("pipeline", Map(
      "step1_template" -> "delimiter", "step1_delimiter" -> " ",
      "step2_template" -> "stem", "step2_locale" -> "en"))
    assert(p("running runners ran") == Seq("run", "runner", "ran"))
  }
}
