package graft.search

import org.scalatest.funsuite.AnyFunSuite

class PgDialectSpec extends AnyFunSuite {
  private def rw(s: String) = PgDialect.rewrite(s)

  test("bracket list literals become array(...)") {
    assert(rw("SELECT * FROM t WHERE x = [1, 2, 3]") ==
      "SELECT * FROM t WHERE x = array(1, 2, 3)")
    assert(rw("INSERT INTO t VALUES (1, [1, 2, 3])") ==
      "INSERT INTO t VALUES (1, array(1, 2, 3))")
    assert(rw("VALUES ([[1,2],[3,4]])") == "VALUES (array(array(1,2),array(3,4)))")
  }

  test("subscripts are left alone") {
    assert(rw("SELECT arr[0], m['k'] FROM t WHERE arr[1] > [2][0]") ==
      "SELECT arr[0], m['k'] FROM t WHERE arr[1] > array(2)[0]")
    assert(rw("SELECT f(x)[2]") == "SELECT f(x)[2]")
  }

  test("array casts collapse the size hint") {
    assert(rw("SELECT [1, 2]::FLOAT[2]") == "SELECT array(1, 2)::ARRAY<FLOAT>")
    assert(rw("SELECT x::INT[] FROM t") == "SELECT x::ARRAY<INT> FROM t")
    assert(rw("SELECT x::VARCHAR[3]") == "SELECT x::ARRAY<STRING>")
    // scalar casts untouched
    assert(rw("SELECT 1::DOUBLE <-> [1]::FLOAT[1]") ==
      "SELECT sqrt(ann_l2(1::DOUBLE, array(1)::ARRAY<FLOAT>))")
  }

  test("distance operators become claimable calls") {
    // `<->` is EUCLIDEAN distance (pgvector): sqrt over the squared-L2
    // kernel; the ANN claims see through the monotone wrapper
    assert(rw("SELECT id FROM t ORDER BY emb <-> [1, 2, 3]::FLOAT[3] LIMIT 1") ==
      "SELECT id FROM t ORDER BY sqrt(ann_l2(emb, array(1, 2, 3)::ARRAY<FLOAT>)) LIMIT 1")
    assert(rw("SELECT a <=> b FROM t") == "SELECT ann_cosine(a, b) FROM t")
    assert(rw("SELECT t.emb <#> q(1) FROM t") == "SELECT ann_ip(t.emb, q(1)) FROM t")
    assert(rw("SELECT array_value(x, y, z) <-> [1]::FLOAT[1] AS d") ==
      "SELECT sqrt(ann_l2(array_value(x, y, z), array(1)::ARRAY<FLOAT>)) AS d")
    // comparison after the call keeps its place (ClaimAnnRange squares the
    // radius back into the kernel's units)
    assert(rw("WHERE a <-> b < 0.5") == "WHERE sqrt(ann_l2(a, b)) < 0.5")
  }

  test("strings and comments are never rewritten") {
    assert(rw("SELECT ts_match(c, 'a <-> b', 'ws')") ==
      "SELECT ts_match(c, 'a <-> b', 'ws')")
    assert(rw("SELECT 1 -- x <-> y\n, [2]") == "SELECT 1 -- x <-> y\n, array(2)")
    assert(rw("SELECT '[1,2]'") == "SELECT '[1,2]'")
  }

  test("SELECT-list generate_series is not lateral position (r18 ADVICE #2)") {
    // the `<=>` independently trips needed(); the comma before
    // generate_series is SELECT-list position, so the bare alias must NOT
    // be rewritten to g(g) (an analysis error)
    assert(rw("SELECT a <=> b, generate_series(1,3) g FROM t") ==
      "SELECT ann_cosine(a, b), generate_series(1,3) g FROM t")
    // a FROM-position lateral comma still rewrites
    assert(rw("SELECT a <=> b FROM t, generate_series(1,3) g") ==
      "SELECT ann_cosine(a, b) FROM t, generate_series(1,3) g(g)")
    // GROUP BY commas do not count as FROM position either
    assert(rw("SELECT a <=> b FROM t GROUP BY x, generate_series(1,3)") ==
      "SELECT ann_cosine(a, b) FROM t GROUP BY x, generate_series(1,3)")
    // a subquery closing paren restores the outer FROM context
    assert(rw("SELECT a <=> b FROM (SELECT 1) s, generate_series(1,3) g") ==
      "SELECT ann_cosine(a, b) FROM (SELECT 1) s, generate_series(1,3) g(g)")
  }

  test("rewrite is idempotent") {
    val once = rw("SELECT emb <-> [1, 2]::FLOAT[2] FROM t")
    assert(rw(once) == once)
  }

  test("pg JSON arrows become get_json_object calls") {
    assert(rw("SELECT content->>'host' FROM t") ==
      "SELECT get_json_object(content, '$.host') FROM t")
    assert(rw("SELECT c->'a' FROM t") ==
      "SELECT get_json_object(c, '$.a') FROM t")
    // chains nest left-to-right
    assert(rw("SELECT c->'a'->>'b' FROM t") ==
      "SELECT get_json_object(get_json_object(c, '$.a'), '$.b') FROM t")
    // inside a function call argument
    assert(rw("SELECT ts_match(content->>'host', 'x', 'kw')") ==
      "SELECT ts_match(get_json_object(content, '$.host'), 'x', 'kw')")
    // expression-index DDL spelling
    assert(rw("CREATE INDEX i ON t USING inverted(id, (content->>'host') d)") ==
      "CREATE INDEX i ON t USING inverted(id, (get_json_object(content, '$.host')) d)")
    // non-simple key takes the bracket path
    assert(rw("SELECT c->>'a b' FROM t") ==
      "SELECT get_json_object(c, '$[''a b'']') FROM t")
    // lambda arrows (non-string right operand) are untouched
    assert(rw("SELECT transform(a, x -> x + 1) FROM t") ==
      "SELECT transform(a, x -> x + 1) FROM t")
    assert(rw("SELECT filter(a, x -> 2) FROM t") ==
      "SELECT filter(a, x -> 2) FROM t")
    // lambda arrows with a STRING body: lambda-shaped left side in a
    // higher-order-builtin argument slot stays a lambda
    assert(rw("SELECT transform(a, x -> 'tag') FROM t") ==
      "SELECT transform(a, x -> 'tag') FROM t")
    assert(rw("SELECT map_zip_with(m1, m2, (k, v1, v2) -> 'a') FROM t") ==
      "SELECT map_zip_with(m1, m2, (k, v1, v2) -> 'a') FROM t")
    assert(rw("SELECT aggregate(a, '', (acc, x) -> 'y', acc -> 'z') FROM t") ==
      "SELECT aggregate(a, '', (acc, x) -> 'y', acc -> 'z') FROM t")
    // ... but a bare identifier under a NON-higher-order callee is pg JSON
    assert(rw("SELECT length(c -> 'k') FROM t") ==
      "SELECT length(get_json_object(c, '$.k')) FROM t")
    // and a qualified column never reads as a lambda parameter
    assert(rw("SELECT transform(a, t.c -> 'k') FROM t") ==
      "SELECT transform(a, get_json_object(t.c, '$.k')) FROM t")
    // `->>` has no lambda meaning, so it rewrites even in that slot
    assert(rw("SELECT transform(a, x ->> 'k') FROM t") ==
      "SELECT transform(a, get_json_object(x, '$.k')) FROM t")
    // `exists`/`filter` are ALSO SQL keywords: a bare identifier deep inside
    // EXISTS(SELECT ...) or agg FILTER(WHERE ...) is NOT a direct argument
    // of a higher-order call and must still rewrite (r16 ADVICE item 2)
    assert(rw("SELECT 1 FROM t WHERE EXISTS (SELECT 1 FROM u WHERE c -> 'k' = 'x')") ==
      "SELECT 1 FROM t WHERE EXISTS (SELECT 1 FROM u WHERE get_json_object(c, '$.k') = 'x')")
    assert(rw("SELECT count(*) FILTER (WHERE c -> 'k' = 'x') FROM t") ==
      "SELECT count(*) FILTER (WHERE get_json_object(c, '$.k') = 'x') FROM t")
    // a genuine lambda that is not the leading argument still holds
    assert(rw("SELECT exists(a, x -> 'y') FROM t") ==
      "SELECT exists(a, x -> 'y') FROM t")
    // non-argument position inside a HOF call (operator operand, not a
    // direct argument) rewrites
    assert(rw("SELECT filter(a, x -> x = c -> 'k') FROM t") ==
      "SELECT filter(a, x -> x = get_json_object(c, '$.k')) FROM t")
    // strings keep their arrows
    assert(rw("SELECT 'a->>b'") == "SELECT 'a->>b'")
    // idempotent
    val once = rw("SELECT c->'a'->>'b' FROM t")
    assert(rw(once) == once)
  }

  test("<=> keeps Spark's null-safe equality when the flag is off") {
    val spark = graft.TestSpark.spark
    spark.conf.set("spark.graft.pgDialectCosineEq", "false")
    try {
      import spark.implicits._
      // end-to-end through the session parser: int operands, no vectors
      val out = Seq((1, 1), (2, 3)).toDF("a", "b")
      out.createOrReplaceTempView("pgd_nse")
      val rows = spark.sql("SELECT a <=> b AS eq FROM pgd_nse ORDER BY a")
        .collect().map(_.getBoolean(0)).toSeq
      assert(rows == Seq(true, false))
      // the other two spellings still rewrite under the flag
      assert(rw("SELECT a <-> b FROM t") == "SELECT sqrt(ann_l2(a, b)) FROM t")
    } finally {
      spark.conf.unset("spark.graft.pgDialectCosineEq")
      spark.catalog.dropTempView("pgd_nse")
    }
  }
}
