package graft.functions

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The HTTP provider path end-to-end against a live in-process server
  * speaking the OpenAI embeddings protocol — batching, ordering, and
  * loud failure on non-200. */
class AiEmbedSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  /** Server-side "model": a deterministic function of the text the test
    * can recompute independently. */
  private def serverEmbedding(t: String): Array[Double] =
    Array(t.length.toDouble, if (t.isEmpty) 0.0 else t.charAt(0).toDouble, 7.0)

  private def withServer(status: Int)(body: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val requests = new AtomicInteger(0)
    val maxBatch = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val mapper = new ObjectMapper
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val input = req.get("input")
      requests.incrementAndGet()
      maxBatch.getAndUpdate(m => math.max(m, input.size()))
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      (0 until input.size()).foreach { i =>
        val e = data.addObject().putArray("embedding")
        serverEmbedding(input.get(i).asText()).foreach(e.add)
      }
      val out = mapper.writeValueAsBytes(root)
      ex.sendResponseHeaders(status, if (status == 200) out.length else -1)
      if (status == 200) ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings",
      requests, maxBatch)
    finally server.stop(0)
  }

  test("batched provider calls return ordered embeddings") {
    val ss = spark
    import ss.implicits._
    val texts = (0 until 150).map(i => s"doc number $i")
    val df = texts.toDF("text").repartition(2)
    withServer(200) { (endpoint, requests, maxBatch) =>
      val out = AiEmbed.withEmbedding(df, "text", "emb", endpoint, batchSize = 64)
        .select(col("text"), col("emb"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(out.size == 150)
      texts.foreach(t => assert(out(t) == serverEmbedding(t).toSeq, s"wrong embedding for '$t'"))
      assert(maxBatch.get() <= 64, "requests must respect batchSize")
      assert(requests.get() >= 3, "150 texts at batch 64 over 2 partitions needs >= 3 calls")
    }
  }

  test("provider errors fail the job loudly") {
    val ss = spark
    import ss.implicits._
    val df = Seq("a", "b").toDF("text")
    withServer(500) { (endpoint, _, _) =>
      val ex = intercept[Exception](
        AiEmbed.withEmbedding(df, "text", "emb", endpoint).collect())
      assert(ex.getMessage.contains("ai_embed provider HTTP 500") ||
        Option(ex.getCause).exists(_.getMessage.contains("ai_embed provider HTTP 500")))
    }
  }

  /** A server speaking the Gemini batchEmbedContents shape: requests carry
    * `requests[].content.parts[].text`, answers are `embeddings[].values`. */
  private def withGeminiServer(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1beta/models/m:batchEmbedContents", (ex: HttpExchange) => {
      val mapper = new ObjectMapper
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val reqs = req.get("requests")
      assert(reqs.get(0).get("model").asText().startsWith("models/"))
      val root = mapper.createObjectNode()
      val embs = root.putArray("embeddings")
      (0 until reqs.size()).foreach { i =>
        val t = reqs.get(i).get("content").get("parts").get(0).get("text").asText()
        val v = embs.addObject().putArray("values")
        serverEmbedding(t).foreach(v.add)
      }
      val out = mapper.writeValueAsBytes(root)
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1beta/models/m:batchEmbedContents")
    finally server.stop(0)
  }

  /** A server speaking Ollama /api/embed: `{"model", "input": [...]}` in,
    * `{"embeddings": [[...]...]}` out. */
  private def withOllamaServer(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/embed", (ex: HttpExchange) => {
      val mapper = new ObjectMapper
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val input = req.get("input")
      assert(req.get("model") != null)
      val root = mapper.createObjectNode()
      val embs = root.putArray("embeddings")
      (0 until input.size()).foreach { i =>
        val v = embs.addArray()
        serverEmbedding(input.get(i).asText()).foreach(v.add)
      }
      val out = mapper.writeValueAsBytes(root)
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api/embed")
    finally server.stop(0)
  }

  test("gemini protocol adapter round-trips batched embeddings") {
    val ss = spark
    import ss.implicits._
    val texts = (0 until 10).map(i => s"gem $i")
    withGeminiServer { endpoint =>
      val out = AiEmbed.withEmbedding(texts.toDF("text"), "text", "emb",
        endpoint, model = "m", batchSize = 4, provider = "gemini")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      texts.foreach(t => assert(out(t) == serverEmbedding(t).toSeq))
    }
  }

  test("ollama protocol adapter round-trips batched embeddings") {
    val ss = spark
    import ss.implicits._
    val texts = (0 until 10).map(i => s"oll $i")
    withOllamaServer { endpoint =>
      val out = AiEmbed.withEmbedding(texts.toDF("text"), "text", "emb",
        endpoint, model = "nomic-embed-text", batchSize = 4, provider = "ollama")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      texts.foreach(t => assert(out(t) == serverEmbedding(t).toSeq))
    }
  }

  test("empty endpoint keeps the documented md5 stub") {
    val ss = spark
    import ss.implicits._
    val out = AiEmbed.withEmbedding(Seq("hello").toDF("text"), "text", "emb", "")
      .select(col("emb")).head().getSeq[Double](0)
    assert(out == AiEmbed.stubEmbedding("hello").toSeq)
  }
}
