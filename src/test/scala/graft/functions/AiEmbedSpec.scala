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

  test("empty endpoint keeps the documented md5 stub") {
    val ss = spark
    import ss.implicits._
    val out = AiEmbed.withEmbedding(Seq("hello").toDF("text"), "text", "emb", "")
      .select(col("emb")).head().getSeq[Double](0)
    assert(out == AiEmbed.stubEmbedding("hello").toSeq)
  }
}
