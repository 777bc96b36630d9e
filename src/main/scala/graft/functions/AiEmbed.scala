package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** `ai_embed` provider layer — the reference's embedding providers
  * (/root/reference/server/connector/functions/embedding/provider_openai.cpp,
  * provider_gemini.cpp, provider_ollama.cpp), selected by `provider`:
  *
  *  - `openai`: POST `{"model": m, "input": [texts…]}` → answers in
  *    `{"data": [{"embedding": […]}…]}`, input order.
  *  - `gemini`: POST `{"requests": [{"model": "models/m", "content":
  *    {"parts": [{"text": …}]}}…]}` (batchEmbedContents) → answers in
  *    `{"embeddings": [{"values": […]}…]}`, request order.
  *  - `ollama`: POST `{"model": m, "input": [texts…]}` (/api/embed) →
  *    answers in `{"embeddings": [[…]…]}`, input order.
  *
  *  - `endpoint == ""` (the default — this container has no egress): the
  *    DETERMINISTIC STUB, a md5-derived pseudo-embedding. Loudly a
  *    stand-in; everything around it (schema, batching, quantization,
  *    the knn plumbing over the result) is real.
  *  - `endpoint` set: per-partition BATCHED HTTP calls through
  *    `mapPartitions` — executors talk to the endpoint directly (no
  *    driver fan-in), `batchSize` texts per request bound each payload,
  *    and a non-200 fails the task loudly rather than yielding partial
  *    columns. Exercised end-to-end in AiEmbedSpec against in-process
  *    HTTP servers speaking each of the three protocols.
  */
object AiEmbed {

  /** md5 pseudo-embedding: component k = big-endian bytes 2k,2k+1 / 65536. */
  def stubEmbedding(text: String, dim: Int = 8): Array[Double] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    Array.tabulate(dim)(k =>
      (((d(2 * k % 16) & 0xff) << 8) | (d((2 * k + 1) % 16) & 0xff)).toDouble / 65536.0)
  }

  @transient private lazy val client: HttpClient = HttpClient.newHttpClient()

  /** One provider round-trip for a batch of texts (protocol per `provider`,
    * see object doc). */
  def embedBatch(endpoint: String, model: String, texts: Seq[String],
      provider: String = "openai"): Seq[Array[Double]] = {
    val mapper = new ObjectMapper
    val root = mapper.createObjectNode()
    provider match {
      case "openai" | "ollama" =>
        root.put("model", model)
        val arr = root.putArray("input")
        texts.foreach(arr.add)
      case "gemini" =>
        val reqs = root.putArray("requests")
        texts.foreach { t =>
          val r = reqs.addObject()
          r.put("model", s"models/$model")
          r.putObject("content").putArray("parts").addObject().put("text", t)
        }
      case other => throw new IllegalArgumentException(s"unknown ai_embed provider: $other")
    }
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"ai_embed provider HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val body = mapper.readTree(resp.body())
    val data = provider match {
      case "openai" => body.get("data")
      case _ => body.get("embeddings")
    }
    require(data != null && data.size() == texts.size,
      s"ai_embed provider returned ${if (data == null) 0 else data.size()} embeddings for ${texts.size} inputs")
    (0 until data.size()).map { i =>
      val e = provider match {
        case "openai" => data.get(i).get("embedding") // {"embedding": [...]}
        case "gemini" => data.get(i).get("values")    // {"values": [...]}
        case _ => data.get(i)                         // bare [...]
      }
      Array.tabulate(e.size())(j => e.get(j).asDouble())
    }
  }

  /** Appends `outCol: ARRAY<DOUBLE>` to `df`. */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
      endpoint: String, model: String = "text-embedding-3-small",
      dim: Int = 8, batchSize: Int = 64, provider: String = "openai"): DataFrame = {
    if (endpoint.isEmpty) {
      val stub = udf((t: String) => stubEmbedding(t, dim))
      df.withColumn(outCol, stub(col(textCol)))
    } else {
      val schema = df.schema.add(outCol, ArrayType(DoubleType))
      val idx = df.schema.fieldIndex(textCol)
      val (ep, m, bs, pv) = (endpoint, model, batchSize, provider)
      df.mapPartitions { rows =>
        rows.grouped(bs).flatMap { batch =>
          val embs = embedBatch(ep, m, batch.map(_.getString(idx)), pv)
          batch.lazyZip(embs).map { (r, e) => Row.fromSeq(r.toSeq :+ e.toSeq) }
        }
      }(Encoders.row(schema))
    }
  }
}
