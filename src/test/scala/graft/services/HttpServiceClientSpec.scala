package graft.services

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Recorded-fixture integration of the service adapters: a local JDK
  * HttpServer replays the reference services' wire sequences
  * (doc_intelligence.py:141-198 submit→202→poll; aoai.py:210-276 embed /
  * chat) with injected failures — 429 + Retry-After, transient 5xx,
  * terminal 4xx — and the Retry/Poll/HTTP composition must produce the
  * same outcomes the reference's error handling does.
  */
class HttpServiceClientSpec extends AnyFunSuite {

  // maxDelayMs must exceed the fixtures' Retry-After values (the policy
  // clamps server waits to its ceiling — RetrySpec covers the clamp)
  private val fastPolicy = RetryPolicy(maxAttempts = 5, baseDelayMs = 10,
    maxDelayMs = 5000, jitterMs = 0, jitterSeed = Some(1L))

  /** Serve scripted responses; returns (baseUrl, server). Each handler gets
    * (exchange, callIndex) with callIndex counting its own calls from 0.
    */
  private def withServer(routes: (String, (HttpExchange, Int) => Unit)*)(
      test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      val n = new AtomicInteger(0)
      server.createContext(path, (ex: HttpExchange) =>
        try h(ex, n.getAndIncrement()) finally ex.close())
    }
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String = "",
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
  }

  test("analyze: 429 (Retry-After) then 5xx on submit, 429 + pending polls, then succeeded") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer(
      "/analyze" -> { (ex, n) =>
        n match {
          case 0 => respond(ex, 429, headers = Map("Retry-After" -> "2"))
          case 1 => respond(ex, 503)
          case _ => respond(ex, 202, headers = Map(
            "Operation-Location" -> s"http://127.0.0.1:${ex.getLocalAddress.getPort}/analyzeResults/op123?api-version=v1"))
        }
      },
      "/analyzeResults/op123" -> { (ex, n) =>
        n match {
          case 0 => respond(ex, 429, headers = Map("Retry-After" -> "1"))
          case 1 => respond(ex, 200, """{"status":"running"}""")
          case _ => respond(ex, 200,
            """{"status":"succeeded","analyzeResult":{"content":"# Doc\ntable text"}}""")
        }
      }) { base =>
      val out = HttpServiceClient.analyze(s"$base/analyze", "pdf-bytes".getBytes(UTF_8),
        policy = fastPolicy, intervalMs = 7, maxPolls = 10, sleeper = delays += _)
      assert(out.isRight, out)
      val (id, result) = out.toOption.get
      assert(id == "op123")
      assert(result.contains("table text"))
      // the server's Retry-After (seconds) overrode the backoff curve
      assert(delays.contains(2000L), s"submit 429 Retry-After not honored: $delays")
      assert(delays.contains(1000L), s"poll 429 Retry-After not honored: $delays")
      // poll ticks used the poll interval, not the retry curve
      assert(delays.count(_ == 7L) >= 2, s"poll interval missing: $delays")
    }
  }

  test("analyze: terminal 400 on submit fails immediately without retries") {
    val calls = new AtomicInteger(0)
    withServer("/analyze" -> { (ex, _) =>
      calls.incrementAndGet()
      respond(ex, 400, """{"error":"bad payload"}""")
    }) { base =>
      val out = HttpServiceClient.analyze(s"$base/analyze", Array[Byte](1),
        policy = fastPolicy, intervalMs = 1, sleeper = _ => ())
      assert(out == Left("submit failed: HTTP 400 {\"error\":\"bad payload\"}"))
      assert(calls.get() == 1, "terminal 4xx must not burn the retry budget")
    }
  }

  test("analyze: operation status 'failed' lands on the Left with the service message") {
    withServer(
      "/analyze" -> { (ex, _) =>
        respond(ex, 202, headers = Map("Operation-Location" ->
          s"http://127.0.0.1:${ex.getLocalAddress.getPort}/analyzeResults/op9"))
      },
      "/analyzeResults/op9" -> { (ex, _) =>
        respond(ex, 200, """{"status":"failed","error":{"message":"corrupt input"}}""")
      }) { base =>
      val out = HttpServiceClient.analyze(s"$base/analyze", Array[Byte](1),
        policy = fastPolicy, intervalMs = 1, sleeper = _ => ())
      assert(out == Left("Polling failed: corrupt input"))
    }
  }

  test("analyze: submit retries exhausted surfaces as a Left, not an exception") {
    withServer("/analyze" -> { (ex, _) => respond(ex, 503) }) { base =>
      val out = HttpServiceClient.analyze(s"$base/analyze", Array[Byte](1),
        policy = fastPolicy.copy(maxAttempts = 2), intervalMs = 1, sleeper = _ => ())
      assert(out.left.exists(_.startsWith("submit failed after retries")), out)
    }
  }

  test("embed: 429 then 200 round-trips the batch in order") {
    withServer("/embed" -> { (ex, n) =>
      if (n == 0) respond(ex, 429, headers = Map("Retry-After" -> "1"))
      else respond(ex, 200,
        """{"data":[{"embedding":[1.0,0.0]},{"embedding":[0.0,1.0]}]}""")
    }) { base =>
      val emb = new HttpServiceClient.HttpEmbedder(s"$base/embed", dim = 2,
        policy = fastPolicy, sleeper = _ => ())
      val vs = emb.embedBatch(Iterator("alpha", "beta")).toSeq
      assert(vs.map(_.toSeq) == Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
    }
  }

  test("embed: vector-count mismatch is an error, not silent truncation") {
    withServer("/embed" -> { (ex, _) =>
      respond(ex, 200, """{"data":[{"embedding":[1.0]}]}""")
    }) { base =>
      val emb = new HttpServiceClient.HttpEmbedder(s"$base/embed", dim = 1,
        policy = fastPolicy, sleeper = _ => ())
      intercept[IllegalArgumentException](
        emb.embedBatch(Iterator("a", "b")).toSeq)
    }
  }

  test("summarize: transient 500 then 200 returns choices[0].message.content") {
    withServer("/chat" -> { (ex, n) =>
      if (n == 0) respond(ex, 500)
      else respond(ex, 200,
        """{"choices":[{"message":{"role":"assistant","content":"A short summary."}}]}""")
    }) { base =>
      val sum = new HttpServiceClient.HttpSummarizer(s"$base/chat",
        policy = fastPolicy, sleeper = _ => ())
      assert(sum.summarize("long document text") == "A short summary.")
    }
  }

  test("retrying embedder composition: HTTP embedder slots into the existing decorator") {
    // the RetryingEmbedder decorator and the HTTP transport retry compose
    // without double-wrapping surprises: outer decorator sees no exception
    // because the inner transport already absorbed the 429
    withServer("/embed" -> { (ex, n) =>
      if (n == 0) respond(ex, 429)
      else respond(ex, 200, """{"data":[{"embedding":[0.5,0.5]}]}""")
    }) { base =>
      val inner = new HttpServiceClient.HttpEmbedder(s"$base/embed", dim = 2,
        policy = fastPolicy, sleeper = _ => ())
      val emb = new RetryingEmbedder(inner, fastPolicy, _ => ())
      assert(emb.embed("text").toSeq == Seq(0.5f, 0.5f))
    }
  }
}
