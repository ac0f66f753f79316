package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The SODA HTTP transport against a REAL loopback HTTP server (JDK
  * `com.sun.net.httpserver`): genuine socket round-trips, server-side
  * `$order`/`$limit`/`$offset` paging, short-page termination, error
  * propagation. The server serves the customer fixture as SODA-shaped
  * JSON, so the fetched DataFrame is checked row-for-row against the
  * parquet table it came from.
  */
class SodaHttpSpec extends SparkSpec {

  /** Start a SODA-shaped server over `rows` (pre-serialized JSON objects
    * keyed by an ordering value); returns (baseUrl, server). */
  private def startServer(rows: IndexedSeq[(Long, String)], resource: String)
  : (String, com.sun.net.httpserver.HttpServer) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(s"/resource/$resource.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val limit = params.get("$limit").map(_.toInt).getOrElse(1000)
        val offset = params.get("$offset").map(_.toInt).getOrElse(0)
        // $order: the spec server supports the single key it serves by
        val ordered =
          if (params.get("$order").exists(_.endsWith(" desc")))
            rows.sortBy(-_._1)
          else rows.sortBy(_._1)
        val body = ordered.slice(offset, offset + limit).map(_._2)
          .mkString("[", ",", "]").getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}", server)
  }

  private def customerRows: IndexedSeq[(Long, String)] =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      .orderBy("c_custkey")
      .toJSON.collect().toIndexedSeq
      .map { j =>
        val key = "\"c_custkey\":(\\d+)".r.findFirstMatchIn(j).get
          .group(1).toLong
        key -> j
      }

  test("paged HTTP fetch reassembles the fixture exactly (real sockets, " +
    "short-page termination)") {
    val rows = customerRows
    val (base, server) = startServer(rows, "cust-4x4a")
    try {
      // 150 fixture customers / pageSize 40 -> 4 requests, last one short
      val got = SodaHttp.readResource(spark, base, "cust-4x4a",
        order = "c_custkey", pageSize = 40)
      assert(got.count() == rows.size)
      val want = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))
      // JSON round-trip types: compare on casted projections
      val diff = got.select(col("c_custkey").cast("long"),
          col("c_name"), col("c_mktsegment"),
          col("c_acctbal").cast("double"))
        .exceptAll(want.select(col("c_custkey").cast("long"),
          col("c_name"), col("c_mktsegment"),
          col("c_acctbal").cast("double")))
      assert(diff.count() == 0, "HTTP-fetched rows differ from the fixture")
    } finally server.stop(0)
  }

  test("page-boundary exactness: no duplicated or dropped rows when the " +
    "total is an exact multiple of the page size") {
    val rows = customerRows.take(120)
    val (base, server) = startServer(rows, "cust-even")
    try {
      // 120 rows / pageSize 30 -> 4 full pages + 1 empty terminator
      val got = SodaHttp.readResource(spark, base, "cust-even",
        order = "c_custkey", pageSize = 30)
      assert(got.count() == 120)
      assert(got.select(col("c_custkey").cast("long")).distinct().count() == 120)
    } finally server.stop(0)
  }

  test("MULTI-page fetch presents rows in fetch order — page 1 first, " +
    "not reverse-paged, schema anchored on the first full page") {
    val rows = customerRows.take(90)
    val (base, server) = startServer(rows, "cust-order3")
    try {
      // 90 rows / pageSize 40 -> pages of 40, 40, 10; the assembled
      // frame must present the server's $order end to end
      val got = SodaHttp.readResource(spark, base, "cust-order3",
        order = "c_custkey", pageSize = 40)
      val keys = got.select(col("c_custkey").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      assert(keys == keys.sorted,
        s"pages reassembled out of fetch order: ${keys.take(6)}...")
      assert(keys.size == 90)
    } finally server.stop(0)
  }

  test("server-side $order desc is honored and extraParams pass through") {
    val rows = customerRows.take(10)
    val (base, server) = startServer(rows, "cust-desc")
    try {
      val got = SodaHttp.readResource(spark, base, "cust-desc",
        order = "c_custkey desc", pageSize = 100)
      val keys = got.select(col("c_custkey").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      assert(keys == keys.sortBy(-(_: Long)), s"not desc: $keys")
    } finally server.stop(0)
  }

  test("HTTP catalog listing parses a data.json dataset array") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body =
          """{"conformsTo":"open-data-schema-v1.1",
            |"dataset":[
            | {"identifier":"abcd-1234","title":"Traffic Counts",
            |  "description":"hourly counts"},
            | {"identifier":"efgh-5678","title":"Permits",
            |  "description":"building permits"}]}""".stripMargin
            .getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val cat = SodaHttp.listCatalog(spark, base)
      val got = cat.select("identifier", "title").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set("abcd-1234" -> "Traffic Counts",
        "efgh-5678" -> "Permits"))
    } finally server.stop(0)
  }

  test("X-App-Token header arrives on every page request; anonymous " +
    "requests carry none") {
    val rows = customerRows.take(50)
    val seen = new scala.collection.mutable.ArrayBuffer[Option[String]]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/resource/cust-auth.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        seen.synchronized {
          seen += Option(ex.getRequestHeaders.getFirst("X-App-Token"))
        }
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val limit = params.get("$limit").map(_.toInt).getOrElse(1000)
        val offset = params.get("$offset").map(_.toInt).getOrElse(0)
        val body = rows.sortBy(_._1).slice(offset, offset + limit).map(_._2)
          .mkString("[", ",", "]").getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // 50 rows / pageSize 20 -> 3 requests, every one authenticated
      val got = SodaHttp.readResource(spark, base, "cust-auth",
        order = "c_custkey", pageSize = 20, appToken = Some("tok-4x4"))
      assert(got.count() == 50)
      assert(seen.synchronized(seen.toList) ==
        List.fill(3)(Some("tok-4x4")), s"token headers: $seen")
      // unauthenticated behavior unchanged: no header at all
      seen.synchronized(seen.clear())
      SodaHttp.fetchPage(base, "cust-auth", Seq("$limit" -> "5"))
      assert(seen.synchronized(seen.toList) == List(None),
        s"anonymous request leaked a header: $seen")
    } finally server.stop(0)
  }

  test("SodaCredentials resolves explicit > env > properties file > none") {
    val dir = java.nio.file.Files.createTempDirectory("soda-cred")
    val propFile = dir.resolve("soda.properties")
    java.nio.file.Files.writeString(propFile,
      s"# git-ignored credential file (the reference's config/*.yml twin)\n" +
        s"${SodaCredentials.PropKey} = tok-from-file\n")
    val cfg = propFile.toString
    val env = Map(SodaCredentials.EnvVar -> "tok-from-env")
    assert(SodaCredentials.appToken(Some("tok-explicit"), cfg, env)
      .contains("tok-explicit"))
    assert(SodaCredentials.appToken(None, cfg, env).contains("tok-from-env"))
    assert(SodaCredentials.appToken(None, cfg, Map.empty)
      .contains("tok-from-file"))
    assert(SodaCredentials.appToken(None, dir.resolve("absent").toString,
      Map.empty).isEmpty)
    // blank values never authenticate
    assert(SodaCredentials.appToken(Some(""), cfg,
      Map(SodaCredentials.EnvVar -> "")).contains("tok-from-file"))
  }

  /** A server that answers each request for `resource` by popping the next
    * scripted status; a popped 200 serves `rows` with SODA paging. Returns
    * (baseUrl, server, requestCount). An exhausted script keeps serving 200.
    */
  private def startFlaky(rows: IndexedSeq[(Long, String)], resource: String,
                         script: Seq[Int], retryAfter: Option[String] = None)
  : (String, com.sun.net.httpserver.HttpServer,
     java.util.concurrent.atomic.AtomicInteger) = {
    val remaining = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    script.foreach(s => remaining.add(s))
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(s"/resource/$resource.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        count.incrementAndGet()
        val status = Option(remaining.poll()).map(_.toInt).getOrElse(200)
        if (status != 200) {
          retryAfter.foreach(v =>
            ex.getResponseHeaders.set("Retry-After", v))
          val err = s"""{"error":true,"code":$status}""".getBytes("UTF-8")
          ex.sendResponseHeaders(status, err.length)
          ex.getResponseBody.write(err)
          ex.close()
        } else {
          val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
            .split("&").filter(_.nonEmpty).map { kv =>
              val Array(k, v) = kv.split("=", 2)
              java.net.URLDecoder.decode(k, "UTF-8") ->
                java.net.URLDecoder.decode(v, "UTF-8")
            }.toMap
          val limit = params.get("$limit").map(_.toInt).getOrElse(1000)
          val offset = params.get("$offset").map(_.toInt).getOrElse(0)
          val body = rows.sortBy(_._1).slice(offset, offset + limit)
            .map(_._2).mkString("[", ",", "]").getBytes("UTF-8")
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
          ex.close()
        }
      })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}", server, count)
  }

  test("429-throttled pages retry with backoff and the fetch completes " +
    "row-identical (Retry-After honored)") {
    val rows = customerRows.take(60)
    // page 1 throttled twice, then fine; pages 2-3 clean -> 5 requests
    val (base, server, count) = startFlaky(rows, "cust-flaky",
      script = Seq(429, 429), retryAfter = Some("0"))
    try {
      val got = SodaHttp.readResource(spark, base, "cust-flaky",
        order = "c_custkey", pageSize = 25,
        retry = RetryPolicy(maxAttempts = 4, baseDelayMs = 1,
          maxDelayMs = 50))
      assert(got.count() == 60)
      assert(got.select(col("c_custkey").cast("long")).distinct()
        .count() == 60, "retried page duplicated or dropped rows")
      assert(count.get() == 5, s"expected 2 retries + 3 pages: $count")
    } finally server.stop(0)
  }

  test("transient 503 mid-pagination recovers without re-fetching " +
    "completed pages") {
    val rows = customerRows.take(50)
    // page 1 clean, page 2's first attempt 503, then clean
    val (base, server, count) = startFlaky(rows, "cust-503",
      script = Seq(200, 503))
    try {
      val got = SodaHttp.readResource(spark, base, "cust-503",
        order = "c_custkey", pageSize = 30,
        retry = RetryPolicy(maxAttempts = 3, baseDelayMs = 1,
          maxDelayMs = 20))
      assert(got.count() == 50)
      assert(count.get() == 3, s"expected 1 retry across 2 pages: $count")
    } finally server.stop(0)
  }

  test("permanent 500 raises after the bounded attempt budget") {
    val (base, server, count) = startFlaky(customerRows.take(5),
      "cust-dead", script = Seq.fill(64)(500))
    try {
      val e = intercept[IllegalArgumentException] {
        SodaHttp.fetchPage(base, "cust-dead", Seq("$limit" -> "5"),
          retry = RetryPolicy(maxAttempts = 3, baseDelayMs = 1,
            maxDelayMs = 20))
      }
      assert(e.getMessage.contains("after 3 attempts"), e.getMessage)
      assert(e.getMessage.contains("HTTP 500"), e.getMessage)
      assert(count.get() == 3, s"attempt budget not respected: $count")
    } finally server.stop(0)
  }

  test("non-retryable 4xx raises immediately — exactly one request") {
    val (base, server, count) = startFlaky(customerRows.take(5),
      "cust-404", script = Seq(404))
    try {
      intercept[IllegalArgumentException] {
        SodaHttp.fetchPage(base, "cust-404", Nil,
          retry = RetryPolicy(maxAttempts = 5, baseDelayMs = 1,
            maxDelayMs = 20))
      }
      assert(count.get() == 1, s"4xx must not retry: $count")
    } finally server.stop(0)
  }

  test("non-200 responses raise, and the order contract is enforced") {
    val (base, server) = startServer(customerRows.take(5), "exists")
    try {
      intercept[IllegalArgumentException] {
        SodaHttp.fetchPage(base, "missing-resource", Nil)
      }
      intercept[IllegalArgumentException] {
        SodaHttp.readResource(spark, base, "exists", order = "",
          pageSize = 10)
      }
    } finally server.stop(0)
  }

  test("schema drift mid-pagination fills null by name, both directions " +
    "(column added on a later page; column absent from a later page)") {
    // page 1 (ids 1-2): no `extra`; page 2 (ids 3-4): carries `extra`
    // but drops `note` — the portal-added-a-column case AND the
    // SODA-omits-null-fields case in one fixture
    val rows = IndexedSeq[(Long, String)](
      1L -> """{"id":1,"note":"a"}""",
      2L -> """{"id":2,"note":"b"}""",
      3L -> """{"id":3,"extra":"x"}""",
      4L -> """{"id":4,"extra":"y"}""")
    val (base, server) = startServer(rows, "drifty")
    try {
      val got = SodaHttp.readResource(spark, base, "drifty",
        order = "id", pageSize = 2)
      // assembled schema = union of page schemas
      assert(got.columns.sorted.toSeq == Seq("extra", "id", "note"))
      val byId = got.collect()
        .map(r => r.getAs[Long]("id") ->
          (Option(r.getAs[String]("note")), Option(r.getAs[String]("extra"))))
        .toMap
      assert(byId == Map(
        1L -> (Some("a"), None), 2L -> (Some("b"), None),
        3L -> (None, Some("x")), 4L -> (None, Some("y"))),
        s"fill-null by name violated: $byId")
    } finally server.stop(0)
  }

  test("type drift across pages coerces under ANSI union rules: " +
    "numeric-shaped strings cast losslessly to the typed side...") {
    val rows = IndexedSeq[(Long, String)](
      1L -> """{"id":1,"v":12}""",
      2L -> """{"id":2,"v":13}""",
      3L -> """{"id":3,"v":"14"}""",
      4L -> """{"id":4,"v":"15"}""")
    val (base, server) = startServer(rows, "typedrift")
    try {
      val got = SodaHttp.readResource(spark, base, "typedrift",
        order = "id", pageSize = 2)
      assert(got.schema("v").dataType ==
        org.apache.spark.sql.types.LongType)
      val byId = got.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
      assert(byId == Map(1L -> 12L, 2L -> 13L, 3L -> 14L, 4L -> 15L))
    } finally server.stop(0)
  }

  test("...and a value that cannot coerce RAISES at action time — " +
    "fail-loud, never a silent null") {
    val rows = IndexedSeq[(Long, String)](
      1L -> """{"id":1,"v":12}""",
      2L -> """{"id":2,"v":13}""",
      3L -> """{"id":3,"v":"not a number"}""",
      4L -> """{"id":4,"v":"also text"}""")
    val (base, server) = startServer(rows, "typedrift2")
    try {
      val got = SodaHttp.readResource(spark, base, "typedrift2",
        order = "id", pageSize = 2)
      val e = intercept[Exception] { got.collect() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.toString +: chain(t.getCause)
      assert(chain(e).exists(s => s.contains("CAST_INVALID_INPUT") ||
        s.contains("cannot be cast")), s"unexpected failure: ${chain(e)}")
    } finally server.stop(0)
  }
}
