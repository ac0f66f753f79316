package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Live SODA HTTP ingestion (round 6) — the reference client's actual
  * transport: `GET {base}/resource/{id}.json?$limit=N&$offset=M&…` with
  * the documented paging loop (fetch until a short page), over a REAL
  * `java.net.http.HttpClient` socket round-trip. This closes the one
  * structural gap the local `GraftClient` twin left open: request
  * shaping, response parsing, and exactly-once page delivery were
  * already tested; now the HTTP hop itself is real too (SodaHttpSpec
  * runs it against an in-process loopback server — the zero-egress
  * sandbox precludes external hosts, not sockets).
  *
  * Scale note: the paging loop is DRIVER-side by design, exactly like
  * the reference gem — SODA endpoints cap page sizes (~50k rows), so a
  * portal fetch is an ingestion step, not a distributed scan. The
  * landing pattern for big pulls is fetch → write parquet once → every
  * query reads the columnar copy ([[Sources]]); for a corpus that
  * ALREADY lives in files, read it directly and skip HTTP entirely.
  */
/** Socrata application-token resolution (round 7). Anonymous SODA access
  * is aggressively throttled; authenticated requests carry the documented
  * `X-App-Token` header. The reference kept its credentials in
  * git-ignored YAML under `config/` (/root/reference/.gitignore:21-22) — the
  * equivalent here is a git-ignored properties file, with an env-var
  * override for CI and an explicit-argument override for code.
  *
  * Resolution order (first hit wins): explicit argument → `SODA_APP_TOKEN`
  * env var → `app_token` key in `config/soda.properties` (relative to the
  * working directory, like the reference's `config/` dir) → none
  * (anonymous — requests carry no auth header at all, byte-identical to
  * the pre-token behavior).
  */
object SodaCredentials {

  val EnvVar = "SODA_APP_TOKEN"
  val DefaultConfigPath = "config/soda.properties"
  val PropKey = "app_token"

  def appToken(explicit: Option[String] = None,
               configPath: String = DefaultConfigPath,
               env: Map[String, String] = sys.env): Option[String] =
    explicit.filter(_.nonEmpty)
      .orElse(env.get(EnvVar).filter(_.nonEmpty))
      .orElse(fromConfig(configPath))

  private def fromConfig(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else {
      val in = new java.io.FileInputStream(f)
      try {
        val p = new java.util.Properties()
        p.load(in)
        Option(p.getProperty(PropKey)).map(_.trim).filter(_.nonEmpty)
      } finally in.close()
    }
  }
}

/** Bounded retry for the SODA transport (round 8). Socrata throttles
  * anonymous and bursty clients with 429 and flakes with transient 5xx;
  * without a retry, one throttled page kills a whole multi-page ingest
  * (the paging loop raises on any non-200). Policy: exponential backoff
  * (base × 2^attempt, capped), honoring a numeric `Retry-After` header
  * when the server sends one (the documented throttling contract); only
  * 429 and 5xx are retried — any other non-200 is a caller error and
  * raises immediately, and exhausted retries still raise (hard failure
  * stays loud). Defaults bound worst-case added latency to
  * maxAttempts-1 sleeps of ≤ maxDelayMs each.
  */
final case class RetryPolicy(maxAttempts: Int = 5,
                             baseDelayMs: Long = 500,
                             maxDelayMs: Long = 10000) {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  require(baseDelayMs >= 0 && maxDelayMs >= baseDelayMs,
    "delays must satisfy 0 <= baseDelayMs <= maxDelayMs")
}

object SodaHttp {

  private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def retryableStatus(status: Int): Boolean =
    status == 429 || (status >= 500 && status <= 599)

  /** One GET with the bounded-backoff policy. 200 returns; non-retryable
    * statuses raise immediately; 429/5xx and connection-level IO errors
    * back off and retry until the attempt budget runs out, then raise
    * (IllegalArgumentException, matching the pre-retry contract).
    */
  private def sendWithRetry(req: java.net.http.HttpRequest,
                            uri: java.net.URI, what: String,
                            retry: RetryPolicy)
  : java.net.http.HttpResponse[String] = {
    var attempt = 1
    while (true) {
      val outcome: Either[java.io.IOException,
        java.net.http.HttpResponse[String]] =
        try Right(client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) if r.statusCode() == 200 => return r
        case Right(r) if !retryableStatus(r.statusCode()) =>
          throw new IllegalArgumentException(
            s"$what GET $uri failed: HTTP ${r.statusCode()}")
        case _ if attempt >= retry.maxAttempts =>
          outcome match {
            case Right(r) => throw new IllegalArgumentException(
              s"$what GET $uri failed after $attempt attempts: " +
                s"HTTP ${r.statusCode()}")
            case Left(e) => throw new IllegalArgumentException(
              s"$what GET $uri failed after $attempt attempts: " +
                s"${e.getMessage}", e)
          }
        case _ =>
          // numeric Retry-After (seconds) is honored; the HTTP-date form
          // falls back to the exponential schedule. Either way the sleep
          // is capped so a hostile header can't park the ingest.
          val retryAfterMs = outcome.toOption
            .flatMap { r =>
              val v = r.headers().firstValue("Retry-After")
              if (v.isPresent) Some(v.get) else None
            }
            .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
            .getOrElse(0L)
          val backoffMs = retry.baseDelayMs << math.min(attempt - 1, 20)
          Thread.sleep(
            math.min(math.max(backoffMs, retryAfterMs), retry.maxDelayMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One SODA page: a real blocking GET, returning the JSON body.
    * @param params query parameters (e.g. `$limit` / `$offset` /
    *               `$order` / `$where`), URL-encoded here
    * @param appToken Socrata app token → `X-App-Token` header; None =
    *               anonymous (request identical to the pre-token builds).
    *               Resolve from config/env via [[SodaCredentials.appToken]]
    */
  def fetchPage(baseUrl: String, resource: String,
                params: Seq[(String, String)],
                appToken: Option[String] = None,
                retry: RetryPolicy = RetryPolicy()): String = {
    val qs = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
      .mkString("&")
    val uri = java.net.URI.create(
      s"$baseUrl/resource/$resource.json" + (if (qs.isEmpty) "" else s"?$qs"))
    var b = java.net.http.HttpRequest.newBuilder(uri)
      .header("Accept", "application/json")
    appToken.foreach(t => b = b.header("X-App-Token", t))
    val req = b.GET().build()
    sendWithRetry(req, uri, "SODA", retry).body()
  }

  /** Parse one JSON page (a top-level array of row objects) into a
    * DataFrame via Spark's JSON source — schema inferred per page,
    * reconciled across pages by [[readResource]]'s union.
    */
  private def parsePage(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS(): Dataset[String])
  }

  /** The portal catalog over HTTP — the reference's `client.list` hop:
    * `GET {base}/data.json` (the Project Open Data endpoint Socrata
    * portals publish), returning one row per dataset with its
    * identifier/title/description columns as served. The local twin is
    * [[Catalog.list]] over a fixture directory.
    */
  def listCatalog(spark: SparkSession, baseUrl: String,
                  appToken: Option[String] = None,
                  retry: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val uri = java.net.URI.create(s"$baseUrl/data.json")
    var b = java.net.http.HttpRequest.newBuilder(uri)
      .header("Accept", "application/json")
    appToken.foreach(t => b = b.header("X-App-Token", t))
    val req = b.GET().build()
    val resp = sendWithRetry(req, uri, "catalog", retry)
    val ds = spark.read.json(Seq(resp.body()).toDS(): Dataset[String])
    // data.json nests datasets under "dataset"; tolerate a bare array too
    if (ds.columns.contains("dataset"))
      ds.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("dataset")).as("d"))
        .select("d.*")
    else ds
  }

  /** The reference gem's whole-resource fetch: page with `$limit`/
    * `$offset` until a short page, parse every page, union by name.
    * `order` is REQUIRED — SODA paging without a total order can
    * duplicate/drop rows across pages (the same contract
    * [[GraftClient.fetchPages]] enforces locally).
    *
    * SCHEMA-DRIFT POLICY (a portal adding/removing a column
    * mid-pagination, or SODA's omit-null-fields serialization making a
    * column page-local): FILL-NULL, not fail — pages union BY NAME with
    * missing columns null-filled, so the assembled frame's schema is the
    * UNION of all page schemas and a row is null exactly where its page
    * carried no value (spec-pinned in SodaHttpSpec, both directions).
    * A column whose inferred TYPE drifts across pages coerces under
    * Spark's ANSI union rules: the string side casts to the typed side
    * (bigint + string → bigint), losslessly for numeric-shaped strings,
    * and RAISES at action time for values that cannot coerce — fail-loud,
    * never a silent null (both spec-pinned). A caller expecting messy
    * mixed-type columns should `$select` them cast server-side, or read
    * with an explicit schema after assembly.
    *
    * @param extraParams passed through on every page request (e.g.
    *                    `$where`, `$select`) — server-side SoQL
    */
  def readResource(spark: SparkSession, baseUrl: String, resource: String,
                   order: String, pageSize: Int = 1000,
                   extraParams: Seq[(String, String)] = Nil,
                   maxPages: Int = 100000,
                   appToken: Option[String] = None,
                   retry: RetryPolicy = RetryPolicy()): DataFrame = {
    require(pageSize > 0, "pageSize must be positive")
    require(order.nonEmpty,
      "paged fetch requires $order (stable paging needs a total order)")
    var pages = Vector.empty[DataFrame]
    var off = 0
    var done = false
    var n = 0
    while (!done) {
      require(n < maxPages, s"readResource exceeded $maxPages pages")
      val body = fetchPage(baseUrl, resource, extraParams ++ Seq(
        "$order" -> order, "$limit" -> pageSize.toString,
        "$offset" -> off.toString), appToken, retry)
      val page = parsePage(spark, body)
      // one count job per page == one HTTP request per page (the same
      // cadence the local fetchPages twin documents); a short or empty
      // page terminates the loop — the SODA convention
      val rows = page.count()
      if (rows > 0) pages :+= page
      done = rows < pageSize
      off += pageSize
      n += 1
    }
    // union in FETCH order (page 1 first): the $order the caller paged by
    // is the order the assembled frame presents, and the schema anchors on
    // the first (full) page, not the trailing short one
    if (pages.isEmpty) spark.emptyDataFrame
    else pages.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
