package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative REST source (reference dlt/sources/rest_api/__init__.py,
  * config_setup.py:73-85 paginators, :87+ auth, :302-383 endpoint
  * dependency graph).
  *
  * There is no Spark-native REST scan; like the reference, pagination is a
  * driver-side loop producing batches that become distributed frames
  * (`spark.read.json` over the collected pages). The HTTP transport is a
  * pluggable function so the client logic is testable in a zero-egress
  * environment and swappable for a real transport in production.
  */
object Rest {

  /** One page fetch: URL → (body, headers). */
  type Transport = String => Response
  final case class Response(body: String, headers: Map[String, String] = Map.empty,
                            status: Int = 200)

  /** Paginator strategies (reference config_setup.py:73-85). Each derives
    * the next URL from the last request, or None to stop. */
  sealed trait Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String]
  }
  /** single_page: no pagination. */
  case object SinglePage extends Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String] = None
  }
  /** offset: `?offset=N&limit=L` until a short/empty page. */
  final case class Offset(limit: Int, param: String = "offset",
                          itemCount: String => Int) extends Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String] =
      if (itemCount(resp.body) < limit) None
      else Some(setParam(url, param, ((pageIndex + 1) * limit).toString))
  }
  /** page_number: `?page=N` until an empty page. */
  final case class PageNumber(param: String = "page",
                              itemCount: String => Int) extends Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String] =
      if (itemCount(resp.body) == 0) None
      else Some(setParam(url, param, (pageIndex + 2).toString))
  }
  /** header_link: RFC5988 `Link: <url>; rel="next"`. */
  case object HeaderLink extends Paginator {
    private val LinkNext = """<([^>]+)>;\s*rel="next"""".r
    def next(url: String, resp: Response, pageIndex: Int): Option[String] =
      resp.headers.get("Link").flatMap(l => LinkNext.findFirstMatchIn(l).map(_.group(1)))
  }
  /** json_link / cursor: extract the next URL or cursor token from the body
    * with a caller-provided extractor (reference json_link paginator). */
  final case class JsonLink(extract: String => Option[String]) extends Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String] =
      extract(resp.body)
  }
  /** header_cursor: a response header value becomes the next request's
    * cursor query parameter (reference HeaderCursorPaginator,
    * rest_client/paginators.py:942-995; registered in
    * config_setup.py:73-85). Pagination stops when the header is absent
    * or empty. */
  final case class HeaderCursor(cursorKey: String = "next",
      cursorParam: String = "cursor") extends Paginator {
    def next(url: String, resp: Response, pageIndex: Int): Option[String] =
      resp.headers.get(cursorKey).filter(_.nonEmpty)
        .map(c => setParam(url, cursorParam, c))
  }
  /** auto: infer the strategy from each response (reference
    * PaginatorFactory, rest_client/detector.py:205-243): an RFC5988
    * `Link: rel="next"` header wins, then a `*next*`-named body key
    * holding a URL (directly or under `href`/`url`,
    * detector.py:44-120), else stop (single page). Re-detecting per
    * response is equivalent to the reference's detect-once: a source
    * does not change pagination style mid-stream. */
  case object Auto extends Paginator {
    private val DirectNext =
      """"(\w*next\w*)"\s*:\s*"([^"]+)"""".r
    private val NestedNext =
      """"(\w*next\w*)"\s*:\s*\{[^}]*?"(?:href|url)"\s*:\s*"([^"]+)"""".r
    private def looksLikeUrl(s: String): Boolean =
      s.startsWith("http://") || s.startsWith("https://") || s.startsWith("/")
    def next(url: String, resp: Response, pageIndex: Int): Option[String] = {
      val fromBody =
        DirectNext.findFirstMatchIn(resp.body).map(_.group(2)).filter(looksLikeUrl)
          .orElse(NestedNext.findFirstMatchIn(resp.body).map(_.group(2))
            .filter(looksLikeUrl))
          .map(u => if (u.startsWith("/")) resolveRelative(url, u) else u)
      HeaderLink.next(url, resp, pageIndex).orElse(fromBody)
    }
  }

  /** Resolve a path-absolute next link against the current page URL. */
  private def resolveRelative(current: String, path: String): String = {
    val schemeEnd = current.indexOf("://")
    if (schemeEnd < 0) path
    else {
      val hostEnd = current.indexOf('/', schemeEnd + 3)
      (if (hostEnd < 0) current else current.substring(0, hostEnd)) + path
    }
  }

  /** Auth strategies (reference config_setup.py:87+): each contributes
    * request headers and/or query params. The reference's oauth2 flow
    * (fetch token, then bearer) is the `OAuth2` token supplier. */
  sealed trait Auth {
    def headers: Map[String, String] = Map.empty
    def queryParams: Map[String, String] = Map.empty
  }
  final case class Bearer(token: String) extends Auth {
    override def headers: Map[String, String] =
      Map("Authorization" -> s"Bearer $token")
  }
  final case class HttpBasic(user: String, password: String) extends Auth {
    override def headers: Map[String, String] = Map("Authorization" ->
      ("Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$user:$password".getBytes("UTF-8"))))
  }
  /** api_key in a header or a query parameter. */
  final case class ApiKey(name: String, value: String, inQuery: Boolean = false)
      extends Auth {
    override def headers: Map[String, String] =
      if (inQuery) Map.empty else Map(name -> value)
    override def queryParams: Map[String, String] =
      if (inQuery) Map(name -> value) else Map.empty
  }
  /** oauth2 client-credentials with token EXPIRY (reference
    * auth.py:148-207 `OAuth2ClientCredentials`): `obtainToken` runs
    * the exchange and reports the token's `expires_in`; the token is
    * cached and re-obtained only once expired (`is_token_expired` /
    * `obtain_token`, expiry stamped at auth.py:190-191), with the
    * reference's 3600 s `default_token_expiration` when the endpoint
    * omits `expires_in`. A long extract that outlives the token
    * re-authenticates mid-pagination instead of 401ing. `now` is
    * injectable for deterministic expiry tests.
    *
    * The stamped expiry is pulled EARLY by min(30 s, ttl/10): a token
    * used at exactly `now + expires_in` is already dead on the wire
    * (clock skew + request latency), so refreshing at the nominal
    * boundary 401s requests in flight. The reference refreshes at the
    * boundary; the clamp keeps short test tokens (ttl of seconds)
    * usable for most of their lifetime. */
  final class OAuth2(obtainToken: () => OAuth2.Token,
      defaultExpirationSeconds: Long = 3600,
      now: () => Long = () => System.currentTimeMillis()) extends Auth {
    // (token, expiry epoch-millis); guarded — the endpoint graph may
    // fetch sibling endpoints from one auth binding
    private[this] var current: Option[(String, Long)] = None
    override def headers: Map[String, String] = synchronized {
      val tok = current match {
        case Some((t, expiry)) if now() < expiry => t
        case _ =>
          val t = obtainToken()
          val ttlMs = t.expiresInSeconds.getOrElse(defaultExpirationSeconds) * 1000L
          val margin = math.min(30000L, ttlMs / 10)
          current = Some((t.accessToken, now() + ttlMs - margin))
          t.accessToken
      }
      Map("Authorization" -> s"Bearer $tok")
    }
  }
  object OAuth2 {
    /** One token exchange result; `expiresInSeconds` = the endpoint's
      * `expires_in` (None → default expiration applies). */
    final case class Token(accessToken: String,
        expiresInSeconds: Option[Long] = None)

    def apply(obtainToken: () => Token,
        defaultExpirationSeconds: Long = 3600,
        now: () => Long = () => System.currentTimeMillis()): OAuth2 =
      new OAuth2(obtainToken, defaultExpirationSeconds, now)

    /** Compatibility shape: a plain token fetcher with no expiry info —
      * the default expiration governs refresh. */
    def apply(fetchToken: () => String): OAuth2 =
      new OAuth2(() => Token(fetchToken()))

    /** Parse a token endpoint's JSON response (reference
      * `parse_access_token` / `parse_expiration_in_seconds`,
      * auth.py:205-210): `access_token` required, `expires_in`
      * optional (number or numeric string, as real providers vary).
      * Fields are matched at the TOP LEVEL only (a nested object's
      * `expires_in` must not win) and the token is JSON-unescaped. */
    def parseTokenResponse(json: String): Token = {
      val top = topLevelJson(json)
      val tok = """"access_token"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(top).map(m => unescapeJson(m.group(1)))
        .getOrElse(throw new IllegalArgumentException(
          s"token response carries no access_token: $json"))
      val exp = """"expires_in"\s*:\s*"?(\d+)"?""".r
        .findFirstMatchIn(top).map(_.group(1).toLong)
      Token(tok, exp)
    }

    /** The top level of a JSON object with nested objects/arrays
      * blanked out (string-aware brace walk) — keeps field extraction
      * regexes from matching inside sub-objects. */
    private def topLevelJson(json: String): String = {
      val sb = new StringBuilder(json.length)
      var depth = 0
      var inStr = false
      var esc = false
      json.foreach { c =>
        if (inStr) {
          if (depth <= 1) sb += c
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '{' | '[' =>
            depth += 1
            if (depth <= 1) sb += c
          case '}' | ']' =>
            if (depth <= 1) sb += c
            depth -= 1
          case '"' =>
            inStr = true
            if (depth <= 1) sb += c
          case _ =>
            if (depth <= 1) sb += c
        }
      }
      sb.toString
    }

    /** Standard JSON string unescape (\" \\ \/ \b \f \n \r \t \uXXXX). */
    private def unescapeJson(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'u' if i + 5 < s.length =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => sb += other; i += 2
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }
  }

  /** A transport that accepts request headers (real HTTP clients do);
    * [[authed]] binds an [[Auth]] onto it, yielding the plain
    * [[Transport]] the paginator loop consumes. */
  type HeaderTransport = (String, Map[String, String]) => Response

  def authed(t: HeaderTransport, auth: Auth): Transport = url => {
    val withParams = auth.queryParams.foldLeft(url) {
      case (acc, (k, v)) => setParam(acc, k, v)
    }
    t(withParams, auth.headers)
  }

  private def setParam(url: String, key: String, value: String): String = {
    val (base, q) = url.span(_ != '?')
    val params = if (q.isEmpty) Map.empty[String, String]
    else q.drop(1).split("&").filter(_.nonEmpty)
      .map(_.split("=", 2)).map(a => a(0) -> a.lift(1).getOrElse("")).toMap
    val updated = params.updated(key, value)
    base + "?" + updated.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
  }

  /** Incremental request parameters (reference setup_incremental_object,
    * rest_api/config_setup.py:214-260): the cursor window rides the
    * request as query params — `startParam` gets the (lag-aware)
    * last/initial value, `endParam` the backfill bound. Returns the
    * params to merge into the endpoint URL; empty when no window is
    * open yet. Server-side filtering is the REST analog of the JDBC
    * WHERE pushdown: the API returns O(new data), not O(history). */
  def incrementalParams(cfg: graft.incremental.Incremental.Config,
      state: graft.incremental.Incremental.State,
      startParam: String, endParam: Option[String] = None): Map[String, String] = {
    val start = graft.incremental.Incremental.startValue(cfg, state)
      .map(startParam -> _)
    val end = for (p <- endParam; v <- cfg.endValue) yield p -> v
    (start.toSeq ++ end.toSeq).toMap
  }

  /** Apply query params onto a URL (exposed for incremental windows). */
  def withParams(url: String, params: Map[String, String]): String =
    params.toSeq.sortBy(_._1).foldLeft(url) { case (u, (k, v)) => setParam(u, k, v) }

  /** Declarative per-response hooks (reference response_actions,
    * rest_api/config_setup.py:565-671, wired at rest_api/__init__.py:
    * 274): each action is a matcher — status code and/or a content
    * substring; both present means AND (config_setup.py:600-612) —
    * plus what to do on match. Actions are evaluated in declaration
    * order, first match wins:
    *  - [[RespIgnore]] — the reference's `"action": "ignore"`
    *    (IgnoreResponseException, client.py:273-274): pagination stops
    *    CLEANLY and the matched page is NOT landed (a 404-means-empty
    *    endpoint yields whatever earlier pages produced);
    *  - [[RespTransform]] — a callable action (config_setup.py:625-627):
    *    rewrite the response (re-encode, redact a field) and continue
    *    the normal flow.
    * An ERROR status (>= 400) no action matches falls through to the
    * default raise-for-status (config_setup.py:641-643 "fallback_hooks")
    * — except the retryable set (429 + 5xx, the reference session's
    * DEFAULT_RETRY_STATUS, requests/retry.py:39), which is retried up
    * to `maxRetries` times honoring a numeric `Retry-After` header
    * (retry.py:98-125) before raising. */
  sealed trait RespOutcome
  case object RespIgnore extends RespOutcome
  final case class RespTransform(f: Response => Response) extends RespOutcome
  final case class ResponseAction(
      statusCode: Option[Int] = None,
      contentSubstr: Option[String] = None,
      outcome: RespOutcome = RespIgnore) {
    def matches(r: Response): Boolean = (statusCode, contentSubstr) match {
      case (Some(s), Some(c)) => r.status == s && r.body.contains(c)
      case (Some(s), None) => r.status == s
      case (None, Some(c)) => r.body.contains(c)
      case (None, None) => false
    }
  }

  /** Unhandled HTTP error status — the raise-for-status fallback. */
  final class HttpStatusException(val status: Int, val body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  private object IgnoreSignal extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** One request through the response-action / retry pipeline: returns
    * the (possibly transformed) response, throws [[IgnoreSignal]] on an
    * ignore match, [[HttpStatusException]] on an unhandled error after
    * retries are exhausted. `sleep` is injectable so specs don't wait. */
  private def sendWithActions(url: String, transport: Transport,
      actions: Seq[ResponseAction], maxRetries: Int,
      sleep: Long => Unit): Response = {
    var attempt = 0
    while (true) {
      val resp = transport(url)
      actions.find(_.matches(resp)) match {
        case Some(a) => a.outcome match {
          case RespIgnore => throw IgnoreSignal
          case RespTransform(f) => return f(resp)
        }
        case None =>
          if (resp.status == 429 || resp.status >= 500) {
            if (attempt >= maxRetries) throw new HttpStatusException(resp.status, resp.body)
            val retryAfterMs = resp.headers.get("Retry-After")
              .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
            sleep(retryAfterMs.getOrElse(100L << attempt)) // exp backoff fallback
            attempt += 1
          } else if (resp.status >= 400) {
            throw new HttpStatusException(resp.status, resp.body)
          } else return resp
      }
    }
    sys.error("unreachable")
  }

  /** Fetch all pages (driver-side). `maxPages` and `maxTime` are the
    * reference's add_limit page/time variants (items_transform.py:
    * 174-239) applied where they are meaningful on Spark — at the
    * generator: pagination stops after `maxPages` pages or once
    * `maxTime` has elapsed (the page in flight still lands).
    * `stopWhen` is the `can_close` hook (see [[outOfWindowStop]]):
    * when a fetched page satisfies it, that page still lands (its
    * in-window rows are kept by the incremental filter downstream) but
    * no further page is requested. `responseActions` + `maxRetries`
    * run every request through [[sendWithActions]]. */
  def fetchPages(startUrl: String, transport: Transport, paginator: Paginator,
                 maxPages: Int = 10000,
                 maxTime: Option[scala.concurrent.duration.Duration] = None,
                 stopWhen: String => Boolean = _ => false,
                 responseActions: Seq[ResponseAction] = Nil,
                 maxRetries: Int = 3,
                 retrySleep: Long => Unit = Thread.sleep): Seq[String] = {
    val deadline = maxTime.map(t => System.nanoTime() + t.toNanos)
    @tailrec
    def loop(url: String, idx: Int, acc: Vector[String]): Vector[String] = {
      val resp =
        try sendWithActions(url, transport, responseActions, maxRetries, retrySleep)
        catch { case IgnoreSignal => return acc }
      val pages = acc :+ resp.body
      if (idx + 1 >= maxPages || deadline.exists(System.nanoTime() >= _) ||
          stopWhen(resp.body)) pages
      else paginator.next(url, resp, idx) match {
        case Some(nextUrl) => loop(nextUrl, idx + 1, pages)
        case None => pages
      }
    }
    loop(startUrl, 0, Vector.empty)
  }

  /** Declared source ordering by the cursor (reference `row_order`,
    * dlt/extract/incremental/__init__.py:126-133): when the order is
    * known, pagination can CLOSE once the cursor leaves the incremental
    * window instead of walking the full history. */
  sealed trait RowOrder
  object RowOrder {
    case object Asc extends RowOrder
    case object Desc extends RowOrder
  }

  /** The `can_close` page predicate (reference out-of-range flags,
    * dlt/extract/incremental/transform.py:255-263, 505-516): true once a
    * page carries a cursor value OUTSIDE the incremental window on the
    * side the ordering makes terminal —
    *  - descending source + window start: a value below `startValue`
    *    means every later page is older still;
    *  - ascending source + backfill end: a value at/past `endValue`
    *    means every later page is newer still.
    * Without this, a descending API (the common "latest first" shape)
    * fetches its entire history on every incremental run. The closing
    * page itself is kept — the incremental window filter drops its
    * out-of-range rows — matching the reference, which closes the pipe
    * but loads the in-range remainder of the batch. Values compare
    * numerically when both sides parse as numbers, else as strings
    * (ISO timestamps order lexicographically). */
  def outOfWindowStop(rowOrder: RowOrder, cursorField: String,
      startValue: Option[String] = None, endValue: Option[String] = None,
      itemsPath: Option[String] = None): String => Boolean = { body =>
    val vals = cursorValues(body, itemsPath, cursorField)
    rowOrder match {
      case RowOrder.Desc => startValue.exists(s => vals.exists(v => cmpVals(v, s) < 0))
      case RowOrder.Asc => endValue.exists(e => vals.exists(v => cmpVals(v, e) >= 0))
    }
  }

  /** [[outOfWindowStop]] wired from an incremental config + state the
    * way [[incrementalParams]] is: start = the (lag-aware) resume
    * value, end = the backfill bound. */
  def outOfWindowStop(cfg: graft.incremental.Incremental.Config,
      state: graft.incremental.Incremental.State, rowOrder: RowOrder,
      itemsPath: Option[String]): String => Boolean =
    outOfWindowStop(rowOrder, cfg.cursorColumn,
      startValue = graft.incremental.Incremental.startValue(cfg, state),
      endValue = cfg.endValue, itemsPath = itemsPath)

  private def cmpVals(a: String, b: String): Int =
    (scala.util.Try(BigDecimal(a)), scala.util.Try(BigDecimal(b))) match {
      case (scala.util.Success(x), scala.util.Success(y)) => x.compare(y)
      case _ => a.compareTo(b)
    }

  /** Cursor values of every item on a page (driver-side Jackson walk —
    * pages are bounded API responses, never bulk data). `itemsPath`
    * and `cursorField` accept dotted paths. */
  private def cursorValues(body: String, itemsPath: Option[String],
      cursorField: String): Seq[String] = {
    import com.fasterxml.jackson.databind.JsonNode
    def at(node: JsonNode, path: String): Option[JsonNode] =
      path.split("\\.").foldLeft(Option(node)) { (n, seg) =>
        n.flatMap(x => Option(x.get(seg)))
      }
    scala.util.Try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val items = itemsPath.fold(Option(root))(p => at(root, p)).toSeq
      val nodes = items.flatMap { n =>
        if (n.isArray) (0 until n.size).map(n.get) else Seq(n)
      }
      nodes.flatMap(n => at(n, cursorField))
        .filterNot(_.isNull).map(_.asText)
    }.getOrElse(Nil)
  }

  /** Endpoint → DataFrame: pages are parsed as JSON arrays/objects with
    * distributed inference. `itemsPath` selects the array inside each page
    * body (e.g. "data"). */
  def read(spark: SparkSession, startUrl: String, transport: Transport,
           paginator: Paginator, itemsPath: Option[String] = None,
           maxPages: Int = 10000,
           responseActions: Seq[ResponseAction] = Nil): DataFrame = {
    import spark.implicits._
    val pages = fetchPages(startUrl, transport, paginator, maxPages,
      responseActions = responseActions)
    val raw = spark.read.json(spark.createDataset(pages))
    itemsPath match {
      case Some(p) =>
        val exploded = raw.select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col(p)).as("__item"))
        exploded.select("__item.*")
      case None => raw
    }
  }

  /** One endpoint in a declarative REST source (reference endpoint
    * configs, rest_api/config_setup.py:302-383): `url` may hold a
    * `{param}` placeholder fed from `parentKey` of the `parent`
    * endpoint's rows. */
  final case class Endpoint(
      name: String,
      url: String,
      parent: Option[String] = None,
      parentKey: Option[String] = None,
      paginator: Paginator = SinglePage,
      itemsPath: Option[String] = None,
      responseActions: Seq[ResponseAction] = Nil)

  /** Resolve a whole endpoint dependency graph (reference rest_api
    * source build: endpoints form a tree, children resolve path params
    * from parent rows — any depth). Returns one DataFrame per
    * endpoint; parents are fetched before children (topological
    * order), cycles and unknown parents are rejected. */
  def readGraph(spark: SparkSession, endpoints: Seq[Endpoint],
      transport: Transport, maxPages: Int = 1000): Map[String, DataFrame] = {
    val byName = endpoints.map(e => e.name -> e).toMap
    require(byName.size == endpoints.size, "duplicate endpoint names")
    endpoints.foreach(e => e.parent.foreach(p =>
      require(byName.contains(p), s"endpoint ${e.name}: unknown parent $p")))
    var done = Map.empty[String, DataFrame]
    var remaining = endpoints
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.parent.forall(done.contains))
      require(ready.nonEmpty,
        s"endpoint cycle among: ${blocked.map(_.name).mkString(", ")}")
      ready.foreach { e =>
        val df = e.parent match {
          case None =>
            read(spark, e.url, transport, e.paginator, e.itemsPath, maxPages,
              e.responseActions)
          case Some(p) =>
            val key = e.parentKey.getOrElse(throw new IllegalArgumentException(
              s"endpoint ${e.name}: parent set but no parentKey"))
            readChild(spark, done(p), key, e.url, transport, e.paginator,
              e.itemsPath, maxPages, e.responseActions)
        }
        done += e.name -> df
      }
      remaining = blocked
    }
    done
  }

  /** Child endpoint resolved per parent item (reference resolved path
    * params, config_setup.py:302-383): for each distinct value of
    * `parentKey` in `parent`, fetch `urlTemplate` with `{id}` substituted.
    * The fan-out loop is driver-side (like the reference); each child page
    * set lands in one distributed frame. */
  def readChild(spark: SparkSession, parent: DataFrame, parentKey: String,
                urlTemplate: String, transport: Transport, paginator: Paginator,
                itemsPath: Option[String] = None, maxPages: Int = 1000,
                responseActions: Seq[ResponseAction] = Nil): DataFrame = {
    import spark.implicits._
    val ids = parent.select(parentKey).distinct().collect().map(_.get(0).toString)
    // the placeholder may be the generic {id} or the parent column name
    // (a per-parent 404 under an ignore action yields that child empty,
    // the reference's missing-subresource shape)
    val pages = ids.toSeq.flatMap { id =>
      val url = urlTemplate.replace("{id}", id).replace(s"{$parentKey}", id)
      fetchPages(url, transport, paginator, maxPages,
        responseActions = responseActions)
    }
    spark.read.json(spark.createDataset(pages)) match {
      case raw if itemsPath.isDefined =>
        raw.select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col(itemsPath.get)).as("__item"))
          .select("__item.*")
      case raw => raw
    }
  }
}
