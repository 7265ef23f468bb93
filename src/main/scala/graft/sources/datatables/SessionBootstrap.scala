package graft.sources.datatables

/** S4: CSRF/session bootstrap for the DataTables portal, as a typed
  * state machine over an abstract HTTP client (SURVEY §2.1 S4;
  * /root/reference/clients/exclusion_requests.py:11-34,56-75).
  *
  * The reference interleaves this with requests calls in its client
  * constructor and login(); here the protocol is a pure function of
  * (state, response) so it can be spec'd without a network — the
  * shape a real connector's `open()` calls with an actual HTTP layer.
  * Zero-egress build: only [[HttpClient]] fakes exist in tests; the
  * fixture transport used by the DSv2 source needs no session at all.
  *
  * State machine:
  *
  *   Fresh --bootstrap (GET base)--> Anonymous(cookies, csrf)
  *     cookies  = munged Set-Cookie (:13, _format_cookie_string :31-34)
  *     csrf     = first <input name="__RequestVerificationToken"> value
  *                scraped from the page body (:14, :25-29)
  *
  *   Anonymous --login (POST credentials + csrf)--> Authenticated
  *     POST body Input.Email / Input.Password / __RequestVerificationToken
  *       with redirects NOT followed (:56-63)
  *     non-2xx/3xx → error "Login failed" (:64-65)
  *     cookies  = old cookies + "; " + munged response cookies (:67-69)
  *     then GET base + Location header and RE-SCRAPE the csrf token
  *       from the redirect body (:71-73) — the post-login token differs
  *       from the anonymous one
  */
object SessionBootstrap {

  /** One HTTP exchange — the minimal surface the state machine needs.
    * Implementations must not follow redirects on POST (the login
    * Location header carries the token re-scrape target).
    */
  trait HttpClient {
    def get(url: String, headers: Map[String, String]): HttpResponse
    def post(url: String, form: Map[String, String],
      headers: Map[String, String]): HttpResponse
  }

  case class HttpResponse(status: Int, headers: Map[String, String], body: String) {
    def ok: Boolean = status >= 200 && status < 400 // requests .ok incl. redirects (:64)
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  /** Session state carried between calls (the reference's mutable
    * instance fields :13-23, made explicit).
    */
  case class SessionState(
    cookieString: String,
    rvToken: Option[String],
    isAuthenticated: Boolean) {
    /** The headers every subsequent protocol call sends (:15-22). */
    def headers(baseUri: String): Map[String, String] = Map(
      "Cookie" -> cookieString,
      "RequestVerificationToken" -> rvToken.getOrElse(""),
      "Accept" -> "*/*",
      "Origin" -> baseUri,
      "Referer" -> s"$baseUri/")
  }

  /** F4 cookie munging, faithful to _format_cookie_string (:31-34):
    * split the Set-Cookie header on ',', keep each cookie's first
    * ';'-segment, trim, join with "; ". Documented drift kept
    * bug-compatible: a cookie attribute containing a comma (e.g.
    * `Expires=Wed, 21 Oct ...`) splits wrongly — the portal's cookies
    * don't carry such attributes, and the reference has the same
    * behavior.
    */
  def formatCookieString(setCookie: String): String =
    setCookie.split(',').map(_.split(';')(0).trim).mkString("; ")

  /** First `<input name="__RequestVerificationToken">`'s value attr,
    * scraped from page HTML (_find_csrf_token :25-29); None when the
    * page carries no token (the reference returns None too).
    */
  def findCsrfToken(html: String): Option[String] = {
    val tag = "(?i)<input[^>]*>".r.findAllIn(html)
      .find(_.matches("""(?is).*\sname\s*=\s*["']__RequestVerificationToken["'].*"""))
    tag.flatMap { t =>
      "(?is)\\svalue\\s*=\\s*\"([^\"]*)\"".r.findFirstMatchIn(t)
        .orElse("(?is)\\svalue\\s*=\\s*'([^']*)'".r.findFirstMatchIn(t))
        .map(_.group(1))
    }
  }

  /** Fresh → Anonymous: GET the base page, capture cookie jar + CSRF
    * token (:11-23).
    */
  def bootstrap(http: HttpClient, baseUri: String): SessionState = {
    val r = http.get(baseUri, Map.empty)
    SessionState(
      cookieString = r.header("Set-Cookie").map(formatCookieString).getOrElse(""),
      rvToken = findCsrfToken(r.body),
      isAuthenticated = false)
  }

  /** Anonymous → Authenticated: POST the login form with the current
    * token, merge response cookies, follow the Location redirect once
    * and re-scrape the token from its body (:56-75).
    */
  def login(http: HttpClient, baseUri: String, state: SessionState,
    username: String, password: String): SessionState = {
    val body = Map(
      "Input.Email" -> username,
      "Input.Password" -> password,
      "__RequestVerificationToken" -> state.rvToken.getOrElse(""))
    val headers = state.headers(baseUri) +
      ("Content-Type" -> "application/x-www-form-urlencoded")
    val res = http.post(s"$baseUri/Identity/Account/Login", body, headers)
    if (!res.ok) throw new IllegalStateException("Login failed")
    val mergedCookies = state.cookieString + "; " +
      res.header("Set-Cookie").map(formatCookieString).getOrElse("")
    val location = res.header("Location").getOrElse(
      throw new IllegalStateException("Login response carried no redirect"))
    val redirect = http.get(s"$baseUri$location",
      state.headers(baseUri) + ("Cookie" -> mergedCookies))
    SessionState(
      cookieString = mergedCookies,
      rvToken = findCsrfToken(redirect.body),
      isAuthenticated = true)
  }
}
