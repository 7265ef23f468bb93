package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference
import scala.jdk.CollectionConverters._
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.datatables._

/** S1/S4 wire-protocol proof: the HTTP transport's POST body must be
  * field-for-field the payload the reference client sends
  * (/root/reference/clients/exclusion_requests.py:78-90, template
  * /root/reference/config.py:23-30) — column descriptors with
  * data=index, searchable=true + search.value only on the searched
  * column, order:[{column,dir}], start/length — and the session
  * headers from the CSRF/login bootstrap must ride along. Proven
  * against an in-process HTTP server (zero egress), end-to-end
  * through the DSv2 source so Catalyst's pushdowns land on the wire.
  */
class HttpTransportSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val columns = Seq("ID", "Company", "Product", "HTSUSCode")
  private val rows = (1 to 120).map(i =>
    Seq(f"$i%06d", s"Co${i % 7}", s"P$i", s"72${i % 5}"))

  // last request seen by the fake portal's DataTables endpoint
  private val lastBody = new AtomicReference[String]("")
  private val lastHeaders = new AtomicReference[Map[String, String]](Map.empty)

  private var server: HttpServer = _
  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, status: Int, body: String,
      headers: (String, String)*): Unit = {
      headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    // anonymous base page: cookie jar + CSRF token (reference :11-23)
    server.createContext("/", (ex: HttpExchange) =>
      respond(ex, 200,
        """<html><form><input name="__RequestVerificationToken" value="anon-tok"/></form></html>""",
        "Set-Cookie" -> "ARRAffinity=abc; Path=/",
        "Set-Cookie" -> ".AspNetCore.Antiforgery=xyz; HttpOnly"))
    // login POST: 302 + Location + session cookie (reference :56-69)
    server.createContext("/Identity/Account/Login", (ex: HttpExchange) =>
      respond(ex, 302, "",
        "Location" -> "/welcome",
        "Set-Cookie" -> ".AspNetCore.Identity=idcookie; HttpOnly"))
    // post-login redirect target: fresh CSRF token (reference :71-73)
    server.createContext("/welcome", (ex: HttpExchange) =>
      respond(ex, 200,
        """<html><form><input name="__RequestVerificationToken" value="auth-tok"/></form></html>"""))
    // the DataTables endpoint: record the request, serve the envelope
    server.createContext("/index", (ex: HttpExchange) => {
      val body = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
      lastBody.set(body)
      lastHeaders.set(ex.getRequestHeaders.asScala.map {
        case (k, vs) => k.toLowerCase -> vs.asScala.mkString(",")
      }.toMap)
      val req = JsonMethods.parse(body)
      val JInt(start) = (req \ "start"): @unchecked
      val JInt(length) = (req \ "length"): @unchecked
      val searchVal = (req \ "columns").children.collectFirst {
        case c if (c \ "searchable") == JBool(true) => c \ "search" \ "value"
      }.collect { case JString(v) if v.nonEmpty => v }
      val filtered = searchVal.fold(rows)(v => rows.filter(_(3) == v))
      val page = filtered.slice(start.toInt, start.toInt + length.toInt)
      val data = page.map(r => s"""[${r.map(c => s""""$c"""").mkString(",")}]""")
        .mkString("[", ",", "]")
      respond(ex, 200,
        s"""{"draw":1,"recordsTotal":${rows.size},"recordsFiltered":${filtered.size},"data":$data}""",
        "Content-Type" -> "application/json")
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def parsed = JsonMethods.parse(lastBody.get())

  test("payload is field-for-field the reference's POST body " +
    "(column descriptors, search.value, order, start/length)") {
    val t = HttpTransport(s"$base/index?handler=SummaryView", columns, Map.empty)
    val body = JsonMethods.parse(t.payload(PageRequest(
      columns, Some("HTSUSCode"), Some("722"), 40, 20,
      order = Seq("HTSUSCode" -> false))))
    assert((body \ "draw") == JInt(1))
    // one descriptor per column, data = index, name = column
    val cols = (body \ "columns").children
    assert(cols.length == 4)
    cols.zipWithIndex.foreach { case (c, i) =>
      assert((c \ "data") == JInt(i))
      assert((c \ "name") == JString(columns(i)))
      assert((c \ "orderable") == JBool(false))
      assert((c \ "search" \ "regex") == JBool(false))
    }
    // only the searched column is searchable and carries the value
    // (exclusion_requests.py:80-82)
    assert((cols(3) \ "searchable") == JBool(true))
    assert((cols(3) \ "search" \ "value") == JString("722"))
    cols.take(3).foreach { c =>
      assert((c \ "searchable") == JBool(false))
      assert((c \ "search" \ "value") == JString(""))
    }
    // order maps the column NAME to its descriptor index + dir
    assert((body \ "order") == JArray(List(
      JObject("column" -> JInt(3), "dir" -> JString("desc")))))
    assert((body \ "start") == JInt(40) && (body \ "length") == JInt(20))
    // the global search template rides along untouched (config.py:29)
    assert((body \ "search" \ "value") == JString(""))
    assert((body \ "search" \ "regex") == JBool(false))
  }

  test("no pushed order keeps the template default order:[{column:0,dir:desc}] " +
    "(config.py:26)") {
    val t = HttpTransport(s"$base/index", columns, Map.empty)
    val body = JsonMethods.parse(t.payload(PageRequest(columns, None, None, 0, 1000)))
    assert((body \ "order") == JArray(List(
      JObject("column" -> JInt(0), "dir" -> JString("desc")))))
  }

  test("order column absent from the descriptors fails loudly instead of " +
    "silently sorting by column 0") {
    val t = HttpTransport(s"$base/index", columns, Map.empty)
    val e = intercept[IllegalArgumentException] {
      t.payload(PageRequest(Seq("Company"), None, None, 0, 5,
        order = Seq("HTSUSCode" -> false)))
    }
    assert(e.getMessage.contains("HTSUSCode"))
  }

  test("session bootstrap over real HTTP: cookie munging + CSRF scrape + " +
    "post-login token re-scrape") {
    val anon = SessionBootstrap.bootstrap(UrlConnectionHttpClient, base)
    assert(anon.rvToken.contains("anon-tok"))
    // comma-joined Set-Cookie headers munged to first ;-segment each
    assert(anon.cookieString == "ARRAffinity=abc; .AspNetCore.Antiforgery=xyz")
    val auth = SessionBootstrap.login(UrlConnectionHttpClient, base, anon, "u", "p")
    assert(auth.isAuthenticated)
    assert(auth.rvToken.contains("auth-tok"))
    assert(auth.cookieString.contains(".AspNetCore.Identity=idcookie"))
  }

  test("fetch + count hit the wire with session headers and parse the envelope") {
    val anon = SessionBootstrap.bootstrap(UrlConnectionHttpClient, base)
    val auth = SessionBootstrap.login(UrlConnectionHttpClient, base, anon, "u", "p")
    val t = HttpTransport(s"$base/index?handler=SummaryView", columns,
      auth.headers(base))
    assert(t.count(Some("HTSUSCode"), Some("722")) ==
      rows.count(_(3) == "722"))
    val got = t.fetch(PageRequest(columns, Some("HTSUSCode"), Some("722"), 0, 10))
    assert(got == rows.filter(_(3) == "722").take(10))
    val hs = lastHeaders.get()
    assert(hs("content-type") == "application/json")
    assert(hs("cookie").contains(".AspNetCore.Identity=idcookie"))
    assert(hs("requestverificationtoken") == "auth-tok")
  }

  test("DSv2 end-to-end over HTTP: Catalyst's pushed filter lands in the wire " +
    "payload as search.value") {
    TransportRegistry.register("erc_http",
      HttpTransport(s"$base/index?handler=SummaryView", columns, Map.empty))
    val df = spark.read.format("graft.sources.datatables.DefaultSource")
      .option("transport", "erc_http")
      .option("columns", columns.mkString(","))
      .option("searchableColumn", "HTSUSCode")
      .option("pageSize", "1000")
      .load()
      .filter(col("HTSUSCode") === "721")
    assert(df.count() == rows.count(_(3) == "721"))
    val cols = (parsed \ "columns").children
    assert(cols.exists(c => (c \ "searchable") == JBool(true) &&
      (c \ "search" \ "value") == JString("721")),
      s"pushed filter missing from wire payload: ${lastBody.get()}")
  }
}
