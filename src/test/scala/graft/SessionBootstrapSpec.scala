package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.datatables.SessionBootstrap
import graft.sources.datatables.SessionBootstrap.{HttpClient, HttpResponse, SessionState}

/** S4 state machine: Fresh → Anonymous → Authenticated against a
  * scripted fake HTTP layer (zero egress) — the reference's
  * constructor + login flow (exclusion_requests.py:11-34,56-75).
  */
class SessionBootstrapSpec extends AnyFunSuite {

  private val base = "https://portal.test"

  private class ScriptedHttp extends HttpClient {
    var posts = List.empty[(String, Map[String, String], Map[String, String])]
    var gets = List.empty[(String, Map[String, String])]
    override def get(url: String, headers: Map[String, String]): HttpResponse = {
      gets :+= (url -> headers)
      url match {
        case `base` => HttpResponse(200,
          Map("Set-Cookie" -> "ARRAffinity=abc; Path=/; HttpOnly, session=xyz; Secure"),
          """<html><form><input type="hidden" name="__RequestVerificationToken"
            | value="anon-token-1"/></form></html>""".stripMargin)
        case u if u == s"$base/dashboard" => HttpResponse(200, Map.empty,
          """<form><input name="__RequestVerificationToken" value='auth-token-2'/></form>""")
        case u => HttpResponse(404, Map.empty, s"no route $u")
      }
    }
    override def post(url: String, form: Map[String, String],
      headers: Map[String, String]): HttpResponse = {
      posts :+= ((url, form, headers))
      if (form("Input.Password") == "right") HttpResponse(302,
        Map("Set-Cookie" -> "auth=tok99; HttpOnly", "Location" -> "/dashboard"), "")
      else HttpResponse(401, Map.empty, "denied")
    }
  }

  test("bootstrap captures munged cookie jar and scraped CSRF token") {
    val http = new ScriptedHttp
    val s = SessionBootstrap.bootstrap(http, base)
    assert(s.cookieString == "ARRAffinity=abc; session=xyz")
    assert(s.rvToken.contains("anon-token-1"))
    assert(!s.isAuthenticated)
  }

  test("login posts credentials + current token, merges cookies, re-scrapes token") {
    val http = new ScriptedHttp
    val anon = SessionBootstrap.bootstrap(http, base)
    val auth = SessionBootstrap.login(http, base, anon, "u@x.test", "right")
    // POST went to the login route with the ANONYMOUS token in the form
    val (url, form, headers) = http.posts.head
    assert(url == s"$base/Identity/Account/Login")
    assert(form("__RequestVerificationToken") == "anon-token-1")
    assert(headers("Content-Type") == "application/x-www-form-urlencoded")
    // cookie jar = old + response cookies; token re-scraped from redirect
    assert(auth.cookieString == "ARRAffinity=abc; session=xyz; auth=tok99")
    assert(auth.rvToken.contains("auth-token-2"))
    assert(auth.isAuthenticated)
    // the redirect GET carried the merged cookie jar
    val redirectGet = http.gets.last
    assert(redirectGet._1 == s"$base/dashboard")
    assert(redirectGet._2("Cookie") == "ARRAffinity=abc; session=xyz; auth=tok99")
  }

  test("failed login raises and leaves no authenticated state") {
    val http = new ScriptedHttp
    val anon = SessionBootstrap.bootstrap(http, base)
    assertThrows[IllegalStateException](
      SessionBootstrap.login(http, base, anon, "u@x.test", "wrong"))
  }

  test("cookie munging is faithful to the reference's split semantics") {
    assert(SessionBootstrap.formatCookieString("a=1; Path=/, b=2; Secure, c=3")
      == "a=1; b=2; c=3")
    assert(SessionBootstrap.formatCookieString("solo=v; HttpOnly") == "solo=v")
  }

  test("token scrape: first matching input wins; absent token is None") {
    val html = """<input name="other" value="x"/>
                 |<input value="t1" name="__RequestVerificationToken"/>
                 |<input name="__RequestVerificationToken" value="t2"/>""".stripMargin
    assert(SessionBootstrap.findCsrfToken(html).contains("t1"))
    assert(SessionBootstrap.findCsrfToken("<html>no form</html>").isEmpty)
  }

  test("session headers carry cookie + token like the reference client") {
    val s = SessionState("c=1", Some("tok"), isAuthenticated = false)
    val h = s.headers(base)
    assert(h("Cookie") == "c=1" && h("RequestVerificationToken") == "tok")
    assert(h("Origin") == base && h("Referer") == s"$base/")
  }
}
