package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI

/** HTTP facade end-to-end: JDK client against the JDK-server routes
  * (query / document / versioning — [ref:server/routes.pl] surface). */
class ServerSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val srv = server.HttpApi.start(spark, sfDir)
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = srv.stop()

  private def get(path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(srv.url(path))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(srv.url(path)))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("info reports the engine") {
    val (code, body) = get("/api/info")
    assert(code == 200)
    val j = JsonMethods.parse(body)
    assert((j \ "api:status") == JString("api:success"))
    assert((j \ "engine") == JString("spark"))
  }

  test("woql over the wire returns reference-shaped bindings") {
    val wire =
      """{"@type":"Triple","subject":{"variable":"S"},
        |"predicate":{"node":"tpch:r_name"},"object":{"variable":"N"}}""".stripMargin
    val (code, body) = post("/api/woql", wire)
    assert(code == 200)
    val j = JsonMethods.parse(body)
    val JArray(bindings) = (j \ "bindings"): @unchecked
    assert(bindings.size == 5) // five regions
    // IRIs plain, literals typed
    assert(bindings.forall(b => (b \ "S").isInstanceOf[JString]))
    assert(bindings.forall(b => (b \ "N" \ "@type") == JString("xsd:string")))
  }

  test("document read by id") {
    val (code, body) = get("/api/document?id=tpch:region/0")
    assert(code == 200)
    val j = JsonMethods.parse(body)
    assert((j \ "r_regionkey") == JString("0"))
    assert((j \ "r_name").isInstanceOf[JString])
  }

  test("document insert commits; branch list/create work") {
    val docs =
      """{"name":"alpha","size":1}
        |{"name":"beta","size":2}""".stripMargin
    val (code, body) = post("/api/document?type=Thing&key=name", docs)
    assert(code == 200)
    val j = JsonMethods.parse(body)
    val JArray(ids) = (j \ "ids"): @unchecked
    assert(ids == List(JString("doc:Thing/alpha"), JString("doc:Thing/beta")))

    val (c2, b2) = get("/api/branch")
    assert(c2 == 200)
    val mainHead = (JsonMethods.parse(b2) \ "branches" \ "main")
    assert(mainHead.isInstanceOf[JString])

    val (c3, b3) = post("/api/branch?name=dev&from=main", "")
    assert(c3 == 200)
    assert((JsonMethods.parse(b3) \ "head") == mainHead)
  }

  test("graphql endpoint compiles into the engine") {
    val q = """{"query": "{ Region(orderBy: {r_name: ASC}, limit: 2) { r_name } }"}"""
    val (code, body) = post("/api/graphql", q)
    assert(code == 200)
    val JArray(rows) = (JsonMethods.parse(body) \ "data" \ "Region"): @unchecked
    assert(rows.map(r => r \ "r_name") == List(JString("AFRICA"), JString("AMERICA")))
  }

  test("a broken request yields api:failure with 400") {
    val (code, body) = post("/api/woql", "{not json")
    assert(code == 400)
    assert((JsonMethods.parse(body) \ "api:status") == JString("api:failure"))
  }
}
