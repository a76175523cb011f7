package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** ArcGIS-sharing-REST client (`java.net.http`) — the live transport
  * behind the Portal model's surfaces. Speaks the documented REST
  * routes the reference drives through the arcgis SDK
  * (`agol_wrangler.py` `gis.content.*`, `update_manager.py` search):
  *
  *   POST <root>/sharing/rest/generateToken                  → {token}
  *   GET  <root>/sharing/rest/search?q=…&num=…&f=json        → {results}
  *   POST <root>/sharing/rest/content/users/<u>/addItem      → {id} | 409
  *   POST …/content/users/<u>/items/<id>/update              → {success}
  *   POST …/content/users/<u>/items/<id>/publish             → {services}
  *
  * Every call carries the session token (fetched lazily, refreshed on
  * a 498/499 token error) and `f=json`. [[addOrRetry]] reproduces the
  * reference's 409-conflict rename loop (`agol_wrangler.py:527-568`):
  * title `_1`.. `_{max-1}`, then fail. Tag search uses the
  * `tags:"…" AND tags:"…"` query grammar (`update_manager.py:30-46`).
  */
class PortalRestClient(root: String, username: String, password: String,
    connectTimeoutSec: Long = 30, readTimeoutSec: Long = 60) {

  case class ItemRef(id: String, title: String, itemType: String, tags: Seq[String])

  private val base = root.stripSuffix("/") + "/sharing/rest"
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(connectTimeoutSec)).build()

  private var token: Option[String] = None

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def form(params: Seq[(String, String)]): String =
    params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")

  private def send(req: HttpRequest): JsonNode = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    mapper.readTree(resp.body())
  }

  /** POST generateToken — AGOL's username/password login. */
  def generateToken(): String = {
    val req = HttpRequest.newBuilder(URI.create(s"$base/generateToken"))
      .timeout(Duration.ofSeconds(readTimeoutSec))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form(Seq(
        "username" -> username, "password" -> password,
        "referer" -> root, "f" -> "json"))))
      .build()
    val node = send(req)
    if (!node.has("token"))
      throw new java.io.IOException(s"generateToken failed: $node")
    val t = node.get("token").asText()
    token = Some(t)
    t
  }

  private def withToken[A](call: String => JsonNode): JsonNode = {
    val t = token.getOrElse(generateToken())
    val node = call(t)
    if (node.has("error") &&
        Set(498, 499).contains(node.get("error").path("code").asInt())) {
      // expired/invalid token → re-login once, like the SDK session
      call(generateToken())
    } else node
  }

  private def get(path: String, params: Seq[(String, String)]): JsonNode =
    withToken { t =>
      val q = form(params ++ Seq("token" -> t, "f" -> "json"))
      send(HttpRequest.newBuilder(URI.create(s"$base$path?$q"))
        .timeout(Duration.ofSeconds(readTimeoutSec)).GET().build())
    }

  private def post(path: String, params: Seq[(String, String)]): JsonNode =
    withToken { t =>
      send(HttpRequest.newBuilder(URI.create(s"$base$path"))
        .timeout(Duration.ofSeconds(readTimeoutSec))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          form(params ++ Seq("token" -> t, "f" -> "json"))))
        .build())
    }

  private def parseItem(n: JsonNode): ItemRef = {
    val tags = (0 until n.path("tags").size())
      .map(i => n.path("tags").get(i).asText())
    ItemRef(n.path("id").asText(), n.path("title").asText(),
      n.path("type").asText(), tags)
  }

  /** S12/S13 — tag search with the reference's query grammar: all tags
    * must match (`update_manager.py:30-46`). */
  def searchByTags(tags: Seq[String], maxItems: Int = 5000): Seq[ItemRef] = {
    val q = tags.map(t => s"""tags:"$t"""").mkString(" AND ")
    val node = get("/search", Seq("q" -> q, "num" -> maxItems.toString))
    (0 until node.path("results").size())
      .map(i => parseItem(node.path("results").get(i)))
  }

  /** Raw addItem — surfaces the portal's 409 on a title conflict. */
  def addItem(title: String, itemType: String, tags: Seq[String]): String = {
    val node = post(s"/content/users/$username/addItem", Seq(
      "title" -> title, "type" -> itemType, "tags" -> tags.mkString(",")))
    if (node.has("error")) {
      val code = node.get("error").path("code").asInt()
      throw new java.io.IOException(
        s"addItem failed ($code): ${node.get("error").path("message").asText()}")
    }
    node.path("id").asText()
  }

  /** K5 — the reference's 409-retry loop: on "409 … already exists",
    * retry with `title_1`, `title_2`, …; anything else rethrows. */
  def addOrRetry(title: String, itemType: String, tags: Seq[String],
      maxAttempts: Int = 10): String = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val candidate = if (attempt == 0) title else s"${title}_$attempt"
      try return addItem(candidate, itemType, tags)
      catch {
        case e: java.io.IOException
            if e.getMessage.contains("409") &&
              e.getMessage.contains("already exists") =>
          attempt += 1
      }
    }
    throw new IllegalStateException("Max attempts reached for adding item with retry.")
  }

  /** Item property update (also the K11 touch vehicle). */
  def update(itemId: String, props: Map[String, String]): Boolean = {
    val node = post(s"/content/users/$username/items/$itemId/update",
      props.toSeq)
    node.path("success").asBoolean(false)
  }

  /** Publish an uploaded item as a hosted service; returns the service
    * item id. */
  def publish(itemId: String): String = {
    val node = post(s"/content/users/$username/items/$itemId/publish", Nil)
    val services = node.path("services")
    if (services.size() == 0)
      throw new java.io.IOException(s"publish returned no services: $node")
    services.get(0).path("serviceItemId").asText()
  }
}
