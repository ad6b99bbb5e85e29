package graft.fia

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}

/** Artifact publication — the S6 surface (`scripts/
  * 03-upload_parquet_db_zenodo.R:1-21`: new-version deposit of the
  * consolidated database file to an existing Zenodo record, replacing
  * the previous version's files, then publish).
  *
  * Re-expressed as a small JVM client over Zenodo's public REST API
  * (`/api/deposit/depositions` — the documented, public interface the
  * reference's zen4R wrapper also drives):
  *
  *   1. `POST …/{id}/actions/newversion` → draft deposition;
  *   2. `DELETE` each file carried over from the previous version
  *      (`delete_latest_files = TRUE` analog);
  *   3. `PUT` the artifact into the draft's file bucket;
  *   4. `POST …/{draftId}/actions/publish`.
  *
  * The token comes from the environment (`ZENODO_TOKEN`, as in
  * `zenodo_setup.R:9`) and is sent as a bearer header. `baseUrl` is a
  * parameter so tests drive the identical client against a local JDK
  * HttpServer — no network in CI.
  *
  * JSON handling is deliberately minimal-field (regex extraction of
  * `latest_draft`, `bucket`, and file ids from responses whose shape
  * the Zenodo API documents); it is NOT a general JSON parser.
  */
object Publish {

  final case class Deposit(draftId: String, fileNames: Seq[String])

  private def client: HttpClient = HttpClient.newHttpClient()

  private def req(url: String, token: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(url))
      .header("Authorization", s"Bearer $token")

  private def send(r: HttpRequest, tolerate: Set[Int] = Set.empty): String = {
    val resp = client.send(r, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300 && !tolerate.contains(resp.statusCode()))
      throw new RuntimeException(s"HTTP ${resp.statusCode()} from ${r.uri()}: ${resp.body().take(500)}")
    resp.body()
  }

  /** First capture of `"key": "value"` for a string field. */
  private[fia] def jsonStr(body: String, key: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\"([^\"]+)\"").r
      .findFirstMatchIn(body).map(_.group(1))

  /** All captures of `"key": "value"` (e.g. every file's id). */
  private[fia] def jsonStrAll(body: String, key: String): Seq[String] =
    ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\"([^\"]+)\"").r
      .findAllMatchIn(body).map(_.group(1)).toSeq

  /** Step 1: open a new-version draft of deposition `id`. */
  def newVersion(baseUrl: String, id: String, token: String): String = {
    val body = send(req(s"$baseUrl/api/deposit/depositions/$id/actions/newversion", token)
      .POST(HttpRequest.BodyPublishers.noBody()).build())
    jsonStr(body, "latest_draft")
      .map(_.split("/").last)
      .getOrElse(throw new RuntimeException(s"no latest_draft link in: ${body.take(300)}"))
  }

  /** The `"files": [...]` array slice of a deposition body: bracket-
    * matched (string-aware) so nested objects inside file entries don't
    * end the slice early. Returns None when the body has no files array. */
  private[fia] def filesBlock(body: String): Option[String] =
    "\"files\"\\s*:\\s*\\[".r.findFirstMatchIn(body).map { m =>
      val start = m.end - 1 // at '['
      var depth = 0; var i = start; var end = body.length
      var inStr = false; var esc = false; var done = false
      while (i < body.length && !done) {
        val c = body.charAt(i)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) { end = i + 1; done = true }
          case _   => ()
        }
        i += 1
      }
      body.substring(start, end)
    }

  /** Step 2: list the draft's carried-over files and its upload bucket.
    * File ids are collected ONLY from the `"files"` array — a deposition
    * body can carry string `"id"` fields elsewhere (grant/license
    * objects in metadata), and treating those as file ids would DELETE
    * nonexistent paths and abort the flow after the draft was created. */
  def draftInfo(baseUrl: String, draftId: String, token: String): (String, Seq[String]) = {
    val body = send(req(s"$baseUrl/api/deposit/depositions/$draftId", token).GET().build())
    val bucket = jsonStr(body, "bucket")
      .getOrElse(throw new RuntimeException(s"no bucket link in: ${body.take(300)}"))
    val fileIds = filesBlock(body).map(jsonStrAll(_, "id")).getOrElse(Nil)
    (bucket, fileIds.filterNot(_ == draftId))
  }

  /** Step 2b: delete one carried-over file from the draft. A 404 is
    * tolerated — the file being already gone is the desired end state. */
  def deleteFile(baseUrl: String, draftId: String, fileId: String, token: String): Unit = {
    send(req(s"$baseUrl/api/deposit/depositions/$draftId/files/$fileId", token)
      .DELETE().build(), tolerate = Set(404))
    ()
  }

  /** Step 3: stream the artifact into the draft's bucket. */
  def uploadFile(bucketUrl: String, artifact: Path, token: String): Unit = {
    send(req(s"$bucketUrl/${artifact.getFileName}", token)
      .PUT(HttpRequest.BodyPublishers.ofFile(artifact)).build())
    ()
  }

  /** Step 4: publish the draft. */
  def publish(baseUrl: String, draftId: String, token: String): Unit = {
    send(req(s"$baseUrl/api/deposit/depositions/$draftId/actions/publish", token)
      .POST(HttpRequest.BodyPublishers.noBody()).build())
    ()
  }

  /** The full `depositRecordVersion(delete_latest_files = TRUE, files,
    * publish = TRUE)` flow. Returns the draft id that was published. */
  def publishNewVersion(
      baseUrl: String, conceptId: String, artifact: Path, token: String,
      doPublish: Boolean = true): String = {
    require(Files.exists(artifact), s"artifact not found: $artifact")
    val draft = newVersion(baseUrl, conceptId, token)
    val (bucket, oldFiles) = draftInfo(baseUrl, draft, token)
    oldFiles.foreach(deleteFile(baseUrl, draft, _, token))
    uploadFile(bucket, artifact, token)
    if (doPublish) publish(baseUrl, draft, token)
    draft
  }

  /** CLI: `Publish <artifactPath> <depositionId> [baseUrl]`; token from
    * `$ZENODO_TOKEN` (`zenodo_setup.R:9`). */
  def main(args: Array[String]): Unit = {
    val artifact = java.nio.file.Paths.get(args(0))
    val id = args(1)
    val base = if (args.length > 2) args(2) else "https://zenodo.org"
    val token = sys.env.getOrElse("ZENODO_TOKEN",
      throw new RuntimeException("ZENODO_TOKEN not set"))
    val draft = publishNewVersion(base, id, artifact, token)
    println(s"[publish] published draft $draft with ${artifact.getFileName}")
  }
}
