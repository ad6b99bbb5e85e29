package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import scala.collection.mutable
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.fia.Publish

/** S6 publication flow against a local HTTP fixture implementing the
  * Zenodo deposit shape — the real client path (new version → delete
  * carried-over files → bucket upload → publish), no network. */
class PublishSpec extends AnyFunSuite {

  private def withServer(test: (String, mutable.Buffer[String], mutable.Map[String, Array[Byte]]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val events = mutable.Buffer.empty[String]
    val uploads = mutable.Map.empty[String, Array[Byte]]
    val base = () => s"http://127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      events += s"$method $path auth=$auth"
      def respond(code: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
        else { ex.sendResponseHeaders(code, bytes.length); ex.getResponseBody.write(bytes) }
        ex.close()
      }
      (method, path) match {
        case ("POST", "/api/deposit/depositions/123/actions/newversion") =>
          respond(201, s"""{"links": {"latest_draft": "${base()}/api/deposit/depositions/456"}}""")
        case ("GET", "/api/deposit/depositions/456") =>
          respond(200,
            s"""{"links": {"bucket": "${base()}/files/bucket-1"},
               | "files": [{"id": "old-file-a"}, {"id": "old-file-b"}]}""".stripMargin)
        case ("DELETE", p) if p.startsWith("/api/deposit/depositions/456/files/") =>
          respond(204, "")
        case ("PUT", p) if p.startsWith("/files/bucket-1/") =>
          uploads(p.split("/").last) = ex.getRequestBody.readAllBytes()
          respond(201, """{"mimetype": "application/octet-stream"}""")
        case ("POST", "/api/deposit/depositions/456/actions/publish") =>
          respond(202, """{"state": "done"}""")
        case _ => respond(404, s"""{"message": "unexpected $method $path"}""")
      }
    })
    server.start()
    try test(base(), events, uploads)
    finally server.stop(0)
  }

  test("publishNewVersion: new version, old files deleted, artifact uploaded, published") {
    withServer { (base, events, uploads) =>
      val artifact = Files.createTempFile("graft-artifact", ".parquet")
      val payload = "parquet-bytes-0123456789".getBytes("UTF-8")
      Files.write(artifact, payload)
      val draft = Publish.publishNewVersion(base, "123", artifact, token = "tok-1")
      assert(draft == "456")
      // the reference's delete_latest_files = TRUE analog
      assert(events.exists(_.startsWith("DELETE /api/deposit/depositions/456/files/old-file-a")))
      assert(events.exists(_.startsWith("DELETE /api/deposit/depositions/456/files/old-file-b")))
      // artifact reached the bucket byte-identically
      assert(uploads.keySet == Set(artifact.getFileName.toString))
      assert(java.util.Arrays.equals(uploads(artifact.getFileName.toString), payload))
      // published, and every call carried the bearer token
      assert(events.exists(_.startsWith("POST /api/deposit/depositions/456/actions/publish")))
      assert(events.forall(_.contains("auth=Bearer tok-1")))
    }
  }

  test("publish=false leaves the draft unpublished") {
    withServer { (base, events, uploads) =>
      val artifact = Files.createTempFile("graft-artifact", ".parquet")
      Files.write(artifact, "x".getBytes("UTF-8"))
      Publish.publishNewVersion(base, "123", artifact, token = "t", doPublish = false)
      assert(!events.exists(_.contains("/actions/publish")))
    }
  }

  test("an error status surfaces as an exception, not a silent success") {
    withServer { (base, _, _) =>
      val artifact = Files.createTempFile("graft-artifact", ".parquet")
      Files.write(artifact, "x".getBytes("UTF-8"))
      val e = intercept[RuntimeException] {
        Publish.publishNewVersion(base, "999", artifact, token = "t") // unknown id -> 404
      }
      assert(e.getMessage.contains("404"))
    }
  }
}
