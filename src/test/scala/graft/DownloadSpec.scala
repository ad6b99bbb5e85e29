package graft

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.fia.{Download, Ingest}

/** S1/S2 ingest surface: fetch (file:// fixture — no network in CI),
  * skip-if-present, zip-reuse, extraction into the exact layout
  * [[Ingest.load]] consumes. */
class DownloadSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(2)

  /** Build XX_CSV.zip from the checked-in fixture CSVs (4 real tables)
    * plus header-only stand-ins for the 5 POP tables. */
  private def makeFixtureZip(dir: Path): Path = {
    val zipPath = dir.resolve("XX_CSV.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    val fixture = Paths.get("src/test/resources/fixture")
    try Download.tables.foreach { t =>
      zos.putNextEntry(new ZipEntry(s"XX_$t.csv"))
      val real = fixture.resolve(s"XX_$t.csv")
      val bytes =
        if (Files.exists(real)) Files.readAllBytes(real)
        else s"CN,EVALID\n".getBytes("UTF-8")
      zos.write(bytes)
      zos.closeEntry()
    } finally zos.close()
    zipPath
  }

  test("download + extract from a file:// zip produces the Ingest layout") {
    val src = Files.createTempDirectory("fia-src")
    val dst = Files.createTempDirectory("fia-dst")
    makeFixtureZip(src)
    val fetched = Download.download(Seq("XX"), dst.toString,
      baseUrl = src.toUri.toString)
    assert(fetched == Seq("XX"))
    Download.tables.foreach { t =>
      assert(Files.exists(dst.resolve(s"XX_$t.csv")), s"missing XX_$t.csv")
    }
    // zip dropped after extraction (keepZip = false default)
    assert(!Files.exists(dst.resolve("XX_CSV.zip")))
    // the extracted layout is directly loadable
    val tabs = Ingest.load(spark, dst.toString, Seq("XX"))
    assert(tabs("TREE").count() > 0)
    assert(tabs("PLOT").count() > 0)
  }

  test("skip-if-present: complete CSVs mean no fetch is attempted") {
    val src = Files.createTempDirectory("fia-src")
    val dst = Files.createTempDirectory("fia-dst")
    makeFixtureZip(src)
    Download.download(Seq("XX"), dst.toString, baseUrl = src.toUri.toString)
    // bogus base URL: any fetch attempt would throw
    val again = Download.download(Seq("XX"), dst.toString,
      baseUrl = "file:///nonexistent/")
    assert(again.isEmpty)
  }

  test("a present zip with missing CSVs is re-extracted without a fetch") {
    val dst = Files.createTempDirectory("fia-dst")
    makeFixtureZip(dst) // zip in place, no CSVs
    val fetched = Download.download(Seq("XX"), dst.toString,
      baseUrl = "file:///nonexistent/")
    assert(fetched.isEmpty) // extraction sufficed, nothing downloaded
    Download.tables.foreach { t =>
      assert(Files.exists(dst.resolve(s"XX_$t.csv")))
    }
  }

  test("fetch copies a file:// source byte-identically") {
    val src = Files.createTempDirectory("fia-src")
    val dst = Files.createTempDirectory("fia-dst")
    val payload = ("x" * 1000).getBytes("UTF-8")
    Files.write(src.resolve("blob.bin"), payload)
    val out = Download.fetch(src.resolve("blob.bin").toUri.toString,
      dst.resolve("blob.bin"))
    assert(java.util.Arrays.equals(Files.readAllBytes(out), payload))
  }

  /** Range-aware local HTTP fixture: serves `payload`, honors
    * `Range: bytes=N-` with 206, answers an unsatisfiable range with 416 +
    * `Content-Range: bytes *&#47;len` (RFC 9110 §14.4). Counts GETs. */
  private def rangeServer(payload: Array[Byte]): (String, () => Int, () => Unit) = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    val gets = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      if (ex.getRequestMethod == "HEAD") {
        ex.getResponseHeaders.add("Content-Length", payload.length.toString)
        ex.sendResponseHeaders(200, -1)
      } else {
        gets.incrementAndGet()
        val range = Option(ex.getRequestHeaders.getFirst("Range"))
        val from = range.flatMap("bytes=(\\d+)-".r.findFirstMatchIn(_))
          .map(_.group(1).toLong).getOrElse(0L)
        if (from >= payload.length) {
          ex.getResponseHeaders.add("Content-Range", s"bytes */${payload.length}")
          ex.sendResponseHeaders(416, -1)
        } else {
          val body = payload.drop(from.toInt)
          if (from > 0) {
            ex.getResponseHeaders.add("Content-Range",
              s"bytes $from-${payload.length - 1}/${payload.length}")
            ex.sendResponseHeaders(206, body.length)
          } else ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        }
      }
      ex.close()
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}/blob.bin",
      () => gets.get(), () => server.stop(0))
  }

  test("416 with a matching remote length means complete: file untouched") {
    val payload = ("y" * 500).getBytes("UTF-8")
    val (url, gets, stop) = rangeServer(payload)
    try {
      val dst = Files.createTempDirectory("fia-dst").resolve("blob.bin")
      Files.write(dst, payload) // already complete
      val out = Download.fetch(url, dst)
      assert(java.util.Arrays.equals(Files.readAllBytes(out), payload))
      assert(gets() == 1) // the 416 probe only — no re-download
    } finally stop()
  }

  test("416 with a SHORTER remote (stale long partial) restarts from scratch") {
    val payload = ("z" * 300).getBytes("UTF-8")
    val (url, gets, stop) = rangeServer(payload)
    try {
      val dst = Files.createTempDirectory("fia-dst").resolve("blob.bin")
      // local partial LONGER than the (truncated/changed) remote: the old
      // code returned this stale file as if complete
      Files.write(dst, ("stale!" * 100).getBytes("UTF-8"))
      val out = Download.fetch(url, dst)
      assert(java.util.Arrays.equals(Files.readAllBytes(out), payload))
      assert(gets() == 2) // 416 probe + clean re-fetch
    } finally stop()
  }

  test("partial file resumes via 206 and lands byte-identical") {
    val payload = (0 until 1000).map(i => (i % 251).toByte).toArray
    val (url, gets, stop) = rangeServer(payload)
    try {
      val dst = Files.createTempDirectory("fia-dst").resolve("blob.bin")
      Files.write(dst, payload.take(400)) // half-downloaded
      val out = Download.fetch(url, dst)
      assert(java.util.Arrays.equals(Files.readAllBytes(out), payload))
      assert(gets() == 1)
    } finally stop()
  }
}
