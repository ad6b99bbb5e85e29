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
}
