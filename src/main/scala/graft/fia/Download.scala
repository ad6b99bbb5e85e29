package graft.fia

import java.io.{BufferedInputStream, BufferedOutputStream, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile

/** FIA DataMart zip fetch + extraction — the S1/S2 ingest surface
  * (`R/fia_download.R:27-96` fetch semantics, `R/fia_download.R:98-114`
  * extraction):
  *
  *  - per-state `{STATE}_CSV.zip` from the DataMart base URL;
  *  - skip-if-present at the CSV level (a state whose 9 CSVs already
  *    exist is not re-downloaded), zip-level reuse (a present zip with
  *    missing CSVs is re-extracted, not re-fetched);
  *  - HTTP byte-range resume of partial downloads (the `curl::
  *    multi_download(resume = TRUE)` analog) — a server that ignores
  *    Range restarts from scratch;
  *  - extraction pulls ONLY the 9 pipeline tables out of the archive,
  *    then drops the zip unless `keepZip`.
  *
  * Output layout is exactly what [[Ingest.load]] consumes
  * (`{state}_{table}.csv` in one directory). `baseUrl` is overridable so
  * tests can point at a `file://` fixture — no network in CI.
  */
object Download {

  /** The 9 DataMart tables the pipeline touches (`R/fia_download.R:2-12`). */
  val tables: Seq[String] = Seq(
    "PLOT", "COND", "TREE", "PLOTGEOM", "POP_ESTN_UNIT", "POP_EVAL",
    "POP_EVAL_TYP", "POP_PLOT_STRATUM_ASSGN", "POP_STRATUM")

  val defaultBaseUrl = "https://apps.fs.usda.gov/fia/datamart/CSV/"

  private def csvPaths(dir: Path, state: String): Seq[Path] =
    tables.map(t => dir.resolve(s"${state}_$t.csv"))

  private def csvsPresent(dir: Path, state: String): Boolean =
    csvPaths(dir, state).forall(Files.exists(_))

  /** Fetch with resume: if a partial file exists, request the remaining
    * byte range; append on a 206 response, restart on anything else.
    * Returns the destination path. */
  def fetch(url: String, dest: Path): Path = {
    val partial = if (Files.exists(dest)) Files.size(dest) else 0L
    val conn = URI.create(url).toURL.openConnection()
    conn.setRequestProperty("User-Agent", "graft-fia (Spark FIA pipeline)")
    if (partial > 0L) conn.setRequestProperty("Range", s"bytes=$partial-")
    val resuming = conn match {
      case h: HttpURLConnection =>
        val code = h.getResponseCode
        // Range starting AT the file length is unsatisfiable (RFC 9110
        // §14.2), so a 416 USUALLY means the local file is already
        // complete — but a local file LONGER than a changed/truncated
        // remote gets the same 416. Disambiguate with the remote's true
        // length (the 416's `Content-Range: bytes */<len>`, else a HEAD):
        // equal -> complete, return untouched (the reference's
        // `curl resume=TRUE` skip); a confirmed mismatch -> the partial
        // is stale, restart from scratch. Unknown length can't confirm a
        // mismatch, so it is treated as complete.
        if (partial > 0L && code == 416) {
          val total = remoteLength(h, url)
          h.disconnect()
          if (total < 0L || total == partial) return dest
          Files.delete(dest)
          return fetch(url, dest) // no partial now -> no 416 recursion
        }
        partial > 0L && code == 206
      case _ => false // file:// etc. — full copy
    }
    val in = new BufferedInputStream(conn.getInputStream)
    val out = new BufferedOutputStream(new FileOutputStream(dest.toFile, resuming))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { out.close(); in.close() }
    dest
  }

  /** The remote's full length, for 416 disambiguation: parse the 416
    * response's `Content-Range: bytes *&#47;<len>` (RFC 9110 §14.4 for the
    * unsatisfied-range form), falling back to a HEAD request's
    * Content-Length. -1 when neither is available. */
  private def remoteLength(h416: HttpURLConnection, url: String): Long = {
    val cr = h416.getHeaderField("Content-Range")
    val parsed = Option(cr).flatMap { v =>
      "bytes\\s+\\*/(\\d+)".r.findFirstMatchIn(v).map(_.group(1).toLong)
    }
    parsed.getOrElse {
      URI.create(url).toURL.openConnection() match {
        case h: HttpURLConnection =>
          try {
            h.setRequestMethod("HEAD")
            h.setRequestProperty("User-Agent", "graft-fia (Spark FIA pipeline)")
            if (h.getResponseCode / 100 == 2) h.getContentLengthLong else -1L
          } catch { case _: Exception => -1L } finally h.disconnect()
        case _ => -1L
      }
    }
  }

  /** Extract the 9 `{state}_{table}.csv` members of a state zip into
    * `dir`; delete the zip afterwards unless `keepZip`
    * (`R/fia_download.R:98-114`). Archive members outside the expected
    * table set are ignored. */
  def unzipCsvs(zip: Path, dir: Path, keepZip: Boolean): Unit = {
    val state = zip.getFileName.toString.stripSuffix("_CSV.zip")
    val wanted = tables.map(t => s"${state}_$t.csv").toSet
    val zf = new ZipFile(zip.toFile)
    try {
      val entries = zf.entries()
      while (entries.hasMoreElements) {
        val e = entries.nextElement()
        // take the basename: some archives nest members under a folder
        val base = Paths.get(e.getName).getFileName.toString
        if (!e.isDirectory && wanted.contains(base)) {
          val in = zf.getInputStream(e)
          try Files.copy(in, dir.resolve(base),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    if (!keepZip) Files.deleteIfExists(zip)
  }

  /** `fia_download` analog: ensure the CSVs for `states` exist in
    * `downloadDir`, fetching and extracting only what is missing.
    * Returns the states for which a download actually happened. */
  def download(
      states: Seq[String], downloadDir: String,
      extract: Boolean = true, keepZip: Boolean = false,
      baseUrl: String = defaultBaseUrl): Seq[String] = {
    val dir = Paths.get(downloadDir)
    Files.createDirectories(dir)
    // a present zip with missing CSVs just needs re-extraction
    if (extract) states.foreach { st =>
      val zip = dir.resolve(s"${st}_CSV.zip")
      if (Files.exists(zip) && !csvsPresent(dir, st)) unzipCsvs(zip, dir, keepZip)
    }
    val missing = states.filterNot(csvsPresent(dir, _))
    missing.foreach { st =>
      val zip = fetch(s"$baseUrl${st}_CSV.zip", dir.resolve(s"${st}_CSV.zip"))
      if (extract) unzipCsvs(zip, dir, keepZip)
    }
    missing
  }

  /** CLI: `Download ST1,ST2 downloadDir [baseUrl]`. */
  def main(args: Array[String]): Unit = {
    val states = args(0).split(",").toSeq
    val dir = args(1)
    val base = if (args.length > 2) args(2) else defaultBaseUrl
    val fetched = download(states, dir, baseUrl = base)
    println(s"[download] fetched ${fetched.mkString(",")} " +
      s"(${states.size - fetched.size} already present) -> $dir")
  }
}
