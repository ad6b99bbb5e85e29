package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: build once, probe many times.
  *
  * [[Similarity.ivfPqTopK]] recomputes cell assignment and PQ codes on
  * every invocation — fine for a gate, wrong for the production
  * workflow, where the expensive pass over the corpus (one scan: cell
  * argmax + PQ encode) should happen ONCE and every later query batch
  * should read only the small artifacts. This object gives that index a
  * durable on-disk form, all parquet:
  *
  *   path/centroids.parquet   (cid, embedding)        — coarse quantizer
  *   path/codebook.parquet    (subspace, code, vec)   — PQ codebook
  *   path/codes.parquet       (id, cell, codes)       — encoded corpus,
  *       range-clustered by `cell` so a probe's candidate read skips
  *       most row groups via footer min/max stats (the
  *       [[Layout.writeRangeLayout]] idea applied to the index: at 100 TB
  *       the codes table is the big artifact, and cell-clustering makes
  *       each probe touch ~probes/C of it)
  *   path/INDEX_OK            marker: written LAST, so a half-written
  *       index (crashed build) is never readable
  *
  * The probe path ([[topK]]) feeds the reloaded artifacts through
  * [[Similarity.ivfPqTopKEncoded]] — the same scoring code the inline
  * fit uses, so a reloaded index returns bit-identical top-k
  * (AnnIndexSpec asserts equality against [[Similarity.ivfPqTopK]]).
  */
object AnnIndex {

  /** In-memory handle to a (re)loaded index.
    * @param stamp the indexed SOURCE snapshot, when the index was
    *   built from a versioned table: (tableDir, version, idCol) —
    *   what [[topKLive]] adjudicates staleness against. */
  final case class Index(
      centroids: DataFrame,
      codebook: Array[Array[Array[Float]]],
      encoded: DataFrame,
      stamp: Option[(String, Long, String)] = None)

  /** One corpus scan: assign cells, PQ-encode, write all artifacts.
    *
    * @param source when the corpus came from a VERSIONED table, its
    *   table dir + the id column name there — stamped (with the
    *   table's resolved current version) into INDEX_OK, which is what
    *   gives the persisted index a staleness contract at all: a probe
    *   through [[topKLive]] compares the stamp to the table's current
    *   version and refuses or reconciles instead of silently serving
    *   ids a later DELETE removed (the same silent-divergence class
    *   the CDC mirrors refuse via `_cdf_applied.json`). Unstamped
    *   indexes (ad-hoc corpora) keep the old caller-owns-freshness
    *   behavior. */
  def write(
      corpus: DataFrame, centroids: DataFrame,
      cb: Array[Array[Array[Float]]], path: String,
      numRangePartitions: Int = 4,
      source: Option[(String, String)] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val stamp = source.map { case (tbl, idCol) =>
      val v = Upsert.currentVersion(tbl).getOrElse(throw new IllegalArgumentException(
        s"AnnIndex.write: source '$tbl' is not a versioned table (no " +
          "CURRENT pointer or commit log) — omit `source` for ad-hoc corpora"))
      (tbl, v, idCol)
    }
    centroids.select(col("cid"), col("embedding"))
      .write.mode("overwrite").parquet(s"$path/centroids.parquet")
    cb.zipWithIndex.flatMap { case (codes, mi) =>
      codes.zipWithIndex.map { case (vec, c) => (mi, c, vec.toSeq) }
    }.toSeq.toDF("subspace", "code", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook.parquet")
    Similarity.pqEncode(
        Similarity.nearestCell(
          corpus.select(col("id"), col("embedding")), centroids),
        "embedding", cb)
      .select(col("id"), col("cell"), col("codes"))
      .repartitionByRange(numRangePartitions, col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("overwrite").parquet(s"$path/codes.parquet")
    // through the Fs substrate (scheme-proof; FsSubstrateSpec's source
    // gate forbids raw java.io writes in the ops layer)
    Fs.writeTextAtomic(Fs.of(path),
      new org.apache.hadoop.fs.Path(s"$path/INDEX_OK"), markerText(cb, stamp))
  }

  private def markerText(
      cb: Array[Array[Array[Float]]],
      stamp: Option[(String, Long, String)]): String =
    s"numSub=${cb.length} codes=${cb(0).length}" +
      stamp.fold("") { case (tbl, v, idCol) =>
        s"""\n{"src":"$tbl","srcVersion":$v,"idCol":"$idCol"}""" }

  /** The (tableDir, version, idCol) source stamp of a persisted
    * index, when it was built from a versioned table. */
  def readStamp(path: String): Option[(String, Long, String)] =
    Fs.readTextIfExists(Fs.of(path),
        new org.apache.hadoop.fs.Path(s"$path/INDEX_OK"))
      .flatMap { txt =>
        for {
          src <- """"src":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
          v <- """"srcVersion":(-?\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          idc <- """"idCol":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
        } yield (src, v, idc)
      }

  /** Append a delta batch to a persisted index: encode the NEW vectors
    * with the index's EXISTING centroids and codebook (one delta-sized
    * pass — the standing corpus is never rescanned) and land them as
    * additional cell-clustered files in the codes table. This is the
    * lakehouse maintenance shape applied to the ANN index:
    * centroids/codebook are immutable artifacts (IVF's standard
    * contract — refitting them is a REBUILD, not an append), the codes
    * table is the growing one, and each append's own files are
    * cell-clustered so probes keep skipping row groups; accumulated
    * small appends re-cluster with [[Layout.optimizeTable]] like any
    * other table. A probe after append is bit-identical to a probe of
    * an index rebuilt over the full corpus with the same artifacts
    * (AnnIndexSpec + `q_ann_append` vs the inline-fit oracle). */
  def append(delta: DataFrame, path: String,
      numRangePartitions: Int = 1): Unit = {
    require(Fs.of(path).exists(new org.apache.hadoop.fs.Path(s"$path/INDEX_OK")),
      s"AnnIndex.append: $path has no INDEX_OK marker — build the index first")
    val idx = read(delta.sparkSession, path)
    Similarity.pqEncode(
        Similarity.nearestCell(
          delta.select(col("id"), col("embedding")), idx.centroids),
        "embedding", idx.codebook)
      .select(col("id"), col("cell"), col("codes"))
      .repartitionByRange(numRangePartitions, col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("append").parquet(s"$path/codes.parquet")
    // a stamped index's append advances the stamp to the source's
    // CURRENT version — the delta is the caller's assertion that the
    // index now reflects everything up to it (the same applied-mark
    // move the CDC sink makes after each commit)
    idx.stamp.foreach { case (tbl, _, idCol) =>
      Upsert.currentVersion(tbl).foreach { v =>
        Fs.writeTextAtomic(Fs.of(path),
          new org.apache.hadoop.fs.Path(s"$path/INDEX_OK"),
          markerText(idx.codebook, Some((tbl, v, idCol))))
      }
    }
  }

  /** Load the index artifacts; refuses a directory without the marker
    * (a crashed build must fail loudly, not probe a partial corpus). */
  def read(spark: SparkSession, path: String): Index = {
    require(Fs.of(path).exists(new org.apache.hadoop.fs.Path(s"$path/INDEX_OK")),
      s"AnnIndex: $path has no INDEX_OK marker — missing or incomplete index")
    val cbRows = spark.read.parquet(s"$path/codebook.parquet")
      .select("subspace", "code", "vec")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val numSub = cbRows.map(_._1).max + 1
    val cb = Array.tabulate(numSub) { mi =>
      cbRows.filter(_._1 == mi).sortBy(_._2).map(_._3)
    }
    Index(
      spark.read.parquet(s"$path/centroids.parquet"),
      cb,
      spark.read.parquet(s"$path/codes.parquet"),
      readStamp(path))
  }

  /** Probe a (re)loaded index: same contract as
    * [[Similarity.ivfPqTopK]] — (qid, id, rank 1..k) by ADC asc.
    * NO staleness check (the Index handle may be unstamped) — the
    * versioned-table contract lives in [[topKLive]]. */
  def topK(queries: DataFrame, index: Index, k: Int, probes: Int,
      saltBuckets: Int = 8): DataFrame =
    Similarity.ivfPqTopKEncoded(
      queries, index.encoded, index.centroids, index.codebook,
      k, probes, saltBuckets)

  /** Probe a persisted index WITH its staleness contract — the entry
    * point for indexes stamped with a versioned source ([[write]]'s
    * `source`). Adjudication against the source's commit history:
    *
    *   - stamp == the table's current version → probe as-is;
    *   - every version after the stamp is DELETE-SHAPED (verbs
    *     DELETE / DELETE_DV / COMPACT_DELETES — rows only ever
    *     removed, no embedding the index hasn't seen) → RECONCILE:
    *     the encoded corpus is semi-joined against the table's LIVE
    *     ids (deletion vectors honored) before scoring, so the probe
    *     returns exactly the index of the surviving corpus — a
    *     delivery-sized fix instead of a rebuild;
    *   - anything else (MERGE/UPDATE/unknown verb, a vacuumed
    *     in-between version, an unstamped index passed here) →
    *     REFUSE loudly, naming the remedy — the failure this closes
    *     is a probe silently serving deleted or stale ids after the
    *     table moved (AnnIndexSpec; `q_ann_delete` pins the
    *     reconciled probe against the surviving-rows oracle). */
  def topKLive(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, probes: Int, saltBuckets: Int = 8): DataFrame = {
    val idx = read(spark, path)
    val (tbl, stamped, idCol) = idx.stamp.getOrElse(
      throw new IllegalStateException(
        s"AnnIndex.topKLive: index at $path carries no source stamp — " +
          "it was built from an ad-hoc corpus; probe with topK (caller " +
          "owns freshness) or rebuild with write(source = ...)"))
    val cur = Upsert.currentVersion(tbl).getOrElse(
      throw new IllegalStateException(
        s"AnnIndex.topKLive: indexed source '$tbl' is gone or lost its " +
          "CURRENT pointer — rebuild the index"))
    val encoded =
      if (cur == stamped) idx.encoded
      else if (cur < stamped)
        throw new IllegalStateException(
          s"AnnIndex.topKLive: index at $path was built at v$stamped of " +
            s"'$tbl' but the table is now at v$cur (restored to an older " +
            "version?) — rebuild the index")
      else {
        val deleteShaped = Set("DELETE", "DELETE_DV", "COMPACT_DELETES")
        ((stamped + 1) to cur).foreach { v =>
          val verb = Upsert.readCommitInfo(s"$tbl/v$v").map(_._1)
          // a claimed-but-never-published number is not on the chain
          val published = Fs.of(tbl).exists(
            new org.apache.hadoop.fs.Path(s"$tbl/v$v")) ||
            verb.isDefined
          if (published && !verb.exists(deleteShaped))
            throw new IllegalStateException(
              s"AnnIndex.topKLive: index at $path was built at v$stamped " +
                s"of '$tbl' but v$v committed " +
                verb.fold("an unknown change (no _commitinfo — vacuumed " +
                  "or foreign-written)")(w => s"a $w") +
                " — the index has not seen its rows and a probe would " +
                "silently return stale results. Remedy: AnnIndex.append " +
                "the new/changed vectors (advances the stamp), or " +
                "rebuild with AnnIndex.write")
        }
        // delete-only divergence: the encoded corpus is a superset of
        // the live rows — restrict to live ids (DV honored) and the
        // probe IS the index of the surviving corpus
        val live = Upsert.readWithDeletes(spark, s"$tbl/v$cur")
          .select(col(idCol).as("id"))
        idx.encoded.join(live, Seq("id"), "left_semi")
      }
    Similarity.ivfPqTopKEncoded(
      queries, encoded, idx.centroids, idx.codebook, k, probes, saltBuckets)
  }
}
