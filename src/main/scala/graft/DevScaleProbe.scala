package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: empirical time-vs-scale curves for the heaviest
  * operators (round-7 verdict #2 — "every 100×-scale claim rests on
  * plan audits; run a 10× probe").
  *
  * Builds scaled tiers from sf0.1 by unioning k STRUCTURE-PRESERVING
  * copies, so the per-copy workload is identical and the ground-truth
  * scaling law is linear:
  *   - documents: copy c prefixes every token with `c<c>_` (a bijection
  *     on the token alphabet — within-copy Jaccard/shingle structure is
  *     EXACTLY the original's, while cross-copy token sets are disjoint,
  *     so no spurious cross-copy near-dups inflate the pair count);
  *   - embeddings: copy c rotates the coordinate axes by c positions —
  *     an orthogonal transform, so every within-copy cosine/distance is
  *     bit-comparable to the original's and cross-copy similarity is
  *     incidental;
  *   - lineitem (PageRank edges): order/part keys offset per copy →
  *     k disjoint isomorphic graphs.
  * Copy 0 is the unmodified original in all three.
  *
  * Centroid counts for the cell-partitioned ANN/dedup ops scale with
  * the tier (the production rule: cells ∝ corpus keeps E[cell] flat;
  * a FIXED centroid set at growing n is the known O(n²/k) trap).
  *
  * Usage: runMain graft.DevScaleProbe [k1 k2 ...]   (default: 1 10)
  * Output: one JSON line per (op, tier) appended to stdout and
  * docs/BENCH_SCALE_r10.json.
  */
object DevScaleProbe {

  private val srcDir = "/root/testdata/sf0.1"

  private def tierDir(k: Int) = s"/tmp/graft_scale_${k}x"

  /** Union k structure-preserving copies of the three probe tables. */
  def buildTier(spark: SparkSession, k: Int): String = {
    val dir = tierDir(k)
    val marker = new java.io.File(dir, "TIER_OK")
    if (marker.exists) return dir
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val nDoc = 5000L; val nVec = 2000L
    val maxOk = 6000000L; val maxPk = 200000L // > sf0.1 maxima
    val dim = 64

    def docCopy(c: Int): DataFrame = {
      val t = if (c == 0) col("text")
      else array_join(transform(split(col("text"), " "),
        tok => concat(lit(s"c${c}_"), tok)), " ")
      docs.select((col("doc_id") + lit(c * nDoc)).as("doc_id"), t.as("text"))
    }
    def embCopy(c: Int): DataFrame = {
      val rot = c % dim
      val e = if (rot == 0) col("embedding")
      else concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), 1, rot))
      embs.select((col("vec_id") + lit(c * nVec)).as("vec_id"), e.as("embedding"))
    }
    def liCopy(c: Int): DataFrame =
      li.select((col("l_orderkey") + lit(c * maxOk)).as("l_orderkey"),
        (col("l_partkey") + lit(c * maxPk)).as("l_partkey"))

    (0 until k).map(docCopy).reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until k).map(embCopy).reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (0 until k).map(liCopy).reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val w = new java.io.PrintWriter(marker, "UTF-8"); try w.print(k) finally w.close()
    dir
  }

  // ---- the probed workloads (uncapped operator invocations) ----------

  private def minhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minHashLshPairs(
      s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      numPerms = 6, bandSize = 3, threshold = 0.8, maxBucket = Some(100))

  /** ORGANIC corpus at tier k: generated documents, not tiled copies —
    * fresh doc ids, Zipf-ish vocabulary (uniform hash squared → low
    * token ids dominate, like real word frequencies), organic length
    * spread (40–400 tokens), and ~5% planted near-dups (a mutated copy
    * of the previous doc: one token in ~30 replaced). Pure column
    * expressions, fully deterministic — the honest complement to the
    * structure-preserving replicated tiers, where every copy shares
    * the source's length/frequency profile by construction. */
  private def organicDocs(s: SparkSession, nDocs: Long): DataFrame = {
    import s.implicits._
    val vocab = 50000L
    // per-(doc, position) pseudo-randomness: xxhash64 of the pair
    def h(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(xxhash64(seed))
    val isDup = pmod($"id", lit(20L)) === 19L // doc 19 mutates doc 18, …
    val srcId = when(isDup, $"id" - 1L).otherwise($"id")
    val len = (h(srcId * 7919L) % 361L + 40L).cast("int")
    val toks = transform(sequence(lit(1), len), i => {
      val u = (h(srcId * 104729L + i.cast("long")) % 100000L).cast("double") / 100000.0
      val zipf = (u * u * vocab).cast("long") // Zipf-ish: low ids frequent
      val mutated = isDup && h($"id" * 31L + i.cast("long")) % 30L === 0L
      concat(lit("w"), when(mutated, zipf + vocab).otherwise(zipf))
    })
    s.range(nDocs).select($"id".as("doc_id"), array_join(toks, " ").as("text"))
  }

  private def organicDir(k: Int): String = {
    val d = s"/tmp/graft_scale_org_${k}x"
    new java.io.File(d).mkdirs(); d
  }

  private def ensureOrganicDocs(s: SparkSession, k: Int): String = {
    val dir = organicDir(k)
    val marker = new java.io.File(s"$dir/ORG_DOCS_OK")
    if (!marker.exists) {
      organicDocs(s, 5000L * k).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val w = new java.io.PrintWriter(marker, "UTF-8")
      try w.print(k) finally w.close()
    }
    s"$dir/documents.parquet"
  }

  private def minhashOrganic(s: SparkSession, k: Int): DataFrame =
    graft.ops.Dedup.minHashLshPairs(
      s.read.parquet(ensureOrganicDocs(s, k)), "doc_id", "text",
      numPerms = 6, bandSize = 3, threshold = 0.8, maxBucket = Some(100))

  private def substrOrganic(s: SparkSession, k: Int): DataFrame =
    graft.ops.Dedup.removeDuplicateSpans(
      s.read.parquet(ensureOrganicDocs(s, k)), "doc_id", "text", n = 12)
      .agg(count(lit(1)).as("n"), sum(col("n_kept")).as("kept"),
        sum(col("n_toks")).as("toks"))

  private def incr(s: SparkSession, dir: String, k: Int): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
    // 20/80 split WITHIN each copy (ids are c*5000 + orig): cross-copy
    // token sets are disjoint by construction, so a whole-copy history
    // would make the probe vacuous (0 candidate pairs)
    val hist = pmod(col("doc_id"), lit(5000L)) < 1000L
    graft.ops.Dedup.minHashLshPairsAgainst(
      d.filter(hist), d.filter(!hist),
      "doc_id", "text", numPerms = 6, bandSize = 3, threshold = 0.8,
      maxBucket = Some(100))
  }

  private def semdedup(s: SparkSession, dir: String, k: Int): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val nCent = 32L * k // cells ∝ corpus: E[cell size] stays flat
    val stride = 2000L * k / nCent
    val cents = e.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("cid"), col("embedding"))
    graft.ops.Similarity.semanticDedup(
      e.select(col("vec_id").as("id"), col("embedding")), cents,
      thresholdQ = 3500L)
  }

  // Round-10 additions: the ops whose HONEST cost the fold-proof bench
  // action just exposed (previously count-folded to near-zero) — probe
  // that the exposed cost is sub-linear, not just nonzero.

  private def winnow(s: SparkSession, dir: String): DataFrame = {
    val fp = graft.ops.TextAnalysis.winnowFingerprints(
      s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 8, 4)
    fp.groupBy(col("id"))
      .agg(count(lit(1)).as("n_fp"), min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
  }

  private def profileNumeric(s: SparkSession, dir: String): DataFrame =
    graft.ops.Quality.profileNumeric(
      s.read.parquet(s"$dir/lineitem.parquet"),
      Seq("l_orderkey", "l_partkey"))

  private def ngramJac(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramJaccardDegree(
      s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 2, 0.6,
      maxDocFreq = Some(40))

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .filter(pmod(col("l_orderkey"), lit(50)) === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val half = li.as("a").join(li.as("b"), "ok")
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
    val edges = half.union(half.select(col("v").as("u"), col("u").as("v")))
    graft.ops.Graph.pageRankQuantized(edges, "u", "v", iters = 10)
  }

  private def fiaPipeline(s: SparkSession, k: Int): DataFrame = {
    // the production scale path: bucket count ∝ data so per-bucket sort
    // stays in memory (the round-8 super-linear tier was exactly the
    // whole-table re-sorts this stage removes)
    val results = graft.fia.Pipeline.runBucketed(s,
      graft.fia.SyntheticState.tables(s, 6000 * k),
      s"/tmp/graft_scale_pipeline_stage_$k", buckets = 16 * k)
    results("midpt").withColumn("variant", lit("midpt"))
      .unionByName(results("mortyr").withColumn("variant", lit("mortyr")))
  }

  /** FIA's real panel structure mixed in: 3/5/7/9-year re-measurement
    * cycles hash-picked per plot. Every key is freshly generated at the
    * tier's cardinality (no tiling anywhere in the FIA probes — the
    * generator IS organic; this variant additionally varies the
    * survey-gap distribution, so the annualizer's densification fan-out
    * differs per plot instead of repeating one interval). */
  private val organicGaps = Seq(3, 5, 5, 7, 9)

  private def fiaPipelineOrganic(s: SparkSession, k: Int): DataFrame = {
    val results = graft.fia.Pipeline.runBucketed(s,
      graft.fia.SyntheticState.tables(s, 6000 * k, gapYears = organicGaps),
      s"/tmp/graft_scale_pipeline_org_stage_$k", buckets = 16 * k)
    results("midpt").withColumn("variant", lit("midpt"))
      .unionByName(results("mortyr").withColumn("variant", lit("mortyr")))
  }

  private def ensureUpsertTable(s: SparkSession, dir: String, k: Int): String = {
    import s.implicits._
    val tbl = s"$dir/upsert_table"
    // the sidecar check re-stages tables left by PRE-sidecar probe
    // runs, which would otherwise silently measure the legacy
    // footer-sweep path
    if (!new java.io.File(s"$dir/UPSERT_TBL_OK").exists ||
        !new java.io.File(s"$tbl/_schema.json").isFile) {
      val df = s.range(200000L * k)
        .select($"id".as("k"), pmod($"id", lit(97L)).as("v"))
      df.repartitionByRange(16 * k, $"k").sortWithinPartitions($"k")
        .write.mode("overwrite").parquet(tbl)
      // any real lineage carries the schema sidecar after its first
      // commit — stage the post-bootstrap state the verbs actually see
      graft.ops.Upsert.writeSchemaSidecar(tbl, df.schema)
      val w = new java.io.PrintWriter(s"$dir/UPSERT_TBL_OK", "UTF-8")
      try w.print(k) finally w.close()
    }
    tbl
  }

  /** Fixed-size delivery against a k×-sized range-clustered table: the
    * file-granular COW upsert's commit cost should be ~FLAT in table
    * size (manifest footers + 1 touched file + hard links for the
    * rest), which is the property that distinguishes it from a
    * rewrite-the-partition MERGE. */
  private def upsertCommit(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val tbl = ensureUpsertTable(s, dir, k)
    val updates = s.range(5000L).select($"id".as("k"), lit(-1L).as("v"))
    val (nCopied, nRewritten, _) = graft.ops.Upsert.upsertByKey(
      s, tbl, s"$dir/upsert_out", updates, "k")
    Seq((nCopied.toLong, nRewritten.toLong)).toDF("copied", "rewritten")
  }

  /** Fixed-RANGE predicate UPDATE against the k×-sized table: the
    * verb's cost should track the matched key range (one stats scan
    * with the predicate pushed to parquet, range-pruned payload,
    * touched-file decode), staying ~flat while the table grows. */
  private def updateWhere(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val tbl = ensureUpsertTable(s, dir, k)
    val (nCopied, nRewritten, n) = graft.ops.Upsert.updateWhere(
      s, tbl, s"$dir/updw_out", "k",
      $"k" >= 10000L && $"k" < 15000L && $"v" < 90L,
      Seq("v" -> ($"v" + 1000L)))
    Seq((nCopied.toLong, nRewritten.toLong, n)).toDF("copied", "rewritten", "n")
  }

  /** Fixed-size MERGE-ON-READ delete against the k×-sized table: a DV
    * commit never decodes or rewrites a data file, so its cost should
    * track file COUNT (links) + the delta write only. */
  private def dvDelete(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val tbl = ensureUpsertTable(s, dir, k)
    val keys = s.range(5000L).select(($"id" * 7L).as("k"))
    val (nFiles, nDv) = graft.ops.Upsert.deleteByKeyDV(
      s, tbl, s"$dir/dv_out", keys, "k")
    Seq((nFiles.toLong, nDv)).toDF("files", "dv_keys")
  }

  /** CDF across a deletion-vector commit: the DV-delta leg fetches the
    * deleted rows' before images manifest-pruned, so the feed must
    * cost ∝ files containing deleted keys (fixed delivery → ~flat
    * curve), not the tier's table size. Chain build (clone + DV
    * delete) is staged untimed; the timed part is the feed itself. */
  private def cdfDv(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val tbl = ensureUpsertTable(s, dir, k)
    val chain = s"$dir/cdfdv"
    val marker = new java.io.File(s"$dir/CDFDV_OK")
    if (!marker.exists) {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(chain))
      graft.ops.Upsert.cloneSnapshot(s, tbl, s"$chain/v0")
      // a production chain carries the bounds manifest; without it the
      // feed's pruned fetch pays O(files) footer reads per run
      graft.ops.Upsert.writeManifestSidecar(s, s"$chain/v0", "k")
      graft.ops.Upsert.deleteByKeyDV(s, s"$chain/v0", s"$chain/v1",
        s.range(5000L).select(($"id" * 7L).as("k")), "k")
      val w = new java.io.PrintWriter(marker, "UTF-8")
      try w.print(k) finally w.close()
    }
    graft.ops.Upsert.changeDataFeed(s, chain, 0L, 1L)
  }

  /** Exact-substring dedup over the k×-sized documents tier: copies
    * are token-bijections, so per-copy duplicated-span structure is
    * identical and the ground-truth scaling law is linear. The probe
    * AGGREGATES the output — a bare count() lets the optimizer
    * eliminate the final unique-key left join and skip the work. */
  private def substrDedup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.removeDuplicateSpans(
      s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 8)
      .agg(sum(length(col("dedup_text"))).as("chars"),
        sum(col("n_kept")).as("kept"), sum(col("n_toks")).as("toks"))
      // the probe harness counts; a bare count over a global aggregate
      // folds to a literal (OptimizeOneRowPlan) and measures NOTHING —
      // the data-dependent filter forces evaluation
      .filter(col("kept") >= 0)

  /** Same delivery, but committed FROM a prior snapshot that already
    * carries the manifest sidecar — the steady-state commit of a
    * snapshot chain: zero footer reads for unchanged files. The first
    * commit (which builds the sidecar from footers) is staged untimed. */
  private def upsertCommitCached(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    // caller stages the manifested snapshot at upsert_out (untimed)
    val updates = s.range(5000L, 10000L).select($"id".as("k"), lit(-2L).as("v"))
    val (nCopied, nRewritten, _) = graft.ops.Upsert.upsertByKey(
      s, s"$dir/upsert_out", s"$dir/upsert_out2", updates, "k")
    Seq((nCopied.toLong, nRewritten.toLong)).toDF("copied", "rewritten")
  }

  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val onlyOps = sys.env.get("SPARK_GRAFT_PROBE_OPS").map(_.split(",").toSet)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    // SPARK_GRAFT_SHUFFLE: scale-diagnosis override — the driver
    // contract pins 32, but "does the curve straighten when partitions
    // scale with the data" is exactly the question a super-linear tier
    // raises (shuffle.partitions ∝ data is the production rule)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus.toString)
    val spark = GraftSession.builder(cpus)
      .config("spark.sql.shuffle.partitions", shuffle)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup

    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val out = new StringBuilder
    def probe(op: String, tier: Int, fn: () => DataFrame): Unit = {
      if (!onlyOps.forall(_.contains(op))) return
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to 2) { // min of 2: sheds first-run codegen + one contention burst
        clearState()
        val t0 = System.nanoTime()
        // fold-proof action (same trap as Bench's): a bare count lets
        // Catalyst prune every computed column — the pipeline probes
        // would skip the NSVB DAG entirely. Hashing all output columns
        // forces the full projection; count rides the same aggregate.
        val r = fn()
        // bit_xor combiner: ANSI mode faults on long-sum overflow
        val forced = r.select(
          xxhash64(struct(r.columns.map(col): _*)).as("__h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(__h)"))
        rows = forced.collect()(0).getLong(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val line = s"""{"op":"$op","tier":"${tier}x","rows_out":$rows,"sec":${math.round(best * 1000) / 1000.0}}"""
      println(s"[scale] $line")
      out.append(line).append('\n')
    }

    for (k <- tiers) {
      // the FIA probes GENERATE their input at tier cardinality — a
      // filtered fia-only run (e.g. the 100×-class organic probe) must
      // not pay the replicated doc/emb/lineitem tier build it never reads
      val tierOps = Seq("minhash_lsh", "incr_dedup", "semantic_dedup",
        "pagerank", "upsert_commit", "dv_delete", "cdf_dv", "substr_dedup",
        "upsert_commit_cached", "winnow_fp", "profile", "ngram_jaccard",
        "update_where") // organic ops build their own corpus, not the tier
      val dir =
        if (tierOps.exists(op => onlyOps.forall(_.contains(op))))
          buildTier(spark, k)
        else { val d = tierDir(k); new java.io.File(d).mkdirs(); d }
      probe("minhash_lsh", k, () => minhash(spark, dir))
      probe("minhash_lsh_organic", k, () => minhashOrganic(spark, k))
      probe("substr_dedup_organic", k, () => substrOrganic(spark, k))
      probe("incr_dedup", k, () => incr(spark, dir, k))
      probe("semantic_dedup", k, () => semdedup(spark, dir, k))
      probe("pagerank", k, () => pagerank(spark, dir))
      probe("winnow_fp", k, () => winnow(spark, dir))
      probe("profile", k, () => profileNumeric(spark, dir))
      probe("ngram_jaccard", k, () => ngramJac(spark, dir))
      probe("fia_pipeline", k, () => fiaPipeline(spark, k))
      probe("fia_pipeline_organic", k, () => fiaPipelineOrganic(spark, k))
      // incremental delivery against the ORGANIC tier: staged old
      // output (untimed), timed merge — same contract as
      // fia_incremental below
      if (onlyOps.forall(_.contains("fia_incremental_organic"))) {
        val full = graft.fia.SyntheticState.tables(spark, 6000 * k, organicGaps)
        val (old, batch) = graft.fia.Incremental.splitDelivery(full)
        val oldOutPath = s"$dir/fia_oldout_org"
        if (!new java.io.File(s"$dir/FIA_OLDOUT_ORG_OK").exists) {
          graft.fia.Incremental.bothVariants(spark, old)
            .write.mode("overwrite").parquet(oldOutPath)
          val w2 = new java.io.PrintWriter(s"$dir/FIA_OLDOUT_ORG_OK", "UTF-8")
          try w2.print(k) finally w2.close()
        }
        probe("fia_incremental_organic", k, () =>
          graft.fia.Incremental.merge(spark, spark.read.parquet(oldOutPath),
            full, graft.fia.Incremental.dirtyPlotIds(batch)))
      }
      // incremental vs full head-to-head at the same tier: the OLD
      // OUTPUT is pre-existing state in the CDC workflow, so its
      // construction is staged UNTIMED (marker-guarded); the timed part
      // is what a delivery actually costs — read old output, evict
      // dirty plots, recompute only the delivery's raw rows. At 1× the
      // fixed driver-side plan analysis floors both variants; the gap
      // at 10× is the operator's value.
      if (onlyOps.forall(_.contains("fia_incremental"))) {
        val full = graft.fia.SyntheticState.tables(spark, 6000 * k)
        val (old, batch) = graft.fia.Incremental.splitDelivery(full)
        val oldOutPath = s"$dir/fia_oldout"
        if (!new java.io.File(s"$dir/FIA_OLDOUT_OK").exists) {
          graft.fia.Incremental.bothVariants(spark, old)
            .write.mode("overwrite").parquet(oldOutPath)
          val w2 = new java.io.PrintWriter(s"$dir/FIA_OLDOUT_OK", "UTF-8")
          try w2.print(k) finally w2.close()
        }
        probe("fia_incremental", k, () =>
          graft.fia.Incremental.merge(spark, spark.read.parquet(oldOutPath),
            full, graft.fia.Incremental.dirtyPlotIds(batch)))
      }
      probe("upsert_commit", k, () => upsertCommit(spark, dir, k))
      probe("update_where", k, () => updateWhere(spark, dir, k))
      probe("dv_delete", k, () => dvDelete(spark, dir, k))
      probe("cdf_dv", k, () => cdfDv(spark, dir, k))
      probe("substr_dedup", k, () => substrDedup(spark, dir))
      if (onlyOps.forall(_.contains("upsert_commit_cached"))) {
        upsertCommit(spark, dir, k) // stage the manifested snapshot untimed
        probe("upsert_commit_cached", k, () => upsertCommitCached(spark, dir, k))
      }
    }
    // a FILTERED run (SPARK_GRAFT_PROBE_OPS) appends — it must not
    // clobber the full probe record with a partial one
    if (onlyOps.isDefined) {
      val fw = new java.io.FileWriter("docs/BENCH_SCALE_r10.json", true)
      try fw.write(out.toString) finally fw.close()
      spark.stop()
      return
    }
    val w = new java.io.PrintWriter("docs/BENCH_SCALE_r10.json", "UTF-8")
    try w.print(out.toString) finally w.close()
    spark.stop()
  }
}
