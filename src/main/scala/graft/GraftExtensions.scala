package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, Literal, Md5, RegExpReplace, Size, StringSplit, Substring}
import org.apache.spark.sql.types.{BinaryType, LongType}
import graft.functions.{FloatVectorDot, NormalizeAscii}

/** The engine's `SparkSessionExtensions` entry point (SURVEY §7.3 tier
  * (c)): registers native expressions into the SQL function registry so
  * `spark.sql` text queries reach the same codegen'd implementations as
  * the Column API. Activated by `GraftSession.builder` via
  * `spark.sql.extensions=graft.GraftExtensions`; usable standalone by
  * any session builder the same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // plan-level safety net: suffix window frames (O(n²) per
    // partition in Spark's evaluator) rewrite to running frames over
    // the reversed order — see graft.plans.RewriteSuffixWindowFrames
    ext.injectOptimizerRule(_ => graft.plans.RewriteSuffixWindowFrames)
    // SQL surface for the lakehouse verbs: MERGE INTO / DELETE FROM /
    // VACUUM / OPTIMIZE / CLONE over path-addressed snapshot tables
    // lower onto ops.Upsert/Layout; everything else delegates to
    // Spark's parser — see graft.plans.LakehouseSql for the grammar
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // Table-valued time travel: `SELECT ... FROM graft_table('<dir>')`
    // reads the CURRENT snapshot of a versioned COW table (or a plain
    // snapshot dir as-is); `graft_table('<dir>', n)` is VERSION AS OF n.
    // Either form subtracts a `_dv` deletion-vector sidecar the same
    // way ops.Upsert.readWithDeletes does — SQL must never resurrect
    // soft-deleted rows a programmatic reader would hide. The builder
    // returns the read's ANALYZED plan, so downstream
    // filters/projections push into the parquet scan like any other
    // relation.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_table"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, "graft_table",
        "graft_table(dir[, version | 'timestamp']) - read a graft COW " +
          "table from SQL: CURRENT snapshot by default, VERSION AS OF " +
          "with an integer second argument, TIMESTAMP AS OF with a " +
          "timestamp string; deletion-vector sidecars are honored", ""),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.length <= 2,
          "graft_table takes (dir) or (dir, version)")
        def litVal(e: Expression, what: String): Any = e match {
          case Literal(v, _) if v != null => v
          case other => throw new IllegalArgumentException(
            s"graft_table: $what must be a non-null literal, got $other")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        // a registered catalog name (CREATE GRAFT TABLE) or a path
        val dir = graft.plans.LakehouseSql.resolveRef(spark,
          String.valueOf(litVal(children.head, "dir")))
        val snap = children.lift(1) match {
          case Some(e) =>
            val v = litVal(e, "version") match {
              case n: java.lang.Number => n.longValue()
              // a string second argument is TIMESTAMP AS OF: resolve
              // through the _commitinfo audit stamps (newest version
              // committed at or before the instant)
              case s: org.apache.spark.unsafe.types.UTF8String =>
                graft.ops.Upsert.versionAsOfTimestamp(
                  dir, graft.plans.LakehouseSql.parseTsMillis(s.toString))
              case other => throw new IllegalArgumentException(
                s"graft_table: second argument must be an integer version " +
                  s"or a timestamp string literal, got $other")
            }
            val d = s"$dir/v$v"
            val dp = new org.apache.hadoop.fs.Path(d)
            val dfs = graft.ops.Fs.of(d, spark)
            // isDirectory, not exists: a stray regular FILE named v<N>
            // must get this message, not a parquet-reader error
            require(dfs.exists(dp) && dfs.getFileStatus(dp).isDirectory,
              s"graft_table: snapshot v$v not found under $dir (have: " +
                s"${graft.ops.Upsert.snapshotVersions(dir).mkString(",")}) — " +
                "vacuumed or never written")
            d
          case None =>
            graft.streaming.Streams.currentSnapshot(dir).getOrElse(dir)
        }
        graft.ops.Upsert.readWithDeletes(spark, snap).queryExecution.analyzed
      }))
    // Change-data-feed TVF: `SELECT ... FROM graft_cdf('<dir>', f, t)`
    // is the SQL surface of ops.Upsert.changeDataFeed — row-level
    // before/after images between two snapshots of a versioned table,
    // computed from changed files only. CDC consumers (a derived
    // aggregate refresh, an audit query) subscribe from plain SQL.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_cdf"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, "graft_cdf",
        "graft_cdf(dir, fromVersion, toVersion) - change data feed " +
          "between two snapshots of a graft versioned table: after " +
          "images as _change_type='insert', before images as 'delete' " +
          "(an updated key surfaces as one of each)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_cdf takes (dir, fromVersion, toVersion)")
        def longLit(e: Expression, what: String): Long = e match {
          case Literal(n: java.lang.Number, _) => n.longValue()
          case other => throw new IllegalArgumentException(
            s"graft_cdf: $what must be an integer literal, got $other")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val dir = children.head match {
          case Literal(v, _) if v != null =>
            graft.plans.LakehouseSql.resolveRef(spark, String.valueOf(v))
          case other => throw new IllegalArgumentException(
            s"graft_cdf: dir must be a non-null string literal, got $other")
        }
        graft.ops.Upsert.changeDataFeed(spark, dir,
          longLit(children(1), "fromVersion"), longLit(children(2), "toVersion"))
          .queryExecution.analyzed
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[FloatVectorDot].getName, null, "vec_dot",
        "vec_dot(a, b) - dot product of two array<float> columns " +
          "(double accumulation, codegen'd)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("norm_text"),
      new ExpressionInfo(
        classOf[NormalizeAscii].getName, null, "norm_text",
        "norm_text(s) - one-pass ASCII normalize: lowercase, keep " +
          "[a-z0-9 ], collapse spaces (codegen'd)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "norm_text takes exactly 1 argument")
        NormalizeAscii(children.head)
      }))
    // The composite functions below build catalyst expression trees
    // directly (a registry builder must return resolvable nodes — a
    // Column round-trip leaves UnresolvedFunction inside an opaque
    // ColumnNodeExpression the analyzer won't descend into). Each tree
    // mirrors its graft.ops Column operator node-for-node, and the
    // q_sql_functions gate pins SQL-path results against the DuckDB
    // oracle so the two surfaces cannot drift silently. All are
    // built-in-composed projections: codegen'd, shuffle-free.
    def unary(name: String, doc: String)(build: Expression => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, doc, ""),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly 1 argument")
          build(children.head)
        }))
    unary("scrub_pii",
      "scrub_pii(s) - redact email/IPv4/phone spans to <EMAIL>/<IP>/<PHONE> " +
        "tags (ordered regexp_replace chain; same patterns as ops.TextPrep)") { e =>
      // same fold order as ops.TextPrep.scrubPii (email first)
      graft.ops.TextPrep.piiPatterns.foldLeft(e) {
        case (acc, (pat, tag)) => RegExpReplace(acc, Literal(pat), Literal(tag))
      }
    }
    unary("token_count",
      "token_count(s) - whitespace token count (size(split(s, ' ')))") { e =>
      Size(new StringSplit(e, Literal(" ")))
    }
    unary("hash60",
      "hash60(s) - 60-bit stable content hash (first 15 hex chars of md5 " +
        "as a long); the dedup/minhash hash of ops.Dedup") { e =>
      // conv(substring(md5(s), 1, 15), 16, 10) cast long — ops.Dedup.hash60
      Cast(
        Conv(
          Substring(Md5(Cast(e, BinaryType)), Literal(1), Literal(15)),
          Literal(16), Literal(10)),
        LongType)
    }
  }
}
