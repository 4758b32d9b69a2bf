package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.core.{SchemaProfiler, Tables}
import graft.io.{MetaTracker, ParamsJson, VersionedCsv}
import Q.QueryFn

/** Driver-checked queries for the source/sink + schema-profiling surface
  * (SURVEY §2.1, §1.3): versioned-CSV round trips, lineage checks, params
  * JSON, and the semantic type profiler.
  */
object SourceQueries {

  /** S1+S5: nation -> versioned CSV (META header) -> lenient CSV scan. */
  private def s1CsvRoundtrip: QueryFn = (s, dir) => {
    val out = Q.tempDir("graft_s1")
    val tracker = new MetaTracker
    tracker.addChange("import nation")
    val path = VersionedCsv.saveVersioned(Tables.nation(s, dir), out, "nation", tracker)
    val (df, meta) = VersionedCsv.readVersioned(s, path)
    require(meta.version == 1, s"expected v1, got v${meta.version}")
    df.select(col("n_nationkey").cast("int"), col("n_name").cast("string"),
      col("n_regionkey").cast("int"))
  }

  /** S2: all-string CSV scan (dtype=str + fillna("")). */
  private def s2CsvAllString: QueryFn = (s, dir) => {
    val out = Q.tempDir("graft_s2")
    val tracker = new MetaTracker
    val path = VersionedCsv.saveVersioned(Tables.region(s, dir), out, "region", tracker)
    VersionedCsv.read(s, path, allString = true)
      .toDF("r_regionkey", "r_name")
  }

  /** S7: version lineage parsing/checking on representative filenames. */
  private def s7VersionCheck: QueryFn = (s, _) => {
    val files = Seq("diabetes_v0.csv", "diabetes_v3.csv", "sales_train_v2.csv",
      "sales_test_v2.csv", "sales_test_v3.csv", "plain.csv")
    val rows = files.map { f =>
      (f, VersionedCsv.baseName(f),
        VersionedCsv.extractVersion(f).map(Integer.valueOf).orNull)
    }
    val pairOk = VersionedCsv.checkTrainTestVersions("sales_train_v2.csv", "sales_test_v2.csv").isRight
    val pairBad = VersionedCsv.checkTrainTestVersions("sales_train_v2.csv", "sales_test_v3.csv").isLeft
    require(pairOk && pairBad, "version pair check broken")
    import s.implicits._
    rows.toDF("file", "base", "version")
  }

  /** S9: hyperparameter JSON sink/source round trip. */
  private def s9ParamsJson: QueryFn = (s, _) => {
    import ParamsJson._
    val path = Q.tempDir("graft_s9") + "/params.json"
    write(path, ListMap(
      "model" -> JStr("random_forest"),
      "n_estimators" -> JNum(200),
      "max_depth" -> JNum(10),
      "learning_rate" -> JNum(0.1),
      "bootstrap" -> JBool(true),
      "max_features" -> JNull))
    val back = read(path)
    import s.implicits._
    back.toSeq.map { case (k, v) =>
      val (kind, value) = v match {
        case JStr(x) => ("str", x)
        case JNum(x) => ("num", if (x == x.floor) x.toLong.toString else x.toString)
        case JBool(x) => ("bool", x.toString)
        case JNull => ("null", null: String)
      }
      (k, kind, value)
    }.toDF("param", "kind", "value")
  }

  /** §1.3: semantic type profile of the documents table (one-pass). */
  private def profileDocuments: QueryFn = (s, dir) =>
    SchemaProfiler.profile(Tables.documents(s, dir))

  /** S4: nation -> minimal .xlsx fixture -> JDK-only Excel scan. */
  private def s4ExcelScan: QueryFn = (s, dir) => {
    val path = Q.tempDir("graft_s4") + "/nation.xlsx"
    val src = Tables.nation(s, dir).select("n_nationkey", "n_name")
      .orderBy("n_nationkey").collect()
    graft.io.ExcelSource.write(
      Seq("n_nationkey", "n_name") +:
        src.toIndexedSeq.map(r => Seq(r.get(0).toString, r.getString(1))),
      path)
    graft.io.ExcelSource.read(s, path)
      .select(col("n_nationkey").cast("int"), col("n_name"))
  }

  /** S4 legacy half: nation -> hand-built BIFF8 .xls (OLE2 container,
    * SST/LABELSST strings, RK ints, NUMBER doubles) -> magic-byte
    * dispatch through ExcelSource.read -> typed projection. The fixture
    * is small, so it lands in the CFB MINI stream — the reader's
    * miniFAT path runs on every gate. */
  private def s4bXlsScan: QueryFn = (s, dir) => {
    val path = Q.tempDir("graft_s4b") + "/nation.xls"
    val src = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
    graft.io.XlsSource.write(
      Seq[Seq[Any]](Seq("n_nationkey", "n_name", "n_regionkey")) ++
        src.toIndexedSeq.map(r => Seq[Any](r.getAs[Number](0).intValue(),
          r.getString(1), r.getAs[Number](2).doubleValue())),
      path)
    graft.io.ExcelSource.read(s, path)
      .select(col("n_nationkey").cast("bigint"), col("n_name"),
        col("n_regionkey").cast("bigint"))
  }

  /** S-ext: WARC ingest — documents round-tripped through real ISO-28500
    * records (HTTP response payloads, exact Content-Length framing), one
    * plain file + one GZIPPED file read through the same glob, HTTP
    * headers stripped on read. The Common Crawl entry path. */
  private def s28WarcScan: QueryFn = (s, dir) => {
    val root = Q.tempDir("graft_s28")
    val docs = Tables.documents(s, dir).select("doc_id", "text")
      .orderBy("doc_id").collect()
    val (a, b) = docs.splitAt(docs.length / 2)
    def recs(rows: Array[org.apache.spark.sql.Row]) = rows.toSeq.map { r =>
      (s"<urn:uuid:${r.getLong(0)}>", "response",
        s"http://example.com/doc/${r.getLong(0)}",
        "application/http; msgtype=response",
        graft.io.WarcSource.httpResponse(r.getString(1), "text/plain"))
    }
    graft.io.WarcSource.write(recs(a), s"$root/part1.warc")
    graft.io.WarcSource.write(recs(b), s"$root/part2.warc.gz", gzip = true)
    graft.io.WarcSource.read(s, s"$root/*.warc*", httpBody = true)
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("bigint").as("doc_id"),
        decode(col("content"), "UTF-8").as("text"))
  }

  val queries: Map[String, QueryFn] = Map(
    "s28_warc_scan" -> s28WarcScan,
    "s1_csv_roundtrip" -> s1CsvRoundtrip,
    "s2_csv_allstring" -> s2CsvAllString,
    "s4_excel_scan" -> s4ExcelScan,
    "s4b_xls_scan" -> s4bXlsScan,
    "s7_version_check" -> s7VersionCheck,
    "s9_params_json" -> s9ParamsJson,
    "s13_schema_profile" -> profileDocuments,

    "s14_corpus_sink" -> ((s, dir) => {
      // partitioned-layout write + pruned read-back: per-lang counts
      // must survive the hive-partitioned round trip exactly
      val out = Q.tempDir("graft_s14")
      graft.io.CorpusSink.writePartitioned(
        Tables.documents(s, dir), out, "lang", maxRecordsPerFile = 100L)
      graft.io.CorpusSink.readPartitioned(s, out)
        .groupBy("lang").agg(count(lit(1)).as("n"))
    }),

    "s27_schema_merge" -> ((s, dir) => {
      // schema evolution across snapshot generations: v1 lacks `lang`,
      // v2 adds it. mergeSchema unions the footers, v1 rows read the
      // new column as null — the per-file-pruned read every long-lived
      // dataset relies on when columns are added mid-life
      val out = Q.tempDir("graft_s27")
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") < 250).select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$out/gen=1")
      docs.filter(col("doc_id") >= 250).select("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$out/gen=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
    }),

    "s26_compact" -> ((s, dir) => {
      // small-files OPTIMIZE: write with a tiny per-file cap (many tiny
      // files), compact toward one big file, and prove the content
      // survives the two-rename swap exactly (per-lang counts). The
      // file-count shrink itself is asserted in SinkSpec.
      val out = Q.tempDir("graft_s26")
      graft.io.CorpusSink.writePartitioned(
        Tables.documents(s, dir), out, "lang", maxRecordsPerFile = 20L)
      graft.io.CorpusSink.compact(s, out, targetBytes = 1L << 30,
        partitionCol = Some("lang"))
      graft.io.CorpusSink.readPartitioned(s, out)
        .groupBy("lang").agg(count(lit(1)).as("n"))
    }),

    "s16_snapshot_diff" -> ((s, dir) => {
      // v(N) = docs 0..; v(N+1) drops ids < 20, adds 90000..90009,
      // rewrites text of 20 <= id < 40 — exact EXCEPT/INTERSECT oracle
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val oldV = docs
      val newV = docs.filter(col("doc_id") >= 20)
        .withColumn("text", when(col("doc_id") < 40,
          concat(col("text"), lit(" rewritten"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") < 10)
          .select((col("doc_id") + 90000).as("doc_id"), col("text")))
      graft.ops.Corpus.diffSnapshots(oldV, newV, "text", "doc_id")
    }),

    "s32_skipping_index" -> ((s, dir) => {
      // file-level data skipping (r6): doc_id-sorted small files + a
      // per-file min/max manifest; the range read opens only the
      // overlapping files and returns exactly the full-scan answer
      import org.apache.spark.sql.functions.col
      val out = Q.tempDir("graft_s32") + "/corpus"
      Tables.documents(s, dir).select("doc_id", "lang", "source")
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(out)
      graft.io.SkippingIndex.build(s, out, Seq("doc_id"))
      graft.io.SkippingIndex.prunedRead(s, out, "doc_id", 100L, 199L)
    }),

    "s33_incremental_agg" -> ((s, dir) => {
      // incremental aggregate maintenance (r6): build the per-lang
      // manifest, MERGE a change batch (every 10th doc's n_chars bumped
      // by 1000, five new docs in a new lang=zz partition), refresh the
      // manifest ONLY for the touched partitions, and answer from the
      // manifest — the oracle's full recompute over the replayed final
      // state must match bit for bit
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val out = Q.tempDir("graft_s33") + "/corpus"
      val d = Tables.documents(s, dir)
      graft.io.CorpusSink.writePartitioned(
        d.select(col("doc_id"), col("lang"), col("n_chars")), out, "lang")
      graft.io.AggManifest.build(s, out, "lang", "n_chars")
      val updates = d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 1000).as("n_chars"))
        .unionByName(d.filter(col("doc_id") < 5)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            lit("zz").as("lang"), lit(7L).as("n_chars")))
      val touched = graft.io.CorpusSink.upsertPartitions(s, out, updates,
        "doc_id", "lang")
      graft.io.AggManifest.refresh(s, out, "lang", "n_chars", touched)
      graft.io.AggManifest.read(s, out)
        .select(col("lang"), col("n"), col("sum_v").cast("double").as("sum_v"))
    }),

    "s31_merge_upsert" -> ((s, dir) => {
      // partition-scoped MERGE (r6): v1 corpus partitioned by lang;
      // the update batch rewrites every 10th doc as v2 and inserts five
      // new docs into a brand-new lang=zz partition; only touched
      // partition dirs swap (two renames each, old-or-new complete)
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val out = Q.tempDir("graft_s31") + "/corpus"
      val d = Tables.documents(s, dir)
      graft.io.CorpusSink.writePartitioned(
        d.select(col("doc_id"), col("lang"), lit("v1").as("ver")),
        out, "lang")
      val updates = d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("doc_id"), col("lang"), lit("v2").as("ver"))
        .unionByName(d.filter(col("doc_id") < 5)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            lit("zz").as("lang"), lit("v2").as("ver")))
      graft.io.CorpusSink.upsertPartitions(s, out, updates, "doc_id", "lang")
      s.read.parquet(out).select("doc_id", "lang", "ver")
    }),

    "s30_zorder" -> ((s, dir) => {
      // Morton/Z-order clustering key (r6): the exact-integer bit
      // interleave behind OPTIMIZE ZORDER BY, over a deterministic
      // 1024x1024 cell grid; the oracle replays all 64 bit terms
      import org.apache.spark.sql.functions.{call_function, col, lit, pmod}
      Tables.documents(s, dir).select(col("doc_id"),
          pmod(col("doc_id"), lit(1024)).cast("long").as("x"),
          pmod(col("doc_id") * 7919, lit(1024)).cast("long").as("y"))
        .withColumn("z", call_function("z_order", col("x"), col("y")))
    }),

    "s29_orc_roundtrip" -> ((s, dir) => {
      // ORC write + read-back (r6): Spark's second columnar format as a
      // first-class sink/source — the read-back predicate and projection
      // push into the ORC scan exactly as with parquet (spec pins
      // PushedFilters on the OrcScan)
      import org.apache.spark.sql.functions.col
      val out = Q.tempDir("graft_s29") + "/docs"
      Tables.documents(s, dir).select("doc_id", "text", "lang", "source")
        .write.mode("overwrite").orc(out)
      s.read.orc(out).filter(col("doc_id") < 100)
        .select("doc_id", "lang", "source")
    }),

    "s15_jsonl_roundtrip" -> ((s, dir) => {
      // JSONL write + lenient read-back: clean corpus round-trips
      // exactly, zero quarantined lines (corrupt-line handling is
      // IoSpec's planted fixture)
      val out = Q.tempDir("graft_s15") + "/docs"
      val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
      graft.io.Jsonl.write(docs, out)
      val (good, bad) = graft.io.Jsonl.read(s, out, docs.schema)
      good.withColumn("n_quarantined", lit(bad.count()))
    }))

  val oracles: Map[String, String] = Map(
    "s1_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "s29_orc_roundtrip" ->
      "SELECT doc_id, lang, source FROM documents WHERE doc_id < 100",
    "s32_skipping_index" -> """
      SELECT doc_id, lang, source FROM documents
      WHERE doc_id BETWEEN 100 AND 199""",
    // s33: full recompute over the logically replayed final state —
    // equality proves the incremental refresh path
    "s33_incremental_agg" -> """
      WITH final AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
                    ELSE n_chars END AS n_chars
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000000, 'zz', 7 FROM documents WHERE doc_id < 5)
      SELECT lang, count(*) AS n,
             CAST(sum(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
      FROM final GROUP BY lang""",

    "s31_merge_upsert" -> """
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0 THEN 'v2' ELSE 'v1' END AS ver
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000000 AS doc_id, 'zz' AS lang, 'v2' AS ver
      FROM documents WHERE doc_id < 5""",
    // all 64 interleave terms generated mechanically — pure BIGINT bit
    // arithmetic, engine-exact on both sides
    "s30_zorder" -> {
      val terms = (0 until 32).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""
      WITH c AS (SELECT doc_id, doc_id % 1024 AS x,
                        (doc_id * 7919) % 1024 AS y FROM documents)
      SELECT doc_id, x, y, ($terms) AS z FROM c"""
    },
    "s14_corpus_sink" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "s26_compact" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    // old-generation rows surface the added column as NULL
    "s27_schema_merge" -> """
      SELECT CASE WHEN doc_id < 250 THEN NULL ELSE lang END AS lang,
             count(*) AS n, min(doc_id) AS min_id
      FROM documents GROUP BY 1""",
    "s15_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, CAST(0 AS BIGINT) AS n_quarantined FROM documents",
    "s16_snapshot_diff" -> """
      SELECT doc_id, 'removed' AS change FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id, 'changed' FROM documents WHERE doc_id >= 20 AND doc_id < 40
      UNION ALL
      SELECT doc_id + 90000, 'added' FROM documents WHERE doc_id < 10""",
    "s4_excel_scan" ->
      "SELECT n_nationkey, n_name FROM nation",
    "s4b_xls_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "s28_warc_scan" ->
      "SELECT doc_id, text FROM documents",
    "s2_csv_allstring" ->
      "SELECT CAST(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    "s7_version_check" -> """
      SELECT * FROM (VALUES
        ('diabetes_v0.csv','diabetes', 0),
        ('diabetes_v3.csv','diabetes', 3),
        ('sales_train_v2.csv','sales', 2),
        ('sales_test_v2.csv','sales', 2),
        ('sales_test_v3.csv','sales', 3),
        ('plain.csv','plain', CAST(NULL AS INT))
      ) AS t(file, base, version)""",
    "s9_params_json" -> """
      SELECT * FROM (VALUES
        ('model','str','random_forest'),
        ('n_estimators','num','200'),
        ('max_depth','num','10'),
        ('learning_rate','num','0.1'),
        ('bootstrap','bool','true'),
        ('max_features','null', CAST(NULL AS VARCHAR))
      ) AS t(param, kind, value)""",
    "s13_schema_profile" -> """
      WITH n AS (SELECT count(*) AS n_rows FROM documents)
      SELECT 'doc_id' AS "column", 'bigint' AS dtype, n.n_rows,
             (SELECT count(*) FROM documents WHERE doc_id IS NULL) AS null_count,
             (SELECT count(doc_id) FROM documents) AS numeric_count,
             0 AS date_count,
             (SELECT count(DISTINCT doc_id) FROM documents) AS distinct_count,
             'numeric' AS semantic FROM n
      UNION ALL
      SELECT 'text', 'string', n.n_rows,
             (SELECT count(*) FROM documents WHERE text IS NULL),
             (SELECT count(try_cast(text AS DOUBLE)) FROM documents),
             (SELECT count(*) FROM documents WHERE COALESCE(
                try_strptime(text,'%m/%d/%Y'), try_strptime(text,'%m/%d/%y'),
                try_strptime(text,'%d/%m/%Y'), try_strptime(text,'%Y-%m-%d'),
                try_strptime(text,'%d.%m.%Y'), try_strptime(text,'%Y/%m/%d')) IS NOT NULL),
             (SELECT count(DISTINCT text) FROM documents),
             'categorical' FROM n
      UNION ALL
      SELECT 'lang', 'string', n.n_rows,
             (SELECT count(*) FROM documents WHERE lang IS NULL),
             (SELECT count(try_cast(lang AS DOUBLE)) FROM documents),
             (SELECT count(*) FROM documents WHERE COALESCE(
                try_strptime(lang,'%m/%d/%Y'), try_strptime(lang,'%m/%d/%y'),
                try_strptime(lang,'%d/%m/%Y'), try_strptime(lang,'%Y-%m-%d'),
                try_strptime(lang,'%d.%m.%Y'), try_strptime(lang,'%Y/%m/%d')) IS NOT NULL),
             (SELECT count(DISTINCT lang) FROM documents),
             'categorical' FROM n
      UNION ALL
      SELECT 'source', 'string', n.n_rows,
             (SELECT count(*) FROM documents WHERE source IS NULL),
             (SELECT count(try_cast(source AS DOUBLE)) FROM documents),
             (SELECT count(*) FROM documents WHERE COALESCE(
                try_strptime(source,'%m/%d/%Y'), try_strptime(source,'%m/%d/%y'),
                try_strptime(source,'%d/%m/%Y'), try_strptime(source,'%Y-%m-%d'),
                try_strptime(source,'%d.%m.%Y'), try_strptime(source,'%Y/%m/%d')) IS NOT NULL),
             (SELECT count(DISTINCT source) FROM documents),
             'categorical' FROM n
      UNION ALL
      SELECT 'n_chars', 'bigint', n.n_rows,
             (SELECT count(*) FROM documents WHERE n_chars IS NULL),
             (SELECT count(n_chars) FROM documents),
             0,
             (SELECT count(DISTINCT n_chars) FROM documents),
             'numeric' FROM n""")
}
