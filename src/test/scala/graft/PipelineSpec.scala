package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ScopedConf
import graft.jobs.MetadataJob
import graft.operators.{GraphExpansion, Multimodal}
import graft.queries.GraphQ
import graft.sources.{CsvGraphStage, MetadataSource, SqsPublisher}

/** End-to-end pipeline seams: CSV staging round-trip, job lifecycle,
  * scoped config, metadata SQL shape, multimodal plumbing. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CSV stage round-trip preserves the graph exactly") {
    val dir = Files.createTempDirectory("graft_stage").toString
    val tables = GraphExpansion.tableMetadata(spark, GraphQ.readColumnsMeta(spark))
    val nodes = GraphExpansion.nodes(spark, tables)
    val rels = GraphExpansion.relations(spark, tables)
    CsvGraphStage.writeNodes(nodes, s"$dir/nodes")
    CsvGraphStage.writeRelations(rels, s"$dir/relationships")
    val nodesBack = CsvGraphStage.readNodes(spark, s"$dir/nodes")
    val relsBack = CsvGraphStage.readRelations(spark, s"$dir/relationships")
    assert(nodesBack.collect().toSet == nodes.collect().toSet)
    assert(relsBack.collect().toSet == rels.collect().toSet)
  }

  test("QuarantineCsv: malformed rows land in quarantine with the raw line, clean rows parse") {
    import graft.sources.QuarantineCsv
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_quar").toString
    // two good rows, one type-bad (abc as int), one arity-bad
    Files.writeString(java.nio.file.Path.of(s"$dir/part1.csv"),
      "id,name,score\n1,alpha,10\n2,beta,20\nx3,gamma,abc\n")
    Files.writeString(java.nio.file.Path.of(s"$dir/part2.csv"),
      "id,name,score\n4,delta,40\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", IntegerType)))
    val parsed = QuarantineCsv.readWithQuarantine(spark, dir, schema).cache()
    try {
      val (clean, quar) = QuarantineCsv.split(parsed)
      assert(clean.columns.toSeq == Seq("id", "name", "score"))
      assert(clean.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ==
        Set((1L, "alpha", 10), (2L, "beta", 20), (4L, "delta", 40)))
      val raw = quar.collect().map(_.getString(0)).toSet
      assert(raw == Set("x3,gamma,abc"), raw.toString) // raw line preserved for replay
      // schema guard: declaring the corrupt column yourself is rejected
      intercept[IllegalArgumentException] {
        QuarantineCsv.readWithQuarantine(spark, dir, StructType(schema.fields :+
          StructField(QuarantineCsv.CorruptCol, StringType)))
      }
    } finally parsed.unpersist()
  }

  test("QuarantineCsv JSONL path: broken syntax AND type-bad valid JSON both quarantine") {
    import graft.sources.QuarantineCsv
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jquar").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/a.jsonl"),
      """{"id": 1, "name": "alpha"}
        |{"id": "oops", "name": "beta"}
        |{broken json
        |{"id": 4, "name": "delta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val parsed = QuarantineCsv.readJsonlWithQuarantine(spark, dir, schema).cache()
    try {
      val (clean, quar) = QuarantineCsv.split(parsed)
      assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "alpha"), (4L, "delta")))
      val raw = quar.collect().map(_.getString(0)).toSet
      assert(raw == Set("""{"id": "oops", "name": "beta"}""", "{broken json"), raw)
    } finally parsed.unpersist()
  }

  test("MetadataJob full lifecycle publishes one parity envelope") {
    val dir = Files.createTempDirectory("graft_job").toString
    val conf = ScopedConf(
      "extractor.csv.path" -> GraphQ.fixturePath,
      "loader.csv.node_dir" -> s"$dir/nodes",
      "loader.csv.relation_dir" -> s"$dir/relationships",
      "publisher.awssqs.queue_url" -> "q://test")
    val t = new SqsPublisher.Recording
    val job = new MetadataJob(spark, conf, t)
    job.launch()
    assert(job.succeeded == 1 && job.failed == 0)
    assert(t.sent.size == 1)
    val (queue, body, gid) = t.sent.head
    assert(queue == "q://test" && gid == "metadata")
    assert(body.startsWith("""{"nodes": ["""))
    assert("\"KEY\"".r.findAllIn(body).size == 20)
    assert("\"START_KEY\"".r.findAllIn(body).size == 19)
  }

  test("C2 metrics: success/fail counters under the reference prefix") {
    val dir = Files.createTempDirectory("graft_job_metrics").toString
    def conf(path: String) = ScopedConf(
      "job.is_statsd_enabled" -> "true",
      "job.identifier" -> "shop_mysql",
      "extractor.csv.path" -> path,
      "loader.csv.node_dir" -> s"$dir/nodes",
      "loader.csv.relation_dir" -> s"$dir/relationships",
      "publisher.awssqs.queue_url" -> "q://test")
    val sink = new graft.jobs.MetricsSink.InMemory
    new MetadataJob(spark, conf(GraphQ.fixturePath), new SqsPublisher.Recording, sink).launch()
    assert(sink.value("amundsen.databuilder.job.shop_mysql.success") == 1)
    assert(sink.value("amundsen.databuilder.job.shop_mysql.fail") == 0)
    // a failing launch increments .fail and rethrows
    intercept[Exception] {
      new MetadataJob(spark, conf(s"$dir/does_not_exist"), new SqsPublisher.Recording, sink).launch()
    }
    assert(sink.value("amundsen.databuilder.job.shop_mysql.success") == 1)
    assert(sink.value("amundsen.databuilder.job.shop_mysql.fail") == 1)
    // gating: disabled (default) emits nothing
    val quiet = new graft.jobs.MetricsSink.InMemory
    val noStatsd = ScopedConf(
      "extractor.csv.path" -> GraphQ.fixturePath,
      "loader.csv.node_dir" -> s"$dir/nodes2",
      "loader.csv.relation_dir" -> s"$dir/relationships2",
      "publisher.awssqs.queue_url" -> "q://test")
    new MetadataJob(spark, noStatsd, new SqsPublisher.Recording, quiet).launch()
    assert(quiet.all.isEmpty)
  }

  test("ScopedConf: dotted scoping, fallback, parsing") {
    val c = ScopedConf.parse(
      """# comment
        |publisher.awssqs.queue_url = "q://x"
        |publisher.awssqs.chunked: true
        |extractor.jdbc.url = jdbc:mysql://host/db
        |""".stripMargin)
    val pub = c.scoped("publisher.awssqs")
    assert(pub("queue_url") == "q://x")
    assert(pub.getBoolean("chunked"))
    assert(c.scoped("extractor").get("jdbc.url").contains("jdbc:mysql://host/db"))
    val merged = ScopedConf("a.b" -> "1").withFallback(ScopedConf("a.b" -> "2", "a.c" -> "3"))
    assert(merged("a.b") == "1" && merged("a.c") == "3")
  }

  test("job registry resolves (dbType, queueType) like docker.conf") {
    val c = ScopedConf("database.mysql.job.aws_sqs" -> "jobs.MysqlJob")
    assert(MetadataJob.resolveJobKind(c, "mysql", "aws_sqs").contains("jobs.MysqlJob"))
    assert(MetadataJob.resolveJobKind(c, "postgres", "aws_sqs").isEmpty)
  }

  test("metadata SQL carries the reference's projection and pushdown") {
    val sql = MetadataSource.mysqlMetadataSql("WHERE c.table_schema = 'shop'", "main",
      useCatalogAsCluster = false)
    Seq("col_sort_order", "is_view", "table_description", "lower(c.table_schema)",
      "LEFT JOIN information_schema.TABLES", "WHERE c.table_schema = 'shop'")
      .foreach(s => assert(sql.contains(s), s"missing $s"))
    val pg = MetadataSource.postgresMetadataSql("", "main", useCatalogAsCluster = true)
    assert(pg.contains("pg_statio_all_tables") && pg.contains("objsubid = 0"))
  }

  test("corpus-clean pipeline: quality gate + dedup shrink the corpus, lang tagged") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cleaned = graft.jobs.CorpusCleanJob.clean(spark, docs).cache()
    val n = cleaned.count()
    assert(n > 0 && n < docs.count()) // near-dups exist at sf0.001 → strict shrink
    assert(cleaned.columns.contains("pred_lang") && cleaned.columns.contains("quality"))
    // every survivor gets a deterministic split assignment
    assert(cleaned.filter(!col("split").isin("train", "test")).count() == 0)
    // survivors are unique doc_ids and all meet the quality bar
    assert(cleaned.select("doc_id").distinct().count() == n)
    assert(cleaned.filter(col("quality") < 0.5).count() == 0)
  }

  test("corpus-clean pipeline: span-scrub stage cuts shared spans, keeps the docs") {
    import spark.implicits._
    // two high-quality docs sharing an 8-token run at different offsets
    // plus distinct filler (so neither the quality gate nor the doc-level
    // near-dup stage removes them) — the span stage must cut the run
    // from BOTH texts while both docs survive to the output
    val run = "s1 s2 s3 s4 s5 s6 s7 s8"
    val fillA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val fillB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillA $run", "a", 1L),
      (2L, s"$run $fillB", "b", 1L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = graft.jobs.CorpusCleanJob.clean(spark, docs, scrubSpans = true)
      .select("doc_id", "text", "n_chars").orderBy("doc_id").collect()
    assert(out.length == 2) // both docs survive
    assert(out(0).getString(1) == fillA && out(1).getString(1) == fillB)
    // n_chars re-derived from the post-scrub text
    assert(out(0).getLong(2) == fillA.length && out(1).getLong(2) == fillB.length)
    // without the stage the shared run stays in place
    val plain = graft.jobs.CorpusCleanJob.clean(spark, docs)
      .select("text").collect().map(_.getString(0))
    assert(plain.forall(_.contains(run)))
  }

  test("corpus-clean pipeline: blocklist and repetition stages drop their targets") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ids = docs.select("doc_id").limit(3).collect().map(_.getLong(0))
    val spamId = 999999L
    val spamText = ("spam " * 30).trim // 30 tokens, 1 type → rep_ratio 0.9667
    val spam = Seq((spamId, spamText, "en", "synthetic", spamText.length.toLong))
      .toDF(docs.columns: _*)
    val blocklist = Some(ids.toSeq.toDF("blocked_id"))
    val cleaned = graft.jobs.CorpusCleanJob.clean(
      spark, docs.unionByName(spam), blocklist = blocklist).cache()
    // blocked ids are gone even if they would pass every quality stage
    assert(cleaned.filter(col("doc_id").isin(ids: _*)).count() == 0)
    // the template-spam doc (rep_ratio 0.9667 > 0.95) is dropped by
    // the repetition stage
    assert(cleaned.filter(col("doc_id") === spamId).count() == 0)
    assert(cleaned.count() > 0)
  }

  test("corpus-clean pipeline: mixture balancing downsamples only overrepresented sources") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plain = graft.jobs.CorpusCleanJob.clean(spark, docs).cache()
    val balanced = graft.jobs.CorpusCleanJob.clean(spark, docs, balanceMixture = true).cache()
    // balancing is a pure filter over the unbalanced survivor set
    assert(balanced.count() <= plain.count())
    val balIds = balanced.select("doc_id").collect().map(_.getLong(0)).toSet
    val plainIds = plain.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(balIds.subsetOf(plainIds))
    // exact-semantics replay: recompute each source's bucket threshold
    // from the pre-balance survivors and check the kept set matches the
    // md5 rule id-for-id (realized per-source SHARES can wobble — ~25
    // docs/source means bucket realization noise — so the contract is
    // the rule, not a share inequality)
    val weights = plain.groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = weights.values.sum.toDouble
    val target = total / weights.size
    val thresh = weights.map { case (s, w) =>
      s -> "0123456789abcdefg".charAt(
        math.floor(math.min(1.0, target / w) * 16).toInt)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Char =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    val expected = plain.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, src) => bucket(id) < thresh(src) }
      .map(_._1).toSet
    assert(balIds == expected)
    assert(balIds.size < plainIds.size) // balancing actually dropped rows
  }

  test("compaction: fragmented corpus rewritten to few balanced files, lossless") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val frag = Files.createTempDirectory("graft_frag").toString
    val comp = Files.createTempDirectory("graft_comp").toString + "/out"
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 64) // the small-files shape
    val n = graft.sources.Compaction.compactParquet(spark, frag, comp,
      targetBytes = 1L << 20)
    assert(n == parquetFiles(comp)) // reported count is what's on disk
    assert(n < 64 && n >= 1)        // genuinely compacted
    val back = graft.sources.Compaction.read(spark, comp)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // in-place compaction is refused (a mid-write failure would destroy
    // the input)
    intercept[IllegalArgumentException] {
      graft.sources.Compaction.compactParquet(spark, frag, frag)
    }
  }

  test("compaction preserves hive partitioning with per-partition file sizing") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val frag = Files.createTempDirectory("graft_fragpart").toString
    val comp = Files.createTempDirectory("graft_comppart").toString + "/out"
    docs.repartition(16).write.mode("overwrite").partitionBy("lang").parquet(frag)
    val fs = new org.apache.hadoop.fs.Path(frag)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the layout is auto-detected from the k=v directory levels
    assert(graft.sources.Compaction.detectPartitionCols(
      fs, new org.apache.hadoop.fs.Path(frag)) == Seq("lang"))
    def langDirs(root: String): Seq[java.io.File] =
      new java.io.File(root).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    def filesIn(d: java.io.File): Int =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    val before = langDirs(frag).map(d => d.getName -> filesIn(d)).toMap
    assert(before.values.forall(_ >= 8)) // the fragmented shape
    val n = graft.sources.Compaction.compactParquet(spark, frag, comp,
      targetBytes = 1L << 20)
    // layout preserved — output has the same lang=* dirs, each shrunk
    assert(langDirs(comp).map(_.getName).sorted == langDirs(frag).map(_.getName).sorted)
    assert(langDirs(comp).forall(d => filesIn(d) >= 1 && filesIn(d) < before(d.getName)))
    assert(n == langDirs(comp).map(filesIn).sum) // reported count is on-disk truth
    // lossless (partitionBy moves lang to the end of the read schema —
    // realign before the set compare)
    val back = graft.sources.Compaction.read(spark, comp)
      .select(docs.columns.map(col): _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // guard: scheme-qualified alias of the input and either nesting
    // direction are all refused
    intercept[IllegalArgumentException] {
      graft.sources.Compaction.compactParquet(spark, frag, "file:" + frag)
    }
    intercept[IllegalArgumentException] {
      graft.sources.Compaction.compactParquet(spark, frag, frag + "/nested")
    }
    intercept[IllegalArgumentException] {
      graft.sources.Compaction.compactParquet(spark, s"$frag/lang=en", frag)
    }
    intercept[IllegalArgumentException] { // dot-dot alias of the input
      graft.sources.Compaction.compactParquet(
        spark, frag, frag + "/../" + new java.io.File(frag).getName)
    }
  }

  test("JDBC extraction path works end-to-end against embedded Derby") {
    val dbDir = Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dbDir/meta;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE cols (table_name VARCHAR(64), col_name VARCHAR(64), ord INT)")
      st.execute("INSERT INTO cols VALUES ('orders', 'id', 1), ('orders', 'total', 2)")
      st.close()
    } finally conn.close()
    val df = MetadataSource.jdbc(spark, url,
      "SELECT table_name, col_name, ord FROM cols WHERE table_name = 'orders'")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(_._3)
    assert(rows.toSeq == Seq(("orders", "id", 1), ("orders", "total", 2)))
  }

  test("partitioned JDBC extraction: >1 range query, same rows as the single read") {
    // round-4 verdict item 5: the partition options were plumbed but
    // never exercised — this pins that the stride actually splits the
    // read AND that rows outside [lower, upper] still arrive (bounds
    // shape the stride, they are not a filter)
    val dbDir = Files.createTempDirectory("graft_derby_part").toString
    val url = s"jdbc:derby:$dbDir/meta;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE cols (col_name VARCHAR(64), ord INT)")
      (1 to 100).foreach(i => st.execute(s"INSERT INTO cols VALUES ('c$i', $i)"))
      st.close()
    } finally conn.close()
    val part = MetadataSource.jdbcPartitioned(spark, url, "cols",
      partitionColumn = "ord", lowerBound = 10, upperBound = 90, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4) // one range predicate per task
    val single = MetadataSource.jdbc(spark, url, "SELECT col_name, ord FROM cols")
    val got = part.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    val want = single.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    assert(got.length == 100) // ord 1..9 and 91..100 rode the edge partitions
    assert(got.toSeq == want.toSeq)
  }

  test("multimodal: frame sampling emits every k-th chunk with bytes") {
    val df = Multimodal.withBinaryPayload(
      Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, "media", chunkBytes = 8, everyK = 2)
      .select("id", "frame_idx", "frame").collect()
    // 26 bytes / 8-byte chunks → idx 0..3, every 2nd → 0 and 2
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(new String(frames.head.getAs[Array[Byte]]("frame"), "UTF-8") == "abcdefgh")
  }

  test("multimodal: stub decode appends typed metadata per row") {
    val df = Multimodal.withBinaryPayload(
      Seq((1L, "hello"), (2L, "worlds!")).toDF("id", "text"), "text")
    val out = Multimodal.decodeMedia(df, "media")
    assert(out.schema.fieldNames.takeRight(4).toSeq == Seq("format", "width", "height", "n_bytes"))
    // decode must stay inside the SQL plan (typed mapPartitions), not
    // drop to an RDD and re-enter via createDataFrame
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
    val rows = out.select("id", "format", "n_bytes").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L) == (("jpeg", 5L)))
    assert(rows(2L) == (("jpeg", 7L)))
    // deterministic: same input → same metadata
    val again = Multimodal.decodeMedia(df, "media")
      .select("id", "width", "height").collect().toSet
    assert(again == out.select("id", "width", "height").collect().toSet)
  }

  test("corpus-clean pipeline: per-source cap and temperature mixing compose") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plain = graft.jobs.CorpusCleanJob.clean(spark, docs).cache()
    val mixed = graft.jobs.CorpusCleanJob.clean(spark, docs,
      temperatureMixture = true, capPerSource = Some(2)).cache()
    // both stages are pure filters over the plain survivor set
    val plainIds = plain.select("doc_id").collect().map(_.getLong(0)).toSet
    val mixedIds = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixedIds.subsetOf(plainIds))
    // the hard cap binds after every upstream stage
    val perSource = mixed.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) <= 2))
    // the two mixing rules are mutually exclusive, loudly
    intercept[IllegalArgumentException] {
      graft.jobs.CorpusCleanJob.clean(spark, docs,
        balanceMixture = true, temperatureMixture = true)
    }
  }
}
