package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** The catalog-as-a-streaming-source contracts: offsets are committed
  * versions, a batch is exactly one manifest delta, checkpointed
  * resume re-reads nothing, torn writes never reach a batch, and the
  * decoded rows equal the manifest-resolved parquet scan of the same
  * files.
  */
class StoreFollowSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  private def drainOnce(base: String, ckpt: String, sink: String): Unit = {
    val q = spark.readStream.format("graft-store-changes")
      .option("path", base).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.groupBy()
          .agg(count(lit(1)).as("n_rows"),
            sum(col("vec_id")).cast("long").as("id_sum"),
            countDistinct(col("bucket")).as("n_buckets"))
          .withColumn("batch", lit(id))
          .write.mode("append").parquet(sink)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("follower drains version deltas exactly once across restarts; torn writes invisible") {
    val base = Files.createTempDirectory("graft_follow").toString
    val ckpt = Files.createTempDirectory("graft_follow_ck").toString
    val sink = Files.createTempDirectory("graft_follow_sink").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      drainOnce(base, ckpt, sink) // batch 0: v0 -> v1
      // a torn write inside a bucket dir must never reach a batch —
      // the source lists manifests, not directories
      val bucketDir = Paths.get(IndexCatalog.latestFiles(base).head).getParent
      Files.writeString(bucketDir.resolve("part-torn.parquet"), "torn")
      drainOnce(base, ckpt, sink) // no new version: no batch
      SimilarityQueries.appendEmbedStore(spark, // v2
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1), base)
      drainOnce(base, ckpt, sink) // batch 1: v1 -> v2
      SimilarityQueries.appendEmbedStore(spark, // v3
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 5), base)
      drainOnce(base, ckpt, sink) // batch 2: v2 -> v3
      drainOnce(base, ckpt, sink) // idle store: still no batch
      // maintenance is layout, not data: a compaction rewrite commits
      // v4 with fresh paths for the SAME rows — the follower must not
      // re-deliver them (the naive files(end)∖files(start) diff would)
      SimilarityQueries.compactEmbedStore(spark, base) // v4
      drainOnce(base, ckpt, sink)

      val out = spark.read.parquet(sink)
        .orderBy("batch")
        .collect().map(r => (r.getAs[Long]("batch"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("id_sum")))
      // three data batches — one per append-type commit, none for the
      // idle drains, none for the torn write; the compaction advances
      // the offset with an EMPTY batch (layout changed, data did not)
      assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
      assert(out.last._2 == 0L, "compaction re-delivered rows")
      val expect = Seq(
        embeddingsOf(pmod(col("vec_id"), lit(2)) === 0),
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1),
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 5))
        .map(df => (df.count(),
          df.agg(sum("vec_id").cast("long")).collect()(0).getLong(0)))
      out.init.zip(expect).foreach { case ((_, n, s), (en, es)) =>
        assert(n == en && s == es, s"batch census ($n,$s) != ($en,$es)")
      }
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("versionsPerBatch=1 replays a multi-commit backlog one manifest delta per micro-batch") {
    val base = Files.createTempDirectory("graft_vpb").toString
    val ckpt = Files.createTempDirectory("graft_vpb_ck").toString
    val sink = Files.createTempDirectory("graft_vpb_sink").toString
    def drainWith(vpb: String): Unit = {
      val q = spark.readStream.format("graft-store-changes")
        .option("path", base).option("versionsPerBatch", vpb).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.groupBy()
            .agg(count(lit(1)).as("n_rows"),
              sum(col("vec_id")).cast("long").as("id_sum"))
            .withColumn("batch", lit(id))
            .write.mode("append").parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      // three commits BEFORE any drain: the backlog posture the gated
      // q_stream_store_follow now runs (one engine start, not three)
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      SimilarityQueries.appendEmbedStore(spark,
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1), base) // v2
      SimilarityQueries.appendEmbedStore(spark,
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 5), base) // v3
      drainWith("1")
      val out = spark.read.parquet(sink).orderBy("batch")
        .collect().map(r => (r.getAs[Long]("batch"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("id_sum")))
      val expect = Seq(
        embeddingsOf(pmod(col("vec_id"), lit(2)) === 0),
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1),
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 5))
        .map(df => (df.count(),
          df.agg(sum("vec_id").cast("long")).collect()(0).getLong(0)))
      // one batch per version, ids 0,1,2, each census exactly one delta
      assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
      out.zip(expect).foreach { case ((_, n, s), (en, es)) =>
        assert(n == en && s == es, s"per-version census ($n,$s) != ($en,$es)")
      }
      // idle drain under admission control: offset parked at the cap,
      // no further batch
      val before = out.length
      drainWith("1")
      assert(spark.read.parquet(sink).count() == before.toLong,
        "idle drain produced a batch under versionsPerBatch=1")
      // a further append then drains with k=2: one batch spanning it —
      // k bounds the SPAN, it never splits below one version
      SimilarityQueries.appendEmbedStore(spark,
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 3), base) // v4
      drainWith("2")
      val last = spark.read.parquet(sink).orderBy("batch").collect().last
      val a4 = embeddingsOf(pmod(col("vec_id"), lit(8)) === 3)
      assert(last.getAs[Long]("n_rows") == a4.count() &&
        last.getAs[Long]("id_sum") ==
          a4.agg(sum("vec_id").cast("long")).collect()(0).getLong(0))
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("startingVersion=latest tail-follows: history invisible, only new commits stream") {
    val base = Files.createTempDirectory("graft_tail").toString
    val ckpt = Files.createTempDirectory("graft_tail_ck").toString
    val sink = Files.createTempDirectory("graft_tail_sink").toString
    def drainLatest(): Unit = {
      val q = spark.readStream.format("graft-store-changes")
        .option("path", base).option("startingVersion", "latest").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: history
      drainLatest() // joins AT v1 — the build must not stream
      // (the engine still runs an empty batch 0 to seed the
      // checkpoint, so assert zero ROWS, not zero sink files)
      val historyRows =
        scala.util.Try(spark.read.parquet(sink).count()).getOrElse(0L)
      assert(historyRows == 0L, "tail-follow streamed history")
      SimilarityQueries.appendEmbedStore(spark,
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1), base) // v2
      drainLatest() // checkpointed offset v1 → streams exactly the append
      val got = spark.read.parquet(sink).select("vec_id")
        .collect().map(_.getLong(0)).sorted
      val want = embeddingsOf(pmod(col("vec_id"), lit(8)) === 1)
        .select("vec_id").collect().map(_.getLong(0)).sorted
      assert(got.nonEmpty && got.sameElements(want))
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("a consumer lagging past vacuum retention fails fast at offset resolution") {
    val base = Files.createTempDirectory("graft_lag").toString
    val ckpt = Files.createTempDirectory("graft_lag_ck").toString
    val sink = Files.createTempDirectory("graft_lag_sink").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      drainOnce(base, ckpt, sink) // checkpoint parks at v1
      SimilarityQueries.appendEmbedStore(spark,
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 1), base) // v2
      SimilarityQueries.compactEmbedStore(spark, base) // v3
      IndexCatalog.vacuum(base, retain = 1) // v1, v2 manifests expire
      // the lagging consumer's next drain needs the v1→v2 delta whose
      // manifests are gone: resolution must fail loudly, never skip
      // silently over versions it cannot reconstruct
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        drainOnce(base, ckpt, sink)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[java.nio.file.NoSuchFileException]))
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("decoded rows equal the manifest-resolved parquet scan of the same files") {
    val base = Files.createTempDirectory("graft_follow_eq").toString
    val ckpt = Files.createTempDirectory("graft_follow_eq_ck").toString
    val sink = Files.createTempDirectory("graft_follow_eq_sink").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val q = spark.readStream.format("graft-store-changes")
        .option("path", base).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = spark.read.parquet(sink)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
        .collect().map(_.toString).sorted
      val direct = spark.read.option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.latestFiles(base): _*)
        .select(col("vec_id"), col("embedding"),
          col("nrm"), col("bucket").cast("long"))
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty && streamed.sameElements(direct))
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("cdc mode: maintenance nets zero classified rows, DML streams its row diff, appends stream as inserts") {
    val base = Files.createTempDirectory("graft_cdcm").toString
    val ckpt = Files.createTempDirectory("graft_cdcm_ck").toString
    val sink = Files.createTempDirectory("graft_cdcm_sink").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: evens
      SimilarityQueries.compactEmbedStore(spark, base) // v2: maintenance
      SimilarityQueries.deleteFromEmbedStore(spark, base, // v3: DML
        embeddingsOf(pmod(col("vec_id"), lit(8)) === 4)
          .select(col("vec_id"), col("embedding")))
      val q = spark.readStream.format("graft-store-changes")
        .option("path", base).option("mode", "cdc").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val pinned = b.persist()
          try {
            def side(s: String) = pinned.filter(col("side") === s)
              .select(col("version"), col("vec_id"), col("embedding"),
                col("bucket"))
            SimilarityQueries
              .classifyChanges(side("old"), side("new"), Seq("version"))
              .write.mode("append").parquet(sink)
          } finally { pinned.unpersist(); () }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val feed = spark.read.parquet(sink)
        .groupBy(col("version"), col("change_type")).count()
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val nEvens = embeddingsOf(pmod(col("vec_id"), lit(2)) === 0).count()
      val nDel = embeddingsOf(pmod(col("vec_id"), lit(8)) === 4).count()
      // v1: the build streams as pure inserts
      assert(feed.get((1L, "insert")).contains(nEvens))
      // v2: the compaction rewrote every row identically — ZERO
      // classified rows, with no commit-type special-casing
      assert(!feed.keys.exists(_._1 == 2L),
        s"maintenance leaked into the cdc feed: $feed")
      // v3: exactly the deletes, nothing else
      assert(feed.get((3L, "delete")).contains(nDel))
      assert(feed.keys.count(_._1 == 3L) == 1)
    } finally Seq(base, ckpt, sink).foreach(graft.Fs.deleteRecursively)
  }

  test("reader options are case-insensitive in getTable, not just schema inference") {
    // Spark resolves inferSchema through a CaseInsensitiveStringMap but
    // hands getTable the ORIGINAL-cased map: a raw get there silently
    // ignored a user's "Mode"/"STARTINGVERSION" spelling — the table
    // then ran append-mode against the 6-column CDC schema the
    // inference had already promised for the same options
    import scala.jdk.CollectionConverters._
    val src = new graft.sources.StoreChangeSource
    val odd = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("Mode" -> "cdc", "PATH" -> "/tmp/nowhere",
        "STARTINGVERSION" -> "5").asJava)
    assert(src.inferSchema(odd) == graft.sources.StoreChangeSource.CdcSchema)
    val table = src.getTable(null, Array.empty,
      Map("Mode" -> "cdc", "PATH" -> "/tmp/nowhere",
        "STARTINGVERSION" -> "5").asJava)
    assert(table.schema() == graft.sources.StoreChangeSource.CdcSchema,
      "getTable ignored the original-cased mode option")
    assert(table.name().endsWith(",cdc)"),
      s"mode lost in getTable: ${table.name()}")
  }
}
