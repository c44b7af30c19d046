package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted substring window store contracts: a probe of (build ∪
  * append) is row-identical to a one-shot rebuild over the union
  * corpus (including the df cap summing generation PARTIALS — a
  * window pushed over the cap BY an append disappears), committed
  * generations are byte-immutable under append, the store probes
  * answer exactly what the inline forms compute, and the streaming
  * gate's per-batch commit is replay-idempotent.
  */
class SubWindowsStoreSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_subwin_spec").toString

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def census(base: String): Seq[(Long, Long, Long, Long)] =
    DedupQueries.substringSpansOf(DedupQueries.storedKeptWindows(spark, base))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("append equals rebuild: cross-generation spans are found and df partials sum exactly at the cap boundary") {
    val span = words("dup", 12)
    val boiler = words("hot", 8) // one window, shared by 70 docs total
    // batch A: the span's keeper, 40 boiler carriers, a short doc
    val a = Seq(
      (1L, words("alpha", 10) + " " + span),
      (2L, words("tiny", 3))) ++ // < W tokens: no windows, still a doc row
      (100L until 140L).map(i => (i, words(s"fillA$i-", 4) + " " + boiler))
    // batch B (disjoint ids): the span's dup + 30 more boiler carriers
    // — 40 + 30 = 70 > SubCap(64), so the boiler window must vanish
    // from probes ONLY once both generations are in
    val b = Seq((51L, words("beta", 20) + " " + span)) ++
      (200L until 230L).map(i => (i, words(s"fillB$i-", 4) + " " + boiler))

    val grown = tmp()
    val rebuilt = tmp()
    try {
      DedupQueries.writeSubWindowsGen(spark, docs(a), grown)
      DedupQueries.writeSubWindowsGen(spark, docs(b), grown)
      DedupQueries.writeSubWindowsGen(spark, docs(a ++ b), rebuilt)
      assert(graft.sources.IndexCatalog.currentVersion(grown) == 2)
      assert(graft.sources.IndexCatalog.currentVersion(rebuilt) == 1)
      val g = census(grown)
      assert(g == census(rebuilt), "grown store census != one-shot rebuild")
      // the cross-batch span pair is present at exact span algebra;
      // no boiler-driven pair survives the summed df cap
      assert(g.contains((1L, 51L, 12L, 5L)), s"cross-generation span missing: $g")
      assert(!g.exists { case (i, j, _, _) => i >= 100L || j >= 200L },
        s"over-cap boiler window produced pairs: $g")
      // scrub agrees too (the removal path reads the same store)
      val scrubG = DedupQueries.substringScrubCensusOf(
        DedupQueries.storedKeptWindows(spark, grown),
        DedupQueries.storedSnapshot(spark, grown).docs.select(col("doc_id"), col("n_tokens")))
        .collect().map(_.toSeq)
      val scrubR = DedupQueries.substringScrubCensusOf(
        DedupQueries.storedKeptWindows(spark, rebuilt),
        DedupQueries.storedSnapshot(spark, rebuilt).docs.select(col("doc_id"), col("n_tokens")))
        .collect().map(_.toSeq)
      assert(scrubG.toSeq == scrubR.toSeq)
      // per-doc metadata covers the window-less short doc
      val meta = DedupQueries.storedSnapshot(spark, grown).docs
        .filter(col("doc_id") === 2L).collect()
      assert(meta.length == 1 && meta(0).getLong(1) == 3L,
        "short (window-less) doc missing from the stored doc metadata")
    } finally Seq(grown, rebuilt).foreach(graft.Fs.deleteRecursively)
  }

  test("committed generations are byte-immutable under append; only the hot=1 census partition is superseded") {
    val base = tmp()
    val boiler = words("hot", 8) // one window shared by 70 v1 docs: hot at v1
    try {
      DedupQueries.writeSubWindowsGen(spark,
        docs(Seq((1L, words("alpha", 30)), (2L, words("beta", 30))) ++
          (100L until 170L).map(i => (i, words(s"f$i-", 4) + " " + boiler))),
        base)
      val v1 = graft.sources.IndexCatalog.files(base, 1)
      def hotKeyed(fs: Seq[String]) = fs.filter(f =>
        graft.sources.IndexCatalog.partitionKey(f).exists(_.startsWith("hot=")))
      assert(hotKeyed(v1).nonEmpty, "fixture produced no hot census file")
      val before = v1.map(f => f -> Files.readAllBytes(Paths.get(f)).toSeq).toMap
      DedupQueries.writeSubWindowsGen(spark,
        docs(Seq((300L, words("gamma", 30)))), base)
      // v1 resolves to the same paths — its own hot census included —
      // and every byte is unchanged (time travel stays consistent)
      assert(graft.sources.IndexCatalog.files(base, 1) == v1)
      v1.foreach { f =>
        assert(Files.readAllBytes(Paths.get(f)).toSeq == before(f),
          s"append rewrote committed file $f")
      }
      // v2 keeps every v1 data file and supersedes EXACTLY the hot
      // census partition (the derived summary is per-version; data is
      // append-only)
      val v2 = graft.sources.IndexCatalog.files(base, 2).toSet
      assert((v1.toSet -- hotKeyed(v1)).subsetOf(v2),
        "append dropped a committed data file")
      assert(hotKeyed(v1).forall(f => !v2.contains(f)),
        "append left the stale v1 hot census live")
      assert(hotKeyed(v2.toSeq).nonEmpty, "v2 has no hot census")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("store probes equal the inline forms on the injected fixture corpus") {
    val base = tmp()
    try {
      val corpus = DedupQueries.substringCorpus(spark, "/root/testdata/sf0.001")
      DedupQueries.writeSubWindowsGen(spark, corpus, base)
      val inline = DedupQueries.substringSpans(corpus).collect().map(_.toSeq)
      assert(census(base).map(t => Seq(t._1, t._2, t._3, t._4)) == inline.toSeq,
        "store census != inline census")
      val inlineScrub = DedupQueries.substringScrubCensus(corpus)
        .collect().map(_.toSeq)
      val storeScrub = DedupQueries.substringScrubCensusOf(
        DedupQueries.storedKeptWindows(spark, base),
        DedupQueries.storedSnapshot(spark, base).docs.select(col("doc_id"), col("n_tokens")))
        .collect().map(_.toSeq)
      assert(storeScrub.toSeq == inlineScrub.toSeq, "store scrub != inline scrub")
      val inlineContam = DedupQueries.spanContamination(corpus)
        .collect().map(_.toSeq)
      val kept = DedupQueries.storedKeptWindows(spark, base)
      val storeContam = DedupQueries.spanLeakCensus(
        kept.filter(!col("is_train"))
          .select(col("doc_id").as("e_id"), col("p").as("pe"), col("wh")),
        kept.filter(col("is_train"))
          .select(col("doc_id").as("t_id"), col("p").as("pt"), col("wh")),
        DedupQueries.storedSnapshot(spark, base).docs.filter(!col("is_train"))
          .select(col("doc_id"), col("n_tokens")))
        .collect().map(_.toSeq)
      assert(storeContam.toSeq == inlineContam.toSeq,
        "store contamination != inline contamination")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("streamed per-batch window generations probe identically to a one-shot build; a replayed batchId commits nothing") {
    val streamed = tmp()
    val oneShot = tmp()
    try {
      val span = words("dup", 12)
      val b0 = Seq((1L, words("alpha", 10) + " " + span), (2L, words("beta", 25)))
      val b1 = Seq((51L, words("gamma", 20) + " " + span), (52L, words("tiny", 3)))
      assert(DedupQueries.commitWindowBatch(spark, docs(b0), streamed, 0L))
      assert(DedupQueries.commitWindowBatch(spark, docs(b1), streamed, 1L))
      val v = graft.sources.IndexCatalog.currentVersion(streamed)
      // replay of batch 1: tag-guarded no-op — no version, no rows
      assert(!DedupQueries.commitWindowBatch(spark, docs(b1), streamed, 1L))
      assert(graft.sources.IndexCatalog.currentVersion(streamed) == v)
      DedupQueries.writeSubWindowsGen(spark, docs(b0 ++ b1), oneShot)
      assert(census(streamed) == census(oneShot),
        "streamed-ingest store census != one-shot build")
      assert(census(streamed).contains((1L, 51L, 12L, 5L)),
        "cross-batch span missing from the streamed store")
    } finally Seq(streamed, oneShot).foreach(graft.Fs.deleteRecursively)
  }

  test("a probe racing a concurrent append always reads a consistent cut: census is pre- or post-append, never torn") {
    val base = tmp()
    try {
      val span = words("dup", 12)
      val a = Seq(
        (1L, words("alpha", 10) + " " + span),
        (2L, words("beta", 20) + " " + span))
      // the append adds BOTH a new span copy and 70 carriers of a new
      // boilerplate window — a torn read (windows from v2, hot census
      // from v1 or vice versa) would produce a census matching NEITHER
      // version (boiler pairs present, or the v2 span copy missing)
      val boiler = words("hot", 8)
      val b = Seq((51L, words("gamma", 15) + " " + span)) ++
        (100L until 170L).map(i => (i, words(s"f$i-", 4) + " " + boiler))
      DedupQueries.writeSubWindowsGen(spark, docs(a), base)
      val censusV1 = census(base)
      @volatile var seen = List.empty[Seq[(Long, Long, Long, Long)]]
      val prober = new Thread(() => {
        (0 until 12).foreach { _ => seen = census(base) :: seen }
      })
      prober.start()
      DedupQueries.writeSubWindowsGen(spark, docs(b), base)
      prober.join()
      val censusV2 = census(base)
      assert(censusV2.contains((1L, 51L, 12L, 5L)) &&
        censusV2.contains((2L, 51L, 12L, 5L)))
      seen.foreach { c =>
        assert(c == censusV1 || c == censusV2,
          s"torn census observed during append:\n$c\nv1=$censusV1\nv2=$censusV2")
      }
    } finally graft.Fs.deleteRecursively(base)
  }

  test("the streaming gate's batch commit is exactly-once: a replayed batchId is a no-op") {
    val trainBase = tmp()
    val resBase = tmp()
    try {
      val span = words("dup", 12)
      // the donor text's content hash puts it TRAIN-side (md5("split1|
      // alpha0 … dup11") leads with '7' < 'd') — deterministic, so the
      // probe must flag the eval doc
      DedupQueries.writeSubWindowsGen(spark, docs(Seq(
        (1L, words("alpha", 10) + " " + span),
        (2L, words("beta", 40)))), trainBase)
      val donorTrain = DedupQueries.storedSnapshot(spark, trainBase).docs
        .filter(col("doc_id") === 1L).collect()(0).getBoolean(2)
      assert(donorTrain, "fixture drift: the donor text no longer hashes train-side")
      val evalBatch = docs(Seq((900L, words("omega", 15) + " " + span)))
      assert(DedupQueries.commitContamBatch(spark, evalBatch, trainBase, resBase, 0L))
      val v1 = graft.sources.IndexCatalog.currentVersion(resBase)
      val rows1 = spark.read
        .parquet(graft.sources.IndexCatalog.latestFiles(resBase): _*)
        .collect().map(_.toSeq).toSeq
      assert(rows1.nonEmpty, "train-side donor span produced no leak row")
      // replay: same batchId → no new version, no duplicate rows
      assert(!DedupQueries.commitContamBatch(spark, evalBatch, trainBase, resBase, 0L))
      assert(graft.sources.IndexCatalog.currentVersion(resBase) == v1)
      val rows2 = spark.read
        .parquet(graft.sources.IndexCatalog.latestFiles(resBase): _*)
        .collect().map(_.toSeq).toSeq
      assert(rows2 == rows1, "replayed batch changed the result store")
    } finally Seq(trainBase, resBase).foreach(graft.Fs.deleteRecursively)
  }

  test("one width per store: the window_w tag fences a mixed-width commit; a sibling W=50 store finds only >=50-token spans") {
    val base = tmp()
    val base50 = tmp()
    try {
      // a 60-token verbatim span shared by two docs, plus a 12-token
      // one — the W=8 store sees both pairs, the W=50 store only the
      // long one (the Lee-et-al standard: sub-width spans are not
      // duplicates at the production width)
      val long = words("lee", 60)
      val short = words("sub", 12)
      val corpus = Seq(
        (1L, words("a", 5) + " " + long),
        (2L, words("b", 7) + " " + long),
        (3L, words("c", 5) + " " + short),
        (4L, words("d", 9) + " " + short))
      DedupQueries.writeSubWindowsGen(spark, docs(corpus), base)
      DedupQueries.writeSubWindowsGen(
        spark, docs(corpus), base50, w = DedupQueries.SubW50)
      // widths are declared on the manifest and survive as governing tags
      assert(graft.sources.IndexCatalog.newestTag(base, "window_w=")
        .contains("window_w=" + DedupQueries.SubW))
      assert(graft.sources.IndexCatalog.newestTag(base50, "window_w=")
        .contains("window_w=" + DedupQueries.SubW50))
      // a mixed-width generation is refused loudly, not silently mixed
      val e = intercept[IllegalArgumentException] {
        DedupQueries.writeSubWindowsGen(
          spark, docs(Seq((9L, words("x", 60)))), base, w = DedupQueries.SubW50)
      }
      assert(e.getMessage.contains("window_w="))
      // the W=8 census sees both pairs; the W=50 census only the long
      // span, at its exact length
      val c8 = census(base).map(t => (t._1, t._2) -> t._3).toMap
      assert(c8.keySet == Set((1L, 2L), (3L, 4L)))
      assert(c8((1L, 2L)) == 60L && c8((3L, 4L)) == 12L)
      val c50 = DedupQueries.substringSpansOf(
          DedupQueries.storedKeptWindows(spark, base50), w = DedupQueries.SubW50)
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(c50.keySet == Set((1L, 2L)))
      assert(c50((1L, 2L)) == 60L)
    } finally Seq(base, base50).foreach(graft.Fs.deleteRecursively)
  }

  test("a store whose first batch has only sub-window-length docs is a valid state: probes are empty, a later append repairs it") {
    val base = tmp()
    try {
      // every doc < SubW tokens: no window rows, no df partials — only
      // the doc-metadata partition commits. Snapshots and probes must
      // treat the zero-path window/df partitions as empty frames, not
      // unreadable stores (the state a live ingest of short documents
      // produces on day one)
      val shorts = Seq((1L, words("tiny", 3)), (2L, words("mini", 5)))
      DedupQueries.writeSubWindowsGen(spark, docs(shorts), base)
      assert(graft.sources.IndexCatalog.currentVersion(base) == 1,
        "doc metadata alone must still commit a generation")
      val snap = DedupQueries.storedSnapshot(spark, base)
      assert(snap.kept.count() == 0L && snap.hot.count() == 0L)
      assert(snap.docs.count() == 2L,
        "short docs must still appear in the stored doc metadata")
      assert(census(base).isEmpty)
      // the append brings the first real windows; the grown store then
      // equals a one-shot rebuild over the union corpus
      val span = words("dup", 12)
      val longs = Seq(
        (10L, words("alpha", 10) + " " + span),
        (11L, words("beta", 20) + " " + span))
      DedupQueries.writeSubWindowsGen(spark, docs(longs), base)
      val rebuilt = tmp()
      try {
        DedupQueries.writeSubWindowsGen(spark, docs(shorts ++ longs), rebuilt)
        assert(census(base) == census(rebuilt),
          "short-doc-first store census != one-shot rebuild")
        assert(census(base).contains((10L, 11L, 12L, 5L)))
      } finally graft.Fs.deleteRecursively(rebuilt)
    } finally graft.Fs.deleteRecursively(base)
  }
}
