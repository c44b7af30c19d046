package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** Plan-shape regressions: properties that don't change results at test
  * scale but decide whether the same query survives a 1000-executor,
  * 100 TB run — pushdown reaching the scan, broadcast joins for dims,
  * bounded shuffle counts, partial aggregation before the exchange.
  * AQE is disabled here so the classic plan nodes are inspectable;
  * production runs keep it on.
  */
class PlanQualitySpec extends SparkSpec with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  override def afterAll(): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    super.afterAll()
  }

  private def plan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)

  test("q_filter_project pushes predicates and prunes columns at the scan") {
    val s = df2s(RelationalQueries.qFilterProject(spark, dir))
    assert(s.contains("PushedFilters: ["), s)
    assert(s.contains("GreaterThanOrEqual(l_discount,0.05)"), s)
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_comment"),
      readSchema)
  }

  private def df2s(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q_join_broadcast uses broadcast joins for all three dims") {
    val p = plan(RelationalQueries.qJoinBroadcast(spark, dir))
    val bcasts = collectAll(p).collect { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 3, s"expected >=3 broadcast joins, got ${bcasts.size}\n$p")
  }

  test("flagship multi-distinct aggregates partially before its single shuffle") {
    val p = plan(CoreQueries.qMultiDistinct(spark, dir))
    val all = collectAll(p)
    val shuffles = all.collect { case s: ShuffleExchangeExec => s }
    // one shuffle for the groupBy, one for the final orderBy — no more
    assert(shuffles.size <= 2, s"got ${shuffles.size} shuffles:\n$p")
    val objAggs = all.filter(_.nodeName.contains("ObjectHashAggregate"))
    assert(objAggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$p")
  }

  test("q_agg_group runs inside whole-stage codegen") {
    val p = plan(RelationalQueries.qAggGroup(spark, dir))
    val wsc = collectAll(p).collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"no WholeStageCodegen spans:\n$p")
  }

  test("vec_dot participates in whole-stage codegen (no udf fallback)") {
    val p = plan(SimilarityQueries.qKnnBrute(spark, dir))
    val s = p.toString
    assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"), s)
    assert(s.contains("vec_dot"), s)
    val wsc = collectAll(p).collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"no WholeStageCodegen spans:\n$p")
  }

  test("q_minhash_lsh plans no cartesian or nested-loop joins") {
    // the lazy pipeline form: qMinhashLsh itself checkpoints stage
    // results, which would truncate the join subtrees out of the plan
    val s = plan(DedupQueries.qMinhashLshPlan(spark, dir)).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q_embed_neardup plans no cartesian or nested-loop join (block-pair equi-join)") {
    val s = plan(SimilarityQueries.qEmbedNearDup(spark, dir)).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q_semdedup's pair join stays inside cells: equi-join on centroid_id, no cartesian") {
    val p = plan(SimilarityQueries.qSemDedup(spark, dir))
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    // the only nested-loop joins are the NList-row centroid assignment
    // broadcasts; the corpus-vs-corpus pair join must be keyed
    val pairJoin = collectAll(p).find(n =>
      (n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("HashJoin")) &&
        n.toString.contains("centroid_id"))
    assert(pairJoin.isDefined, s"expected a centroid_id-keyed pair join:\n$p")
  }

  test("q_ivf_filtered's candidate join is keyed on (cell, label); no cartesian") {
    val base = Files.createTempDirectory("graft_fltplan").toString
    try {
      graft.sources.StoreFixtures.cloneInto("ivf_labeled", dir, base)(
        d => SimilarityQueries.buildLabeledIvfStore(spark, dir, d))
      val p = plan(SimilarityQueries.probeIvfFiltered(spark, base))
      val s = p.toString
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"), s)
      // the ONE corpus-sized join must carry BOTH keys: the metadata
      // filter rides the join key, never a post-filter of unfiltered
      // candidates
      val candJoin = collectAll(p).find(n =>
        (n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("HashJoin")) &&
          n.toString.contains("cent") && n.toString.contains("label"))
      assert(candJoin.isDefined,
        s"expected a (cell, label)-keyed candidate join:\n$p")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("q_ivf_pq's candidate pass is cell-keyed; no cartesian; codes join the LUT by key") {
    val base = Files.createTempDirectory("graft_pqplan").toString
    try {
      SimilarityQueries.buildPqStore(spark, dir, base)
      val p = plan(SimilarityQueries.probePqStore(spark, dir, base))
      val s = p.toString
      assert(!s.contains("CartesianProduct"), s)
      // the probe-vs-corpus candidate join must be keyed on the cell
      // (the only nested-loop joins are the bounded centroid/codebook
      // broadcasts, NList and PqM×PqKs rows)
      val cellJoin = collectAll(p).find(n =>
        (n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("HashJoin")) &&
          n.toString.contains("cent"))
      assert(cellJoin.isDefined, s"expected a cell-keyed candidate join:\n$p")
      val lutJoin = collectAll(p).find(n =>
        (n.nodeName.contains("SortMergeJoin") || n.nodeName.contains("HashJoin")) &&
          n.toString.contains("cw_id"))
      assert(lutJoin.isDefined, s"expected a keyed ADC LUT join:\n$p")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("q_edit_dedup plans no cartesian or nested-loop join (two blocking equi-joins)") {
    val s = plan(DedupQueries.qEditDedup(spark, dir)).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q_substring_dedup's cross-doc pass is a window-hash equi-join: no cartesian, no nested loop") {
    val s = plan(DedupQueries.qSubstringDedup(spark, dir)).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("the substring trio's probe plans scan ONLY the window store — the documents table is never re-read or re-hashed") {
    Seq(
      DedupQueries.qSubstringDedup(spark, dir),
      DedupQueries.qSubstringScrub(spark, dir),
      DedupQueries.qSpanContamination(spark, dir),
      // the W=50 sibling store's probes: same pure-store contract
      DedupQueries.qSubstringDedupW50(spark, dir),
      DedupQueries.qSpanContaminationW50(spark, dir)).foreach { df =>
      val s = plan(df).toString
      // every scan Location points into the persisted store: no
      // fixture-table scan, hence no tokenize/md5 pass at probe time
      assert(!s.contains("documents.parquet"),
        s"probe plan reads the documents table:\n${s.take(4000)}")
      assert(!s.contains("md5"),
        s"probe plan re-hashes windows:\n${s.take(4000)}")
    }
  }

  test("q_knn_brute reduces to a local top-k before the per-query ranking window") {
    // two window stages: the (query, partition)-local cut, then the
    // global per-query rank over at most K x partitions candidates
    val p = plan(SimilarityQueries.qKnnBrute(spark, dir))
    val windows = collectAll(p).filter(_.nodeName.contains("Window"))
    assert(windows.size >= 2, s"expected local+global ranking windows:\n$p")
  }

  test("q_topk bounds its shuffles (rank filter below the final sort)") {
    val p = plan(RelationalQueries.qTopK(spark, dir))
    val shuffles = collectAll(p).collect { case x: ShuffleExchangeExec => x }
    assert(shuffles.size <= 2, s"got ${shuffles.size} shuffles:\n$p")
  }

  test("q_bucketed_join's co-located join subtree plans zero shuffles") {
    val (joined, cleanup) = SourceQueries.bucketedOrdersCustomer(spark, dir)
    try {
      val p = plan(joined)
      val smj = collectAll(p).find(_.nodeName.contains("SortMergeJoin"))
      assert(smj.isDefined, s"expected SortMergeJoin over bucketed scans:\n$p")
      val shuffles = collectAll(smj.get).collect { case x: ShuffleExchangeExec => x }
      assert(shuffles.isEmpty,
        s"bucket-aligned join must not re-shuffle either side:\n$p")
    } finally cleanup()
  }

  test("salted join shuffles on (key, salt): the hot key spreads over salt buckets") {
    val p = plan(RelationalQueries.qSaltedJoin(spark, dir))
    val smj = collectAll(p).find(_.nodeName.contains("SortMergeJoin"))
    assert(smj.isDefined, s"expected the merge-hinted SMJ:\n$p")
    val s = smj.get.toString
    assert(s.contains("k#") && s.contains("salt#"),
      s"join keys must include BOTH k and salt:\n$s")
  }

  test("quality gate: the threshold re-enters as a 1-row broadcast, the corpus never shuffles") {
    val p = plan(CurationQueries.qQualityGate(spark, dir))
    // the derived threshold joins back as a keyless 1-row broadcast
    // (BroadcastNestedLoopJoin is the RIGHT node here: no join key,
    // build side is the single-row threshold aggregate — the same
    // bounded shape as a scalar subquery)
    val bnlj = collectAll(p).find(_.nodeName.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.isDefined, s"threshold must re-enter as a broadcast:\n$p")
    assert(bnlj.get.toString.contains("BuildRight"),
      s"the 1-row threshold must be the build side:\n${bnlj.get}")
    // the only shuffles are aggregate exchanges over collapsed frames
    // (distinct token-count values; the per-source census) or the
    // final presentation sort — never a corpus-row join repartition
    val shuffles = collectAll(p).collect { case x: ShuffleExchangeExec => x }
    shuffles.foreach(x =>
      assert(x.child.toString.contains("HashAggregate"),
        s"non-aggregate corpus shuffle:\n$x"))
    // exactly TWO corpus scans: one feeding the threshold's collapsed
    // counts (n now derives from the same window pass — no third scan
    // for the total), one for the per-source census
    val scans = collectAll(p).count(_.nodeName.contains("Scan parquet"))
    assert(scans == 2, s"quality gate must read the corpus exactly twice, got $scans:\n$p")
  }

  test("merge upsert plans a broadcast anti join: the base table is never exchanged") {
    val p = plan(SourceQueries.mergedSnapshot(spark, dir))
    val anti = collectAll(p).find(n =>
      n.nodeName.contains("BroadcastHashJoin") && n.toString.contains("LeftAnti"))
    assert(anti.isDefined, s"expected BroadcastHashJoin LeftAnti:\n$p")
    // no shuffle anywhere under the anti join — the base side streams
    val shuffles = collectAll(anti.get).collect { case x: ShuffleExchangeExec => x }
    assert(shuffles.isEmpty, s"base side must not shuffle:\n$p")
  }

  test("q_bm25 reads the corpus once (cached tf fork), prunes pre-shuffle, no window") {
    spark.catalog.clearCache()
    val p = plan(RetrievalQueries.qBm25(spark, dir))
    val s = p.toString
    // the tf fork must come from the cache, not a second corpus explode
    val scans = collectAll(p).count(_.nodeName.contains("Scan parquet"))
    assert(scans == 1, s"BM25 must read the corpus exactly once, got $scans:\n$p")
    // bounded top-k, not a ranking window
    assert(!s.contains("Window"), s"BM25 must rank via topk_agg, not a window:\n$p")
    // no cartesian; the only BNLJ is the 1-row stats broadcast
    assert(!s.contains("CartesianProduct"), s)
    spark.catalog.clearCache()
  }

  test("q_dpp injects dynamicpruning into the fact scan; partitions read < partitions on disk") {
    val (joined, base, cleanup) = SourceQueries.dppJoined(spark, dir)
    try {
      val p = plan(joined)
      // the runtime subquery must sit in the FACT scan's partition
      // filters — that is the mechanism, not a post-scan filter
      val factScan = collectAll(p).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(base)) => f
      }
      assert(factScan.isDefined, s"no fact scan over $base:\n$p")
      assert(factScan.get.partitionFilters.exists(
        _.toString.contains("dynamicpruning")),
        s"fact scan's PartitionFilters carry no dynamicpruning subquery:\n${factScan.get}")
      // execute, then compare the scan's partitions-read metric to the
      // day= directories actually on disk: only the dimension's
      // surviving weekend days may be listed
      joined.collect()
      val read = factScan.get.metrics("numPartitions").value
      val onDisk = new java.io.File(base).listFiles()
        .count(_.getName.startsWith("day="))
      assert(read > 0 && read < onDisk,
        s"expected a pruned read, got $read of $onDisk partitions:\n$p")
    } finally cleanup()
  }

  test("q_hybrid_rrf's fusion window ranks a bounded frame: both arms end in topk_agg") {
    spark.catalog.clearCache()
    val p = plan(RetrievalQueries.qHybridRrf(spark, dir))
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    // both arms' bounded cuts exist: two topk_agg final aggregates
    assert(s.sliding("topk_agg".length).count(_ == "topk_agg") >= 2,
      s"expected both arms to rank through topk_agg:\n$p")
    spark.catalog.clearCache()
  }

  test("positional probes scan only query-term tok= partitions WITH pos; BM25's scans never read pos") {
    val base = Files.createTempDirectory("graft_pqs_pos").toString
    try {
      RetrievalQueries.writeTextIndexGen(spark,
        graft.Engine.table(spark, dir, "documents"), base)
      // descend through cached relations too: probeTextIndex caches its
      // posts fork, which hides the file scan behind InMemoryTableScan
      def scansOf(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        collectAll(p).flatMap {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
          case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            scansOf(im.relation.cachedPlan)
          case _ => Nil
        }
      def postingScans(p: SparkPlan) = scansOf(p)
        .filter(_.relation.location.inputFiles.exists(_.contains("/postings/")))
      // phrase and proximity: every scan reads the posting store only
      // (the corpus is never touched), restricted to the query terms'
      // tok= partitions, and CARRIES the positional payload; ranking
      // is topk_agg (no window), joins are keyed (no cartesian)
      for ((p, terms) <- Seq(
          plan(RetrievalQueries.probePhrase(spark, base,
            Seq(1L -> Seq("fast", "spark")), 10)) -> Set("fast", "spark"),
          plan(RetrievalQueries.probeProximity(spark, base,
            Seq((1L, "hash", "join", 5)), 10)) -> Set("hash", "join"))) {
        val s = p.toString
        assert(!s.contains("CartesianProduct") && !s.contains("Window"), s)
        val post = postingScans(p)
        assert(post.nonEmpty && post.size == scansOf(p).size,
          s"a positional probe scanned something besides the posting store:\n$p")
        post.foreach { f =>
          assert(f.schema.fieldNames.contains("pos"),
            s"positional scan lost the pos payload: ${f.schema}")
          val files = f.relation.location.inputFiles
          assert(files.nonEmpty && files.forall(path =>
            terms.exists(t => path.contains(s"/tok=$t/"))),
            s"scan read a partition outside the query vocabulary:\n${files.mkString("\n")}")
        }
      }
      // the BM25 probe over the SAME store: column pruning leaves the
      // position bytes on disk — no scan's ReadSchema carries pos
      val bm = postingScans(plan(
        RetrievalQueries.probeTextIndex(spark, base, Seq(1L -> "spark"), 10)))
      assert(bm.nonEmpty)
      bm.foreach(f => assert(!f.schema.fieldNames.contains("pos"),
        s"BM25 probe paid for the positional payload: ${f.schema}"))
    } finally graft.Fs.deleteRecursively(base)
  }
}
