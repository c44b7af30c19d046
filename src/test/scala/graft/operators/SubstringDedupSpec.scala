package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact substring-level dedup contracts (q_substring_dedup's
  * mechanism, the Lee-et-al token-window census): a verbatim span
  * planted across two otherwise-different documents is recovered at
  * its exact length, sub-window overlaps stay invisible, two disjoint
  * shared spans report the LONGEST (with the total window-match count
  * separating them from one long span), the df cap really excludes a
  * window shared by too many docs, and the gated query recovers every
  * injected donor span from the fixture.
  */
class SubstringDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // distinct filler vocabularies, so non-span windows never collide
  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a planted verbatim span is recovered at its exact token length and position algebra") {
    val span = words("dup", 12) // 12 tokens = 5 windows of 8
    val a = words("alpha", 10) + " " + span + " " + words("omega", 6)
    val b = words("beta", 20) + " " + span
    val out = DedupQueries.substringSpans(docs(Seq((1L, a), (2L, b))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 12L, 5L)),
      s"expected one (1,2) pair with max_span=12, n_matches=5, got ${out.toSeq}")
  }

  test("overlap shorter than the window width is invisible; different docs share nothing") {
    val shortSpan = words("dup", DedupQueries.SubW - 1) // 7 tokens < W
    val a = words("alpha", 12) + " " + shortSpan
    val b = words("beta", 12) + " " + shortSpan
    assert(DedupQueries.substringSpans(docs(Seq((1L, a), (2L, b)))).isEmpty)
    assert(DedupQueries.substringSpans(
      docs(Seq((1L, words("alpha", 30)), (2L, words("beta", 30))))).isEmpty)
  }

  test("two disjoint shared spans: max_span is the longest, n_matches counts both runs") {
    val s1 = words("one", 8)  // exactly one window
    val s2 = words("two", 10) // 3 windows, span 10
    val a = s1 + " " + words("alpha", 9) + " " + s2
    val b = s2 + " " + words("beta", 9) + " " + s1
    val out = DedupQueries.substringSpans(docs(Seq((1L, a), (2L, b))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 10L, 4L)),
      s"expected max_span=10 (longest of 8/10), n_matches=4 (1+3 windows), got ${out.toSeq}")
  }

  test("the df cap excludes a window hotter than SubCap docs; at the cap it reports") {
    val boiler = words("hot", 8)
    def corpus(n: Int) = docs((1 to n).map(i =>
      (i.toLong, words(s"u$i", 10) + " " + boiler)))
    // SubCap docs sharing the window: every pair reports
    val atCap = DedupQueries.substringSpans(corpus(DedupQueries.SubCap))
    assert(atCap.count() == DedupQueries.SubCap.toLong * (DedupQueries.SubCap - 1) / 2)
    // one past the cap: the hot window is excluded, nothing reports
    assert(DedupQueries.substringSpans(corpus(DedupQueries.SubCap + 1)).isEmpty)
  }

  test("scrub removes exactly the covered tokens of the LATER doc; the keeper's copy is untouched") {
    val span = words("dup", 12)
    val keeper = words("alpha", 10) + " " + span        // doc 1: keeps its copy
    val loser = words("beta", 20) + " " + span          // doc 2: loses the span
    val out = DedupQueries.substringScrubCensus(docs(Seq((1L, keeper), (2L, loser))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only doc 2 appears (doc 1 lost nothing); exactly the 12 span
    // tokens are covered, 20 beta tokens survive
    assert(out.toSeq == Seq((2L, 32L, 12L, 20L)),
      s"expected doc 2 to lose exactly the 12-token span, got ${out.toSeq}")
  }

  test("scrub coverage unions overlapping duplicated windows, never double-counts") {
    // doc 2 shares a 10-token span (3 overlapping windows) — coverage
    // is the union [1..10], not 3 x 8
    val span = words("dup", 10)
    val out = DedupQueries.substringScrubCensus(docs(Seq(
        (1L, span + " " + words("alpha", 8)),
        (2L, span + " " + words("beta", 8)))))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 10L)),
      s"expected union coverage of 10 tokens on doc 2 only, got ${out.toSeq}")
  }

  test("the Lee-et-al 50-token-window standard: a planted 60-token span on long documents is recovered at exactly (60, 11)") {
    // the fixture's short docs fit W=8; the OPERATOR claims the
    // 50-token standard, so pin it on synthetic long documents — a
    // 60-token verbatim span yields 60-50+1 = 11 windows of width 50
    val w = 50
    val span = words("dup", 60)
    val a = words("alpha", 120) + " " + span + " " + words("omega", 40)
    val b = words("beta", 200) + " " + span + " " + words("gamma", 15)
    val out = DedupQueries.substringSpans(docs(Seq((1L, a), (2L, b))), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 60L, 11L)),
      s"expected one (1,2) pair with max_span=60, n_matches=11 at W=50, got ${out.toSeq}")
    // a 49-token overlap (< W) stays invisible at the 50-token grain
    val sub = words("dup", w - 1)
    assert(DedupQueries.substringSpans(docs(Seq(
      (1L, words("alpha", 80) + " " + sub),
      (2L, words("beta", 80) + " " + sub))), w).isEmpty)
  }

  test("the materialized rewrite emits exactly the uncovered tokens; the keeper's text is never touched") {
    val span = words("dup", 12)
    val keeperTail = words("omega", 6)
    val a = words("alpha", 10) + " " + span + " " + keeperTail
    val b = words("beta", 20) + " " + span
    val corpus = docs(Seq((1L, a), (2L, b)))
    val out = DedupQueries.substringRewrite(
      corpus, DedupQueries.substringWindows(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // only doc 2 (the later copy) is rewritten, and it loses exactly
    // the planted span — the emitted text is its own prefix verbatim
    assert(out.toSeq == Seq((2L, 32L, 12L, words("beta", 20))),
      s"rewrite mismatch: ${out.toSeq}")
  }

  test("the gated scrub census: every injected doc loses at least its planted span") {
    val out = DedupQueries.qSubstringScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    val nTok = docsDf.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val injected = nTok.keys.filter(id => id % 10 == 3 &&
      nTok.get(id - 1).exists(_ >= DedupQueries.SubSpan + 1)).toSeq
    injected.foreach { id =>
      val (tot, removed, kept) = out.getOrElse(id,
        fail(s"injected doc $id missing from scrub census"))
      assert(removed >= DedupQueries.SubSpan.toLong,
        s"doc $id removed only $removed < planted ${DedupQueries.SubSpan}")
      assert(tot == nTok(id) + DedupQueries.SubSpan && kept == tot - removed)
    }
  }

  test("span contamination: every injected eval doc with a train donor is flagged at >= the planted span; no train doc ever appears") {
    val out = DedupQueries.qSpanContamination(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    val texts = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    def injectedText(id: Long): String = {
      val donor = texts.get(id - 1)
      if (id % 10 == 3 && donor.exists(_.split(" ").length >= DedupQueries.SubSpan + 1))
        texts(id) + " " + donor.get.split(" ").slice(1, 1 + DedupQueries.SubSpan).mkString(" ")
      else texts(id)
    }
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("split1|" + injectedText(id)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.charAt(0) < 'd'
    }
    // injected pairs whose eval/train sides cross the split
    val mustFlag = texts.keys.filter { id =>
      id % 10 == 3 &&
        texts.get(id - 1).exists(_.split(" ").length >= DedupQueries.SubSpan + 1) &&
        !isTrain(id) && isTrain(id - 1)
    }.toSeq.sorted
    assert(mustFlag.nonEmpty, "fixture produced no cross-split injected pair")
    mustFlag.foreach { id =>
      val (leaked, span) = out.getOrElse(id,
        fail(s"cross-split injected eval doc $id not flagged"))
      assert(span >= DedupQueries.SubSpan.toLong && leaked >= DedupQueries.SubSpan.toLong)
    }
    // output rows are EVAL docs only
    out.keys.foreach(id => assert(!isTrain(id), s"train doc $id in the output"))
  }

  test("the gated query recovers every injected donor span from the fixture") {
    val out = DedupQueries.qSubstringDedup(spark, dir).collect()
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    // expected pairs: (doc_id-1, doc_id) for doc_id % 10 == 3 whose
    // donor has at least SubSpan + 1 tokens
    val donorOk = docsDf.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val expected = docsDf.select(col("doc_id")).as[Long].collect()
      .filter(id => id % 10 == 3 && donorOk.get(id - 1).exists(_ >= DedupQueries.SubSpan + 1))
      .map(id => (id - 1, id)).toSet
    val gotPairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(gotPairs),
      s"missing injected pairs: ${expected -- gotPairs}")
    // every injected pair carries at least the full planted span
    out.filter(r => expected((r.getLong(0), r.getLong(1)))).foreach { r =>
      assert(r.getLong(2) >= DedupQueries.SubSpan.toLong,
        s"pair (${r.getLong(0)},${r.getLong(1)}) span ${r.getLong(2)} < planted ${DedupQueries.SubSpan}")
    }
  }
}
