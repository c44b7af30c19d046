package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iterated BPE training contracts (q_bpe_train): the distributed
  * loop agrees merge-for-merge with an independent in-JVM trainer on
  * constructed corpora, second-level merges (a pair containing an
  * earlier round's unit) emerge exactly where the frequencies say
  * they must, ties break deterministically (count desc, pair asc),
  * and round 1 equals q_bpe_learn's rank-1 pair on the fixture.
  */
class BpeTrainSpec extends SparkSpec {

  private def docs(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  /** Reference trainer: the same greedy loop in plain Scala — count
    * adjacent CODE-POINT pairs inside words of the (merge-applied)
    * corpus, promote the winner by (count desc, pair asc in UTF-8
    * byte order — the collation Spark's orderBy and the DuckDB
    * oracle's ORDER BY share; Java String order would invert
    * [U+E000, U+FFFF] against supplementary characters).
    */
  private def referenceTrain(
      texts: Seq[String], rounds: Int): Seq[(Long, String, Long, String)] = {
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val lim = math.min(x.length, y.length)
      var i = 0
      while (i < lim) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    var corpus = texts
    (0 until rounds).flatMap { r =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      corpus.foreach { t =>
        t.split(" ").foreach { w =>
          val cps = w.codePoints().toArray
          (0 until cps.length - 1).foreach { i =>
            val p = new String(cps, i, 2)
            counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        }
      }
      if (counts.isEmpty) None
      else {
        val (pair, n) = counts.reduce { (a, b) =>
          if (a._2 > b._2 || (a._2 == b._2 && utf8Less(a._1, b._1))) a else b
        }
        corpus = corpus.map(_.replace(pair, r.toString))
        Some((r + 1L, pair, n, r.toString))
      }
    }
  }

  private def train(texts: Seq[String], rounds: Int = 8) =
    TextQueries.bpeTrain(docs(texts)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.take(rounds)

  test("agrees merge-for-merge with an independent in-JVM trainer on a constructed corpus") {
    val corpus = Seq.fill(40)("the cat sat on the mat") ++
      Seq.fill(25)("then and there") ++
      Seq.fill(10)("thinking antelope thunder") ++
      Seq.fill(5)("zq xw vk")
    assert(train(corpus) == referenceTrain(corpus, 8),
      "dict-path trainer diverged from the reference loop")
  }

  test("the distributed (over-ceiling vocabulary) path learns the identical table") {
    val corpus = Seq.fill(40)("the cat sat on the mat") ++
      Seq.fill(25)("then and there") ++
      Seq.fill(10)("thinking antelope thunder")
    // force the vocab guard to reject the driver dict: the per-round
    // aggregate + argmax loop must produce the same merges
    val out = TextQueries.bpeTrain(docs(corpus), driverVocabMax = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(out == referenceTrain(corpus, 8),
      "distributed trainer diverged from the reference loop")
  }

  test("second-level merges emerge: after 'th' wins, '0e' (unit+letter) is the next most frequent pair") {
    // 'th' appears in every word (60x), 'he' in 50 — after th -> '0'
    // the 50 "the"s become "0e", outnumbering everything else left
    val corpus = Seq.fill(50)("the") ++ Seq.fill(10)("myth")
    val out = train(corpus, 2)
    assert(out(0) == (1L, "th", 60L, "0"), s"round 1: ${out(0)}")
    assert(out(1) == (2L, "0e", 50L, "1"), s"round 2 second-level merge: ${out(1)}")
  }

  test("ties break on pair ascending, and the winner's count is the count at learning time") {
    // 'ab' and 'ba' both appear 20x in round 1 ("abab" has ab x2, ba x1
    // per word... use exact-count words instead)
    val corpus = Seq.fill(20)("ab") ++ Seq.fill(20)("ba") ++ Seq.fill(3)("cc")
    val out = train(corpus, 2)
    assert(out(0) == (1L, "ab", 20L, "0"), s"tie must pick 'ab' < 'ba': ${out(0)}")
    assert(out(1) == (2L, "ba", 20L, "1"), s"round 2: ${out(1)}")
  }

  test("ties beyond the BMP break in UTF-8 order on BOTH paths — U+E000 beats U+1F600 even though Java String order says otherwise") {
    // counts tie at 20: pair A = U+1F600+'a' (a surrogate pair, UTF-16
    // units 0xD83D 0xDE00), pair B = U+E000+'a'. Java String order
    // ranks A first (0xD83D < 0xE000 as code units); UTF-8 byte order
    // — Spark's orderBy and DuckDB's ORDER BY — ranks B first
    // (EE 80 80 < F0 9F 98 80). Both engine paths must pick B, then
    // learn A in round 2; a String-order tie-break diverges here and
    // every later round inherits the wrong substitution
    val smile = new String(Character.toChars(0x1F600))
    val priv = "\uE000"
    val corpus = Seq.fill(20)(smile + "a") ++ Seq.fill(20)(priv + "a") ++
      Seq.fill(3)("cc")
    val expect = Seq(
      (1L, priv + "a", 20L, "0"),
      (2L, smile + "a", 20L, "1"),
      (3L, "cc", 3L, "2"))
    assert(train(corpus, 3) == expect, "driver-dict path tie-break")
    val dist = TextQueries.bpeTrain(docs(corpus), driverVocabMax = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.take(3)
    assert(dist == expect, "distributed path tie-break")
    assert(referenceTrain(corpus, 3) == expect, "reference loop tie-break")
  }

  test("round 1 on the fixture equals q_bpe_learn's rank-1 pair") {
    val dir = "/root/testdata/sf0.001"
    val learn1 = TextQueries.qBpeLearn(spark, dir)
      .filter(col("rk") === 1L).collect()(0)
    val train1 = TextQueries.qBpeTrain(spark, dir)
      .filter(col("rk") === 1L).collect()(0)
    assert(train1.getString(1) == learn1.getString(0) &&
      train1.getLong(2) == learn1.getLong(1),
      s"train round 1 ${train1} != learn rank 1 ${learn1}")
  }
}
