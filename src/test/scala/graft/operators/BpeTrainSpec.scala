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
    * adjacent char pairs inside words of the (merge-applied) corpus,
    * promote the (count desc, pair asc) winner to the digit unit.
    */
  private def referenceTrain(
      texts: Seq[String], rounds: Int): Seq[(Long, String, Long, String)] = {
    var corpus = texts
    (0 until rounds).flatMap { r =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      corpus.foreach { t =>
        t.split(" ").filter(_.length >= 2).foreach { w =>
          (0 until w.length - 1).foreach { i =>
            val p = w.substring(i, i + 2)
            counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        }
      }
      if (counts.isEmpty) None
      else {
        val (pair, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
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
