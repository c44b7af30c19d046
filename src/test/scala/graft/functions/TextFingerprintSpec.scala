package graft.functions

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}

/** fnv_grams + sliding_min: the one-pass fingerprint primitives must be
  * value-identical to the declarative HOF formulation they replaced
  * (`transform(sequence(...), i -> fnv64(substring(text, i, k)))` and
  * per-window `array_min(slice(...))`), including the non-ASCII path
  * the ASCII fixture never exercises, and the short/empty/null
  * degeneracies the winnow semantics define.
  */
class TextFingerprintSpec extends SparkSpec {

  private def gramsBoth(texts: Seq[String], k: Int) = {
    import spark.implicits._
    Engine.register(spark)
    texts.toDF("text")
      .select(
        expr(s"fnv_grams(text, $k)").as("fast"),
        expr(
          s"""CASE WHEN length(text) >= $k
             |     THEN transform(sequence(1, length(text)-${k - 1}), i -> fnv64(substring(text, i, $k)))
             |     ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin).as("hof"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
  }

  test("fnv_grams equals the fnv64-per-substring HOF on ASCII and non-ASCII") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab", "", "exactly8",
      "héllo wörld — ünïcode graße text £€¥",       // multibyte chars
      "汉字文本测试一二三四五六七八九十",                 // CJK
      "mixed ascii + 日本語 + more ascii tail here")
    for ((fast, hof) <- gramsBoth(texts, 8)) assert(fast == hof)
    for ((fast, hof) <- gramsBoth(texts, 3)) assert(fast == hof)
  }

  test("fnv_grams: null text yields an empty fingerprint set") {
    import spark.implicits._
    Engine.register(spark)
    val r = Seq[Option[String]](None, Some("long enough text"))
      .toDF("text")
      .select(size(expr("fnv_grams(text, 8)")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 9))
  }

  test("sliding_min equals array_min-over-slice for every (n, w) shape") {
    import spark.implicits._
    Engine.register(spark)
    val rnd = new scala.util.Random(7)
    val arrays = Seq.tabulate(40)(n => Seq.fill(n)(rnd.nextLong())) ++
      Seq(Seq(Long.MinValue, Long.MaxValue, 0L, Long.MinValue))
    for (w <- Seq(1, 2, 16)) {
      val got = arrays.toDF("a")
        .select(
          expr(s"sliding_min(a, $w)").as("fast"),
          expr(
            s"""CASE WHEN size(a) >= $w
               |     THEN transform(sequence(1, size(a)-${w - 1}), j -> array_min(slice(a, j, $w)))
               |     WHEN size(a) >= 1 THEN array(array_min(a))
               |     ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin).as("hof"))
        .collect()
        .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
      for ((fast, hof) <- got) assert(fast == hof, s"w=$w")
    }
  }

  test("k/w outside [1, 2^31) fail type-check") {
    import spark.implicits._
    Engine.register(spark)
    val df = Seq("abc").toDF("text")
    intercept[Exception](df.select(expr("fnv_grams(text, 0)")).collect())
    intercept[Exception](df.select(expr("fnv_grams(text, 4294967297)")).collect())
    intercept[Exception](
      df.select(expr("sliding_min(fnv_grams(text, 1), -1)")).collect())
  }
}
