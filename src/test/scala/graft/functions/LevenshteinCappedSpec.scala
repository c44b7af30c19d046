package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `levenshtein_capped` contracts: agrees exactly with the built-in
  * `levenshtein` on every pair within the cap (randomized cross-check
  * plus hand-built trim/band boundary cases), returns cap + 1 beyond
  * it, and the trim path answers pure suffix/prefix revisions without
  * touching the DP.
  */
class LevenshteinCappedSpec extends SparkSpec {

  private def both(a: String, b: String, cap: Int): (Long, Long) = {
    import spark.implicits._
    graft.Engine.register(spark)
    val r = Seq((a, b)).toDF("a", "b")
      .select(
        graft.functions.dsl.levenshtein_capped(col("a"), col("b"), cap).as("c"),
        levenshtein(col("a"), col("b")).cast("long").as("full"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("agrees with the built-in within the cap; clamps to cap + 1 beyond it") {
    val cases = Seq(
      ("", "", 4), ("abc", "abc", 4), ("abc", "", 4), ("", "abcd", 4),
      ("kitten", "sitting", 4), ("flaw", "lawn", 4),
      ("abcdefgh", "abcdefgh zq", 4),      // pure suffix insert: trim answers
      ("xy abcdefgh", "abcdefgh", 4),      // pure prefix delete
      ("aaaa", "bbbb", 4),                 // all substitutions, == cap
      ("aaaaa", "bbbbb", 4),               // exceeds cap by 1
      ("same prefix DIFFERS here same suffix", "same prefix differs here same suffix", 4),
      ("ab", "ba", 1),                     // transposition costs 2 > cap
      ("abcd", "abcd", 0), ("abcd", "abce", 0))
    cases.foreach { case (a, b, cap) =>
      val (capped, full) = both(a, b, cap)
      if (full <= cap) assert(capped == full, s"($a, $b, cap=$cap): $capped != $full")
      else assert(capped == cap + 1L, s"($a, $b, cap=$cap): expected ${cap + 1}, got $capped")
    }
  }

  test("randomized cross-check against the built-in at several caps") {
    val rnd = new scala.util.Random(14)
    val alphabet = "abcde"
    def word(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    import spark.implicits._
    graft.Engine.register(spark)
    val pairs = (0 until 400).map { _ =>
      val a = word(3 + rnd.nextInt(40))
      // half the pairs are edits of a (near-dups), half independent
      val b = if (rnd.nextBoolean()) {
        val chars = a.toCharArray.toBuffer
        (0 until rnd.nextInt(6)).foreach { _ =>
          val op = rnd.nextInt(3)
          val pos = rnd.nextInt(chars.length max 1)
          op match {
            case 0 if chars.nonEmpty => chars.remove(pos min (chars.length - 1)); ()
            case 1 => chars.insert(pos min chars.length, alphabet(rnd.nextInt(5))); ()
            case _ if chars.nonEmpty =>
              chars(pos min (chars.length - 1)) = alphabet(rnd.nextInt(5)); ()
            case _ => ()
          }
        }
        chars.mkString
      } else word(3 + rnd.nextInt(40))
      (a, b)
    }
    Seq(0, 1, 4, 9).foreach { cap =>
      val rows = pairs.toDF("a", "b")
        .select(
          graft.functions.dsl.levenshtein_capped(col("a"), col("b"), cap).as("c"),
          levenshtein(col("a"), col("b")).cast("long").as("full"))
        .collect()
      rows.foreach { r =>
        val (c, full) = (r.getLong(0), r.getLong(1))
        if (full <= cap) assert(c == full, s"cap=$cap: $c != $full")
        else assert(c == cap + 1L, s"cap=$cap: expected ${cap + 1}, got $c")
      }
    }
  }

  test("trim-proof long pairs (edits at BOTH ends) stay exact: the band swap never reads a stale cell") {
    // One substitution at each end defeats the prefix/suffix trim
    // entirely, so the banded DP runs the full length — the shape that
    // exercises every band-boundary cell across thousands of row
    // swaps (a reference-swap bug that left a stale value one past
    // the band would misreport exactly these pairs)
    val mid = ("x" * 4000)
    val a = "A" + mid + "Z"
    val b = "B" + mid + "Y"                    // distance 2
    val c = "B" + mid.patch(2000, "q", 0) + "Y" // vs a: 2 subs + 1 insert = 3
    val d = "B" + ("x" * 3996) + "Y"           // vs a: 2 subs + 4 deletes = 6 > cap
    assert(both(a, b, 4) == ((2L, 2L)))
    assert(both(a, c, 4) == ((3L, 3L)))
    assert(both(a, d, 4)._1 == 5L)
    // asymmetric lengths right at the |m-n| = cap boundary
    val e = "A" + mid + "Z" + "pppp"           // vs a: 4 pure inserts... but
    assert(both(a, e, 4) == ((4L, 4L)))        // trim answers; force the DP:
    val f = "B" + mid + "Y" + "pp"             // 2 subs + 2 inserts = 4 == cap
    assert(both(a, f, 4) == ((4L, 4L)))
  }
}
