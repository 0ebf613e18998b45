package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BandedLevenshtein]] vs Spark's builtin `levenshtein(l, r, t)` —
  * same contract (exact distance if ≤ threshold, −1 otherwise), so the
  * two must agree on EVERY pair, including the affix-strip and band
  * edges: identical strings, pure prefix/suffix edits, interior edits,
  * length-difference rejections, empties, and surrogate pairs (one
  * codepoint = one unit in both).
  */
class BandedLevenshteinSpec extends AnyFunSuite {

  private def both(a: String, b: String, tau: Int): (Int, Int) = {
    val sp = SparkTestSession.spark
    import sp.implicits._
    val r = Seq((a, b)).toDF("a", "b").select(
      HashExpressions.bandedLevenshtein(col("a"), col("b"), tau).as("n"),
      levenshtein(col("a"), col("b"), tau).as("l")).head()
    (r.getInt(0), r.getInt(1))
  }

  test("hand-picked edges agree with the builtin") {
    val cases = Seq(
      ("", "", 2), ("", "ab", 2), ("", "abc", 2),
      ("abc", "abc", 2), ("abc", "abd", 2), ("abc", "xbc", 2),
      ("abc", "abcx", 2), ("xabc", "abc", 2), ("xxabc", "abc", 2),
      ("xxxabc", "abc", 2),                       // just past tau
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("aaaa", "aabb", 2), ("abcd", "dcba", 2),
      // interior edit under long shared affixes (the strip fast path)
      ("a" * 100 + "X" + "b" * 100, "a" * 100 + "Y" + "b" * 100, 2),
      ("a" * 100 + "b" * 100, "a" * 100 + "Z" + "b" * 100, 1),
      // surrogate pairs: one codepoint each side
      ("a😀b", "a😁b", 2),
      ("😀", "", 2), ("é", "e", 1), ("tau0", "tau0", 0),
      ("tau0", "tau1", 0))
    cases.foreach { case (a, b, t) =>
      val (n, l) = both(a, b, t)
      assert(n == l, s"('$a','$b',$t): native $n vs builtin $l")
    }
  }

  test("random edit scripts agree with the builtin at every threshold 0..4") {
    val rnd = new scala.util.Random(1234)
    val alpha = "abcdef"
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val sp = SparkTestSession.spark
    import sp.implicits._
    val pairs = (0 until 300).map { _ =>
      val base = randStr(5 + rnd.nextInt(60))
      // apply 0..5 random edits
      var s = base
      (0 until rnd.nextInt(6)).foreach { _ =>
        val p = if (s.isEmpty) 0 else rnd.nextInt(s.length)
        rnd.nextInt(3) match {
          case 0 if s.nonEmpty => s = s.take(p) + s.drop(p + 1)                 // delete
          case 1 => s = s.take(p) + alpha(rnd.nextInt(alpha.length)) + s.drop(p) // insert
          case _ if s.nonEmpty => s = s.updated(p, alpha(rnd.nextInt(alpha.length)))
          case _ => ()
        }
      }
      (base, s)
    }
    val df = pairs.toDF("a", "b")
    (0 to 4).foreach { tau =>
      val rows = df.select(
        HashExpressions.bandedLevenshtein(col("a"), col("b"), tau).as("n"),
        levenshtein(col("a"), col("b"), tau).as("l"),
        col("a"), col("b")).collect()
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(1),
          s"tau $tau ('${r.getString(2)}','${r.getString(3)}'): " +
            s"native ${r.getInt(0)} vs builtin ${r.getInt(1)}")
      }
    }
  }
}
