package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE vocabulary induction: the position-parallel merge step must equal
 * greedy left-to-right non-overlapping merging, including the only
 * overlap case (left == right runs). */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def merge(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(Bpe.mergeStep(col("syms"), lit(a), lit(b)).as("m"))
      .as[Seq[String]].collect().head

  /** Reference greedy implementation, plain Scala. */
  private def greedy(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("mergeStep: distinct pair merges every occurrence") {
    assert(merge(Seq("l", "o", "w", "l", "o"), "l", "o")
      == Seq("lo", "w", "lo"))
  }

  test("mergeStep: equal-symbol runs merge greedily left-to-right") {
    assert(merge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(merge(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    assert(merge(Seq("b", "a", "a", "a", "b"), "a", "a") == Seq("b", "aa", "a", "b"))
  }

  test("mergeStep: no match leaves the word untouched; singletons survive") {
    assert(merge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(merge(Seq("x"), "x", "x") == Seq("x"))
  }

  test("mergeStep equals reference greedy on randomized small alphabets") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 60).map { _ =>
      val n = 1 + rnd.nextInt(8)
      (Seq.fill(n)(Seq("a", "b")(rnd.nextInt(2))),
        Seq("a", "b")(rnd.nextInt(2)), Seq("a", "b")(rnd.nextInt(2)))
    }
    val df = cases.zipWithIndex
      .map { case ((s, a, b), i) => (i, s, a, b) }.toDF("i", "syms", "a", "b")
    val got = df.select(col("i"),
        Bpe.mergeStep(col("syms"), col("a"), col("b")).as("m"))
      .as[(Int, Seq[String])].collect().toMap
    cases.zipWithIndex.foreach { case ((s, a, b), i) =>
      assert(got(i) == greedy(s, a, b), s"case $i: $s merge ($a,$b)")
    }
  }

  test("learn recovers the frequent pair ordering on a toy corpus") {
    // 'lo' dominates (low x5, lower x2, lowest x2 => 9), then merged
    // symbols keep composing
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(2)("lowest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.learn(docs, nMerges = 3)
      .select("rank", "lhs", "rhs", "n").as[(Int, String, String, Long)]
      .collect().sortBy(_._1)
    assert(m(0) == ((1, "l", "o", 9L)))
    assert(m(1) == ((2, "lo", "w", 9L)))
    // after (lo)(w): "low"=[low], "lower"=[low,e,r], "lowest"=[low,e,s,t]
    assert(m(2) == ((3, "low", "e", 4L)))
  }

  test("tokenStats: subword counts under the learned merges") {
    val docs = Seq((1L, "low low"), (2L, "lower")).toDF("doc_id", "text")
    val r = Bpe.tokenStats(docs, Seq(("l", "o"), ("lo", "w")))
      .as[(Long, Long, Long, Long)].collect().toSet
    // "low" -> [low] (1 subword), "lower" -> [low, e, r] (3)
    assert(r == Set((1L, 2L, 2L, 6L), (2L, 1L, 3L, 5L)))
  }
}
