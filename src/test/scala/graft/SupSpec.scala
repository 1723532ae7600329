package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.er._

class SupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val members = Seq(
    ("x", 1L, 0), ("x", 2L, 0), ("y", 1L, 0), ("y", 2L, 0), ("y", 3L, 0))
    .toDF("key", "profile_id", "source_id")
  private val stats = Seq(("x", 2L, 2L), ("y", 3L, 6L)).toDF("key", "size", "comparisons")

  test("features: cbs, js, raccb, labels") {
    val gt = Seq((1L, 2L)).toDF("p1", "p2")
    val f = SupervisedMB.features(members, stats, clean = false, Some(gt))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val f12 = f((1L, 2L))
    // cbs(1,2)=2; blocks_num=2; nb1=nb2=2 -> cfibf = 2*ln(1)*ln(1) = 0
    assert(f12.getDouble(2) == 0.0)
    // raccb = 1/2 + 1/6 = 2/3
    assert(math.abs(f12.getDouble(3) - (1.0 / 6 + 1.0 / 2)) < 1e-9)
    // redundant: p1: (2-1)+(3-1)=3, p2 same; js = 2/(3+3-2) = 0.5
    assert(math.abs(f12.getDouble(4) - 0.5) < 1e-9)
    assert(f12.getInt(11) == 1)       // is_match
    assert(f((1L, 3L)).getInt(11) == 0)
  }

  test("cep keeps global top-k by p_match among positives") {
    val scored = Seq(
      (1L, 2L, 0.9, 1), (1L, 3L, 0.7, 0), (2L, 3L, 0.6, 0), (4L, 5L, 0.4, 0))
      .toDF("p1", "p2", "p_match", "is_match")
    // K = floor(sum(size)/2) = floor(5/2) = 2
    val st = Seq(("b", 5L)).toDF("key", "size")
    val kept = SupervisedMB.cep(scored, st).select("p1", "p2")
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (1L, 3L)))
  }

  test("cep/cnp handle empty stats without NPE") {
    val scored = Seq((1L, 2L, 0.9, 0)).toDF("p1", "p2", "p_match", "is_match")
    val emptyStats = Seq.empty[(String, Long)].toDF("key", "size")
    // cep: K = floor(sum/2) has no floor -> empty stats means keep nothing
    assert(SupervisedMB.cep(scored, emptyStats).count() == 0)
    // cnp: the reference's k = 2*max(1, sum/N) floors at k=2 even with no
    // stats (greatest ignores the NULL sum), so the edge survives
    assert(SupervisedMB.cnp(scored, emptyStats, 3L, ComparisonType.OR).count() == 1)
  }

  test("blast rule: p >= 0.35 * (max1 + max2)") {
    val scored = Seq(
      (1L, 2L, 0.9, 0), (1L, 3L, 0.5, 0), (2L, 3L, 0.8, 0))
      .toDF("p1", "p2", "p_match", "is_match")
    val kept = SupervisedMB.blast(SupervisedMB.bcl(scored)).select("p1", "p2")
      .as[(Long, Long)].collect().toSet
    // max1: p1=1 -> .9, p1=2 -> .8; max2: p2=2 -> .9, p2=3 -> .8
    // (1,2): .9 >= .35*(.9+.9)=.63 ok; (1,3): .5 >= .35*(.9+.8)=.595 no
    // (2,3): .8 >= .35*(.8+.8)=.56 ok
    assert(kept == Set((1L, 2L), (2L, 3L)))
  }

  test("cnp OR keeps union of per-side top-k; AND the intersection") {
    val scored = Seq(
      (1L, 2L, 0.9, 0), (1L, 3L, 0.8, 0), (1L, 4L, 0.7, 0))
      .toDF("p1", "p2", "p_match", "is_match")
    // k = 2*max(1, 3/3) = 2 -> top-2 of p1-side for profile 1 = {2,3}
    val st = Seq(("b", 3L)).toDF("key", "size")
    val or = SupervisedMB.cnp(SupervisedMB.bcl(scored), st, 3L, ComparisonType.OR)
      .select("p2").as[Long].collect().toSet
    val and = SupervisedMB.cnp(SupervisedMB.bcl(scored), st, 3L, ComparisonType.AND)
      .select("p2").as[Long].collect().toSet
    // p2-side top-k: each neighbor profile has single edge -> retained
    assert(or == Set(2L, 3L, 4L))
    assert(and == Set(2L, 3L))
  }

  test("mlScore trains LR on labeled features and drives pruning end to end") {
    // separable fixture: matches have high Jaccard-family features
    val feats = (1 to 40).map { i =>
      val m = i % 2
      val base = 0.1 + m * 0.6 + (i % 5) * 0.01
      (i.toLong, (i + 100).toLong,
        base * 10, base, base, base, base * 5, base, base, m)
    }.toDF("p1", "p2", "cfibf", "raccb", "js", "rs", "aejs", "nrs", "wjs", "is_match")
    val scored = SupervisedMB.mlScore(feats)
    assert(scored.columns.contains("p_match"))
    val byLabel = scored.groupBy("is_match").agg(avg("p_match").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byLabel(1) > byLabel(0)) // classifier separates the labels
    assert(scored.filter(col("p_match") < 0 || col("p_match") > 1).count() == 0)
    // probabilities drive the pruning family end to end
    val kept = SupervisedMB.bcl(scored)
    assert(kept.count() > 0 && kept.count() < 40)
    assert(SupervisedMB.wep(scored).count() <= kept.count())
  }

  test("mlScore quality gate: holdout AUC above floor, calibrated prior") {
    // deterministic synthetic features: 20% positives, Jaccard-family
    // features shifted by the label plus hash-derived overlap noise (no
    // RNG — bit-stable across runs), large enough for a stable AUC
    val feats = (1 to 4000).map { i =>
      val label = if (i % 5 == 0) 1 else 0
      val noise = ((i * 2654435761L % 1000) / 1000.0 - 0.5) * 0.45
      val x = math.max(0.0, math.min(1.0, 0.25 + 0.4 * label + noise))
      (i.toLong, (i + 100000).toLong, x * 10, x, x, x, x * 5, x, x, label)
    }.toDF("p1", "p2", "cfibf", "raccb", "js", "rs", "aejs", "nrs", "wjs", "is_match")
    // train on 4/5 of the pairs by hash, evaluate on the held-out fifth
    val holdout = pmod(xxhash64(col("p1"), col("p2")), lit(5)) === 4
    val scored = SupervisedMB.mlScore(feats, trainOn = Some(!holdout))
      .filter(holdout).select("p_match", "is_match").cache()
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("p_match").setLabelCol("is_match")
      .setMetricName("areaUnderROC").evaluate(scored)
    assert(auc > 0.85, s"holdout AUC $auc below floor — model quality regressed")
    // calibration: the weighted negative sampling must preserve the class
    // prior (the sample weights exist exactly for this); a broken weighting
    // shifts the intercept and the mean predicted probability with it
    val row = scored.agg(avg("p_match"), avg(col("is_match").cast("double"))).first()
    val (meanP, rate) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(meanP - rate) < 0.05,
      s"mean p_match $meanP far from positive rate $rate — calibration broken")
  }

  test("fixedScore: frozen-coefficient logistic is monotone and separates the fixture") {
    val feats = Seq(
      (1L, 2L, 20.0, 0.9, 0.9, 3L, 3L, 0.9, 4.0, 0.9, 0.9, 1),   // match-like
      (3L, 4L, 1.0, 0.05, 0.05, 9L, 9L, 0.05, 0.1, 0.05, 0.05, 0) // noise-like
    ).toDF("p1", "p2", "cfibf", "raccb", "js", "num_comp_p1", "num_comp_p2",
      "rs", "aejs", "nrs", "wjs", "is_match")
    val p = SupervisedMB.fixedScore(feats)
      .orderBy("p1").select("p_match").as[Double].collect()
    assert(p.forall(v => v > 0.0 && v < 1.0))
    assert(p(0) > 0.5 && p(1) < 0.5,
      s"frozen model should separate the fixture: got ${p.toSeq}")
  }

  test("ppsEmission ranks by likelihood then weight") {
    val weighted = Seq((1L, 2L, 5.0, 5.0), (1L, 3L, 1.0, 1.0), (4L, 5L, 3.0, 3.0))
      .toDF("p1", "p2", "w1", "w2")
    val r = Progressive.ppsEmission(weighted, k = 2, limit = 100)
      .orderBy("rank").select("p1", "p2").as[(Long, Long)].collect()
    // likelihoods: 1 -> 3.0, 2 -> 5, 3 -> 1, 4 -> 3, 5 -> 3
    // best profile = 2 (5.0): edge (1,2) first
    assert(r.head == ((1L, 2L)))
    assert(r.toSet == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("ppsStream consumes the emission order in mini-batches") {
    val weighted = Seq((1L, 2L, 5.0, 5.0), (1L, 3L, 1.0, 1.0), (4L, 5L, 3.0, 3.0))
      .toDF("p1", "p2", "w1", "w2")
    val expected = Progressive.ppsEmission(weighted, k = 2, limit = 100)
      .orderBy("rank").select("p1", "p2").as[(Long, Long)].collect().toSeq
    val stream = Progressive.ppsStream(weighted, k = 2)
    val got = (stream.getNext(2) ++ stream.getNext(10))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == expected)
    assert(!stream.hasNext)
    assert(stream.getNext(5).isEmpty)
  }

  test("clusterAttributes: normalizeEntropy shrinks, default cluster flagged") {
    val attrs = Seq(
      (1L, 0, "name", "alpha beta gamma delta"),
      (2L, 0, "name", "alpha beta gamma epsilon"),
      (3L, 1, "name", "alpha beta gamma delta"),
      (4L, 1, "name", "alpha beta gamma epsilon"),
      (1L, 0, "other", "one two three"),
      (3L, 1, "other", "four five six"))
      .toDF("profile_id", "source_id", "attribute", "value")
    val raw = AttributeClustering.clusterAttributes(attrs)
      .collect().map(r => r.getString(0) -> r).toMap
    val norm = AttributeClustering.clusterAttributes(attrs, normalizeEntropy = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // disjoint-token 'other' attrs have no cross-source partner -> default
    assert(raw("0_other").getBoolean(3) && raw("1_other").getBoolean(3))
    assert(!raw("0_name").getBoolean(3))
    // normalized entropy = raw / log2(#occurrences) < raw for >2 tokens
    assert(norm("0_name") < raw("0_name").getDouble(2))

    // excludeDefaultCluster drops every key of the default cluster
    val clusters = AttributeClustering.clusterAttributes(attrs)
    val keys = AttributeClustering.clusterKeys(attrs, clusters, excludeDefaultCluster = true)
      .select("key").as[String].collect()
    val nameToks = Set("alpha", "beta", "gamma", "delta", "epsilon")
    assert(keys.nonEmpty && keys.forall(k => nameToks.contains(k.split("_")(0))))
  }

  test("estimateBlockEntropy: reference quirk (Shannon sum / n)") {
    val members = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L), ("y", 3L))
      .toDF("key", "profile_id")
    val pb = members.select(col("profile_id"), col("key"))
    val ent = Statistics.estimateBlockEntropy(members, pb)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // block x members {1,2}; their block lists: {x,y},{x,y} -> counts
    // x:2, y:2 of n=4 -> shannon = -2*(0.5*ln 0.5) = ln 2; quirk: / n
    assert(math.abs(ent("x") - math.log(2.0) / 4.0) < 1e-12)
  }

  test("gspsn emission == reference window-sweep PriorityQueue simulation") {
    // Driver-side simulation of the reference's GSPSN
    // (python/sparker/progressive.py:288-400): for every position of a
    // profile, sweep window sizes w = 1..max in both directions and
    // accumulate cbs against smaller-id neighbors; weight = positional
    // Jaccard; emission = PriorityQueue over (-weight, n_id, profile_id).
    // The sweep visits exactly the position pairs with |delta| <= max, so
    // the distributed range-join must reproduce BOTH the weights and the
    // full emission order. Positions are assigned in (token, profile_id)
    // order (our documented tiebreak; the reference leaves equal-token
    // order to partition chance).
    val maxW = 3
    // overlapping tokens, shared positions, tie weights, >maxW gaps
    val fixture = Seq(
      ("alpha", 1L), ("alpha", 2L), ("alpha", 5L),
      ("beta", 1L), ("beta", 3L),
      ("gamma", 2L), ("gamma", 3L), ("gamma", 4L),
      ("delta", 4L), ("delta", 5L), ("epsilon", 1L), ("zeta", 6L))
    val pos = fixture.sorted.zipWithIndex.map { case ((_, pid), i) => (i.toLong, pid) }
    val posByProfile = pos.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val profileAt = pos.toMap[Long, Long] // position -> profile
    val results = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    posByProfile.keys.toSeq.sorted.foreach { p =>
      val cbs = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      for (pp <- posByProfile(p); w <- 1 to maxW; dir <- Seq(-1, 1)) {
        val q = pp + w * dir
        profileAt.get(q).foreach { n => if (n < p) cbs(n) += 1 }
      }
      cbs.foreach { case (n, c) =>
        val wgt = c.toDouble / (posByProfile(p).size + posByProfile(n).size - c)
        results += ((-wgt, n, p))
      }
    }
    // PriorityQueue pops ascending (-w, n_id, profile_id) == our rank order
    val expected = results.sorted.map { case (nw, n, p) =>
      (n, p, BigDecimal(-nw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val keys = fixture.map { case (t, p) => (t, p, 0) }.toDF("key", "profile_id", "source_id")
    val got = Progressive.gspsn(keys, window = maxW, limit = 100)
      .orderBy("rank").select("p1", "p2", "w")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("gspsn clean mode keeps only cross-source candidates") {
    val keys = Seq(
      ("aa", 1L, 0), ("ab", 2L, 0), ("ac", 3L, 1), ("ad", 4L, 1))
      .toDF("key", "profile_id", "source_id")
    // positions 0..3; window 3 reaches every pair; dirty keeps all 6 pairs,
    // clean only the 4 cross-source ones
    val dirty = Progressive.gspsn(keys, window = 3, limit = 10)
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    val clean = Progressive.gspsn(keys, window = 3, limit = 10, clean = true)
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    assert(dirty == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(clean == Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
  }

  test("gspsn: adjacent tokens in sorted stream become weighted candidates") {
    val keys = Seq(
      ("aa", 1L, 0), ("ab", 2L, 0), ("zz", 3L, 0))
      .toDF("key", "profile_id", "source_id")
    val r = Progressive.gspsn(keys, window = 1, limit = 10)
      .select("p1", "p2", "w").as[(Long, Long, Double)].collect()
    // positions: aa->0 (p1), ab->1 (p2), zz->2 (p3); window 1:
    // (1,2) cbs=1 w=1/(1+1-1)=1; (2,3) cbs=1 w=1
    assert(r.map(x => (x._1, x._2)).toSet == Set((1L, 2L), (2L, 3L)))
    assert(r.forall(_._3 == 1.0))
  }

  test("attribute clustering aligns matching attributes across sources") {
    // two sources with identical token distributions for 'name', disjoint
    // for 'other'
    val attrs = Seq(
      (1L, 0, "name", "alpha beta gamma delta"),
      (2L, 0, "name", "alpha beta gamma epsilon"),
      (3L, 1, "name", "alpha beta gamma delta"),
      (4L, 1, "name", "alpha beta gamma epsilon"),
      (1L, 0, "other", "one two three"),
      (3L, 1, "other", "four five six"))
      .toDF("profile_id", "source_id", "attribute", "value")
    val clusters = AttributeClustering.clusterAttributes(attrs, k = 16, bands = 4)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(clusters("0_name") == clusters("1_name"))
    assert(clusters("0_other") != clusters("0_name") || clusters("1_other") != clusters("1_name"))
  }

  test("connectedComponents finds min labels") {
    val verts = Seq("a", "b", "c", "d").toDF("qattr")
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a1", "a2")
    val labels = AttributeClustering.connectedComponents(verts, edges)
      .as[(String, String)].collect().toMap
    assert(labels("a") == "a" && labels("b") == "a" && labels("c") == "a")
    assert(labels("d") == "d")
  }
}
