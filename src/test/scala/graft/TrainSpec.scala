package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.multimodal.Multimodal
import graft.streaming.EventStreams

class TrainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("tokenCount / punctRatio / stopwordRatio / meanTokenLen") {
    val df = docs((1L, "the cat sat!!"), (2L, ""))
    val r = df.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.stopwordRatio(col("text")).as("s"),
      TextAnalysis.meanTokenLen(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(r(1L)._1 == 3)
    // "thecatsat!!" 11 non-space chars, 2 punct
    assert(math.abs(r(1L)._2 - 2.0 / 11.0) < 1e-12)
    assert(math.abs(r(1L)._3 - 1.0 / 3.0) < 1e-12)
    // tokens: the(3) cat(3) sat!!(5) -> mean 11/3
    assert(math.abs(r(1L)._4 - 11.0 / 3.0) < 1e-12)
    assert(r(2L) == ((0, 0.0, 0.0, 0.0)))
  }

  test("languageId picks marker-word argmax, und when none") {
    val df = docs((1L, "the cat and the dog"), (2L, "der hund ist gross"), (3L, "xyzzy"))
    val r = df.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("fingerprint is the rolling 31-hash of lower(trim(text))") {
    val r = docs((1L, " Ab ")).select(TextAnalysis.fingerprint(col("text")))
      .as[Long].collect().head
    // "ab": ((0*31+97)%M)*31+98 % M = 97*31+98 = 3105
    assert(r == 3105L)
  }

  test("exact dedup groups identical normalized text") {
    val df = docs((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
    val r = Dedup.exact(df).as[(Long, Long)].collect().toMap
    assert(r(1L) == 1L && r(2L) == 1L && r(3L) == 3L)
  }

  test("shingles builds word 3-grams, distinct") {
    val df = docs((1L, "a b c d"))
    val r = Dedup.shingles(df, 3).select("shingle").as[String].collect().toSet
    assert(r == Set("a b c", "b c d"))
  }

  test("shingles on a doc shorter than n yields no rows (not a slice error)") {
    val df = docs((1L, "a b"), (2L, ""), (3L, "x y z"))
    val r = Dedup.shingles(df, 3).as[(Long, String)].collect().toSet
    assert(r == Set(3L -> "x y z"))
  }

  test("jaccardPairs computes exact shingle jaccard") {
    val df = docs((1L, "a b c d"), (2L, "a b c e"))
    // shingles: {abc,bcd} vs {abc,bce} -> jaccard 1/3
    val r = Dedup.jaccardPairs(Dedup.shingles(df, 3), 0.3)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect()
    assert(r.length == 1 && r.head._1 == 1L && r.head._2 == 2L)
    assert(math.abs(r.head._3 - 1.0 / 3.0) < 1e-6)
  }

  test("containmentPairs is asymmetric: small-in-big fires one direction only") {
    // doc 1's shingles: {a b c, b c d} — BOTH inside doc 2's set
    // {a b c, b c d, c d e, d e f}; C(1→2)=1.0, C(2→1)=0.5
    val df = docs((1L, "a b c d"), (2L, "a b c d e f"))
    val r = Dedup.containmentPairs(Dedup.shingles(df, 3), threshold = 0.8)
      .select("src", "dst", "containment").as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 2L, 1.0))) // 2→1 at 0.5 is below the gate
    val both = Dedup.containmentPairs(Dedup.shingles(df, 3), threshold = 0.4)
      .select("src", "dst", "containment").as[(Long, Long, Double)]
      .collect().map { case (s, d2, c) => s -> ((d2, c)) }.toMap
    assert(both(1L) == ((2L, 1.0)) && both(2L) == ((1L, 0.5)))
  }

  test("minhash LSH finds near-identical docs") {
    val df = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words here nothing shared at all everything distinct"))
    val r = Dedup.minhashLsh(Dedup.shingles(df, 3)).select("d1", "d2", "est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(r.exists(x => x._1 == 1L && x._2 == 2L && x._3 == 1.0))
    assert(!r.exists(x => x._2 == 3L || x._1 == 3L))
  }

  test("dedup clusters: min-label propagation over chained pairs") {
    val df = docs((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    // chain 1-2-3 collapses to rep 1 (requires >1 propagation round); 4 is a singleton
    val r = Dedup.clusters(df, pairs).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("simhash identical docs share fingerprints; pairs found at distance 0") {
    val df = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
    val fp = Dedup.simhash(df).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    val pairs = Dedup.simhashPairs(Dedup.simhash(df)).select("d1", "d2", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // patch dot/norm to 2 dims by constructing similarity directly
    val r = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .select("query_id", "nn_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(r == Set((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("decodePpm parses real P6 bytes: round-trip, comments, malformed input") {
    // hand-built 2x1 image: pixels (1,2,3)(250,251,252)
    val rgb = Array[Byte](1, 2, 3, 250.toByte, 251.toByte, 252.toByte)
    val r = Multimodal.decodePpm(7L, Multimodal.encodePpm(2, 1, rgb))
    assert(r.getInt(1) == 2 && r.getInt(2) == 1)
    // checksum = 1*1 + 2*2 + 3*3 + 4*250 + 5*251 + 6*252
    assert(r.getLong(3) == 1 + 4 + 9 + 1000 + 1255 + 1512)
    val mean = (1 + 2 + 3 + 250 + 251 + 252) / 6.0
    assert(math.abs(r.getDouble(4) - mean) < 1e-6)
    // a header with comments and odd whitespace is still valid PPM
    val wild = ("P6 # comment after magic\n# full-line comment\n 2\t1 " +
      "\n255\n").getBytes("US-ASCII") ++ rgb
    val rw = Multimodal.decodePpm(8L, wild)
    assert(rw.getInt(1) == 2 && rw.getInt(2) == 1 && rw.getLong(3) == r.getLong(3))
    // malformed inputs fail loudly, not silently
    intercept[IllegalArgumentException](Multimodal.decodePpm(9L, "P5\n1 1\n255\n".getBytes ++ Array[Byte](0)))
    intercept[IllegalArgumentException](Multimodal.decodePpm(9L, Multimodal.encodePpm(2, 1, rgb).dropRight(1)))
    // the distributed path: fixtures through the batched mapPartitions
    val feats = Multimodal.decodeFeatures(
      Seq(3L, 11L).map(id => (id, Multimodal.ppmFixture(id))).toDF("doc_id", "payload"),
      decoder = Multimodal.decodePpm, schema = Multimodal.PpmFeatureSchema)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(feats(3L).getInt(1) == 4 + 3 % 5 && feats(3L).getInt(2) == 3 + 3 % 4)
    assert(feats(11L).getInt(1) == 4 + 11 % 5 && feats(11L).getInt(2) == 3 + 11 % 4)
  }

  test("multimodal decode produces deterministic features + frame samples") {
    val df = docs((1L, "abcd"))
    val mm = Multimodal.asMultimodal(df)
    val f = Multimodal.decodeFeatures(mm).collect().head
    assert(f.getInt(1) == 16 + 4 && f.getInt(2) == 16 && f.getInt(3) == 1 + 4)
    val mean = (97 + 98 + 99 + 100) / 4.0
    assert(math.abs(f.getDouble(4) - mean) < 1e-6)
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeFeatures(mm), stride = 2)
      .select("frame_idx").as[Int].collect().toSet
    assert(frames == Set(0, 2, 4))
    // width 20, height 16 -> scale = 32/20 capped at 1.0 -> unchanged;
    // a 4x box forces aspect-preserving downscale: floor(20*0.2)=4, floor(16*0.2)=3
    val rz = Multimodal.resizeDims(Multimodal.decodeFeatures(mm)).collect().head
    assert(rz.getInt(3) == 20 && rz.getInt(4) == 16)
    val rz4 = Multimodal.resizeDims(Multimodal.decodeFeatures(mm), maxW = 4, maxH = 4).collect().head
    assert(rz4.getInt(3) == 4 && rz4.getInt(4) == 3)
  }

  test("ivfTopK probes nearest inverted lists; full probe set equals brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    // probing every list makes IVF exhaustive -> must equal brute force
    val ivfAll = Similarity.ivfTopK(e, q, k = 5, nCentroids = 4, nProbe = 4)
      .select("query_id", "nn_id", "rn").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "nn_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(ivfAll == brute)
    // partial probing returns k results per query from the probed lists only
    val ivf1 = Similarity.ivfTopK(e, q, k = 5, nCentroids = 4, nProbe = 1)
    assert(ivf1.groupBy("query_id").count().select("count").as[Long].collect().forall(_ <= 5))
  }

  test("winnow: rightmost-min ties, window coverage, shared-substring guarantee") {
    // small k/w pinned explicitly: these cases test the selection
    // mechanics; the production defaults (k=25, w=25) are covered by the
    // oracle queries and the defaults test below
    // all-equal gram hashes -> each full window selects its LAST position:
    // len 10, k=5 -> grams 1..6; starts 1..3 pick positions 4, 5, 6
    val rep = TextAnalysis.winnow(docs((1L, "aaaaaaaaaa")), k = 5, w = 4)
      .select("pos").as[Long].collect().toSet
    assert(rep == Set(4L, 5L, 6L))
    // two docs sharing a substring of length >= k + w - 1 = 8 must share
    // at least one fingerprint hash (the winnowing guarantee)
    val f = TextAnalysis.winnow(
      docs((1L, "xxINVARIANTzz"), (2L, "qqqINVARIANTp")), k = 5, w = 4)
    val sets = f.select("doc_id", "gram_hash").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((sets(1L) intersect sets(2L)).nonEmpty)
    // density: every full window contributes, so selections per doc are
    // bounded by window starts and non-empty
    val counts = f.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(counts.forall(c => c > 0 && c <= 9))
  }

  test("winnowPairs: shared-count correctness and frequency cap") {
    // doc 1 and 2 share the long INVARIANTBLOCK substring -> many shared
    // fingerprints; doc 3 is unrelated
    val f = TextAnalysis.winnow(docs(
      (1L, "xxINVARIANTBLOCKzz"), (2L, "qqINVARIANTBLOCKpp"), (3L, "totally other")),
      k = 5, w = 4)
    val pairs = TextAnalysis.winnowPairs(f, minShared = 1)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(pairs.keySet == Set((1L, 2L)))
    // n_shared equals the exact distinct-hash intersection size
    val sets = f.select("doc_id", "gram_hash").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert(pairs((1L, 2L)) == (sets(1L) intersect sets(2L)).size.toLong)
    // a frequency cap of 1 drops every hash present in 2+ docs -> no pairs
    assert(TextAnalysis.winnowPairs(f, minShared = 1, maxHashFreq = 1).isEmpty)
  }

  test("winnow production defaults honor the t = k + w - 1 guarantee") {
    // substrings of length exactly WinnowK + WinnowW - 1 = 49 shared by
    // two documents must collide on at least one fingerprint
    val block = "m" * (TextAnalysis.WinnowK + TextAnalysis.WinnowW - 1)
    val f = TextAnalysis.winnow(docs(
      (1L, s"leftpad $block done"), (2L, s"$block alternative suffix text")))
    val sets = f.select("doc_id", "gram_hash").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((sets(1L) intersect sets(2L)).nonEmpty)
  }

  test("winnowPairs/jaccardPairs cap drop counts are observable") {
    // hash 100 in 3 docs > cap 2 -> 3 postings dropped; hash 200 kept
    val fps = Seq((1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L),
      (1L, 0L, 200L), (2L, 0L, 200L)).toDF("doc_id", "pos", "gram_hash")
    // the capped postings are materialized by an internal Snapshot (the
    // self-join reads them twice), so the metric fires on the snapshot
    // WRITE during construction — the session-wide Recorder is the
    // documented way to read it (CapMetrics.lastDrops scaladoc)
    val rec = new graft.util.CapMetrics.Recorder
    spark.listenerManager.register(rec)
    try {
      val wp = TextAnalysis.winnowPairs(fps, minShared = 1, maxHashFreq = 2)
      val wpRows = wp.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(wpRows == Set((1L, 2L, 1L)))
      assert(rec.await("winnow_pairs_cap").contains((3L, 5L)))
    } finally spark.listenerManager.unregister(rec)
    // shingle "s" in 3 docs > cap 2 -> its 3 postings dropped
    val sh = Seq((1L, "s"), (2L, "s"), (3L, "s"), (1L, "t"), (2L, "t"))
      .toDF("doc_id", "shingle")
    val jp = Dedup.jaccardPairs(sh, threshold = 0.1, maxShingleFreq = 2)
    jp.collect()
    assert(graft.util.CapMetrics.lastDrops(jp, "jaccard_pairs_cap")
      .contains((3L, 5L)))
  }

  test("dropHotKeys counts and drops hot NULL keys (null-safe join-back)") {
    // 3 null-key rows > cap 2 must be dropped AND counted; a plain `=`
    // join-back would leave the null partition untagged — neither
    val df = Seq(Some("a"), Some("a"), None, None, None)
      .toDF("k").withColumn("v", lit(1))
    val capped = graft.util.CapMetrics.dropHotKeys(df, "k", maxFreq = 2L,
      name = "null_cap_test")
    val kept = capped.collect().map(r => Option(r.getString(0))).toSeq
    assert(kept == Seq(Some("a"), Some("a")))
    assert(graft.util.CapMetrics.lastDrops(capped, "null_cap_test")
      .contains((3L, 5L)))
  }

  test("containmentBloom equals exact containment for any filter size (lossless)") {
    val sh = Dedup.shingles(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 3)
    val bench = sh.filter(col("doc_id") % 50 === 0)
    val train = sh.filter(col("doc_id") % 50 =!= 0)
    val exact = Dedup.containment(train, bench, 1L)
    val bloom = Dedup.containmentBloom(train, bench, 1L)
    assert(bloom.count() > 0 && bloom.count() == exact.count())
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
    // a saturated 64-bit filter passes everything -> still exact, never lossy
    val tiny = Dedup.containmentBloom(train, bench, 1L, mBits = 64, kProbes = 2)
    assert(tiny.exceptAll(exact).isEmpty && exact.exceptAll(tiny).isEmpty)
  }

  test("row-wise minhashBandKeys buckets docs identically to the exploded LSH index") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bk = Dedup.minhashBandKeys(d)
    val a = bk.select(col("band"), col("band_val"), col("doc_id").as("d1"))
    val b = bk.select(col("band"), col("band_val"), col("doc_id").as("d2"))
    val rowwise = a.join(b, Seq("band", "band_val")).filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val exploded = Dedup.minhashLsh(Dedup.shingles(d, 3), k = 16, bands = 4)
      .select("d1", "d2")
    assert(rowwise.count() > 0)
    assert(rowwise.exceptAll(exploded).isEmpty && exploded.exceptAll(rowwise).isEmpty)
  }

  test("lshIngestStreaming equals the batch new-vs-corpus band-key join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.lshIngestStreaming(spark, dir)
    val bk = Dedup.minhashBandKeys(spark.read.parquet(s"$dir/documents.parquet"))
    val batch = bk.filter(col("doc_id") % 10 === 0).withColumnRenamed("doc_id", "new_id")
      .join(bk.filter(col("doc_id") % 10 =!= 0)
        .select(col("band"), col("band_val"), col("doc_id").as("corpus_id")),
        Seq("band", "band_val"))
      .select("new_id", "corpus_id").distinct()
    assert(streamed.count() > 0 && streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sessionizeStreaming (flatMapGroupsWithState) matches the batch twin") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.sessionizeStreaming(spark, dir)
      .select("user_id", "session_seq", "session_start", "session_end", "n_events", "value_sum")
    val batch = EventStreams.sessionize(EventStreams.loadEvents(spark, dir))
      .select("user_id", "session_seq", "session_start", "session_end", "n_events", "value_sum")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("distinctPairsStreaming equals the batch DISTINCT") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.distinctPairsStreaming(spark, dir)
    val batch = EventStreams.loadEvents(spark, dir)
      .select("user_id", "event_type").distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("dropDuplicatesWithinWatermark stream equals batch DISTINCT on derived keys") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.dedupWithinWatermarkStreaming(spark, dir)
    val batch = EventStreams.loadEvents(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("event_day")).distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("fused TokenTextStats analyze == HOF reference semantics (unicode-rich property)") {
    // adversarial corpus: whitespace variants, astral-plane codepoints,
    // unicode lowercasing edge cases, marker words of several languages,
    // punctuation soup, empties — plus generated mixtures
    val seeds = Seq(
      "", " ", "\t\n\f\r", "the and of to is", "der die und ist",
      "abc", "ABCdefGHIjklMNOpqr", "a1b2c3 d4e5", "!!!???;;;",
      "😀 emoji 😁😂 tokens",
      "İstanbul STRASSE ß ſ KK", // unicode lowercase edge cases
      "  leading and trailing  ", "tab\tsep\nnewline\rcr",
      "el la y es los", "le la et est", "mixed the der le el il o",
      "x" * 500, ("word " * 100).trim)
    val alphabet = "abct ħeß😀.!\t\n ABZ0189 þ"
    val gen = (1 to 200).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = (seeds ++ gen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fused = graft.text.TextAnalysis.analyze(docs, "text", fused = true)
    val hof = graft.text.TextAnalysis.analyze(docs, "text", fused = false)
    val diff = fused.exceptAll(hof).union(hof.exceptAll(fused))
    assert(diff.isEmpty, s"fused/HOF divergence:\n${diff.collect().mkString("\n")}")
  }

  test("funnelJoinStreaming (stream-stream interval join) equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.funnelJoinStreaming(spark, dir)
    val ev = EventStreams.loadEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
        col("user_id") === col("pu") && col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("interval 60 minutes"))
      .select("user_id", "click_id", "purchase_id")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("domainCap keeps at most k per domain with deterministic priority") {
    val docs = (1L to 40L).map(i => (i, s"src${i % 3}", "t")).toDF("doc_id", "source", "text")
    val capped = graft.text.Curation.domainCap(docs, k = 5)
    val bySrc = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.values.forall(_ == 5) && bySrc.size == 3)
    // priority is the Knuth-hash order, not plain id order
    val picked = capped.filter(col("source") === "src0").select("doc_id")
      .as[Long].collect().toSet
    val expect = (1L to 40L).filter(_ % 3 == 0)
      .sortBy(i => (i * 2654435761L % 1000000007L, i)).take(5).toSet
    assert(picked == expect)
  }

  test("stratifiedSample keeps deterministic per-stratum fractions") {
    val docs = (1L to 2000L).map(i => (i, if (i % 4 == 0) "xx" else "en", "t"))
      .toDF("doc_id", "lang", "text")
    val kept = graft.text.Curation.stratifiedSample(docs,
      rates = Map("en" -> 50), defaultRate = 10)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // hash is uniform-ish: en ~50% of 1500, xx ~10% of 500
    assert(byLang("en") > 600 && byLang("en") < 900)
    assert(byLang("xx") > 20 && byLang("xx") < 90)
    // replayable: the same docs survive a second run
    val again = graft.text.Curation.stratifiedSample(docs,
      rates = Map("en" -> 50), defaultRate = 10)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }

  test("vocabTopN counts normalized tokens with (cnt desc, token) rank") {
    val docs = Seq((1L, "a b a"), (2L, "B a  c"), (3L, "c a")).toDF("doc_id", "text")
    val v = graft.text.Curation.vocabTopN(docs, n = 2)
      .select("token", "cnt", "rank").as[(String, Long, Int)].collect().toList
    assert(v == List(("a", 4L, 1), ("b", 2L, 2)))
  }

  test("packSequences bins by running token budget, matches a serial walk") {
    val docs = (1L to 100L).map(i => (i, ("w " * ((i % 7).toInt + 1)).trim)).toDF("doc_id", "text")
    val packed = graft.text.Curation.packSequences(docs, budget = 10)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    var cum = 0L
    packed.foreach { case (id, n, bin) =>
      assert(n == (id % 7 + 1))
      assert(bin == cum / 10, s"doc $id: bin $bin != ${cum / 10}")
      cum += n
    }
    // docs never span backwards and bins are monotone
    assert(packed.map(_._3).toSeq == packed.map(_._3).sorted.toSeq)
  }

  test("chunkPayload splits payloads into fixed byte windows, ragged tail") {
    val docs = Seq((1L, "a" * 600), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val chunks = graft.multimodal.Multimodal
      .chunkPayload(graft.multimodal.Multimodal.asMultimodal(docs), chunkBytes = 256)
      .select("doc_id", "chunk_idx", "chunk_len")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toList
    assert(chunks == List((1L, 0, 256L), (1L, 1, 256L), (1L, 2, 88L), (2L, 0, 2L)))
    // chunks reassemble to the original payload
    val joined = graft.multimodal.Multimodal
      .chunkPayload(graft.multimodal.Multimodal.asMultimodal(docs), chunkBytes = 256)
      .groupBy("doc_id")
      .agg(expr("concat_ws('', transform(array_sort(collect_list(" +
        "named_struct('i', chunk_idx, 's', decode(chunk, 'utf-8')))), x -> x.s))").as("re"))
    val back = joined.as[(Long, String)].collect().toMap
    assert(back(1L) == "a" * 600 && back(2L) == "xy")
  }

  test("asofJoin matches latest prior click, same-ts counts, ties by max id") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // user 1: click at 10:00 (ids 1 and 2 tie on ts), purchase 10:05 ->
      // click_id 2; purchase 09:55 -> no prior click
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:05:00"), 7L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-01 09:55:00"), 7L, "purchase", 1.0, "{}"),
      // user 8: purchase at EXACTLY the click ts -> same-ts click counts
      (5L, ts("2024-01-01 11:00:00"), 8L, "click", 0.0, "{}"),
      (6L, ts("2024-01-01 11:00:00"), 8L, "purchase", 1.0, "{}"),
      // other event types are ignored
      (9L, ts("2024-01-01 10:04:00"), 7L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventStreams.asofJoin(df)
      .select("purchase_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(r == Map(3L -> Some(2L), 4L -> None, 6L -> Some(5L)))
  }

  test("containment flags train docs sharing >= minShared bench shingles") {
    // bench doc 100: shingles {a b c, b c d, c d e}; train doc 1 shares
    // two of them, train doc 2 shares one (below threshold)
    val df = docs(
      (100L, "a b c d e"),
      (1L, "a b c d x"),
      (2L, "z z a b c"))
    val sh = Dedup.shingles(df, 3)
    val r = Dedup.containment(
      sh.filter(col("doc_id") =!= 100L), sh.filter(col("doc_id") === 100L),
      minShared = 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1L, 100L, 2L, 2.0 / 3)))
  }

  test("retention counts distinct users per (cohort day, offset)") {
    // user 7 first seen Jan 1, active again Jan 3; user 8 only Jan 3
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 09:00:00"), 7L),
      (4L, java.sql.Timestamp.valueOf("2024-01-03 09:30:00"), 8L))
      .toDF("event_id", "ts", "user_id")
    val act = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val r = act.join(first, Seq("user_id"))
      .select(col("cohort_day").cast("string").as("c"),
        datediff(col("day"), col("cohort_day")).cast("long").as("o"))
      .groupBy("c", "o").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-03", 0L, 1L)))
  }

  test("sessionize splits on gaps > 30min") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 7L, "a", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "a", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventStreams.sessionize(df)
      .select("user_id", "session_seq", "n_events", "value_sum")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(r.length == 2)
    assert(r(0)._3 == 2 && math.abs(r(0)._4 - 3.0) < 1e-9)
    assert(r(1)._3 == 1 && math.abs(r(1)._4 - 3.0) < 1e-9)
  }

  test("SaltedJoin equals the naive join under planted skew, any salt") {
    // one hot key with 500 rows, a cold tail; build side 3 keys
    val probe = ((1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("c1", 900L), ("c2", 901L))).toDF("k", "seq")
    val build = Seq(("hot", 10), ("c1", 20), ("nomatch", 30)).toDF("k", "v")
    val naive = probe.join(build, "k")
    for (salt <- Seq(1, 4, 13)) {
      val salted = graft.operators.SaltedJoin.equiJoin(
        probe, build, Seq("k"), salt = salt, saltCols = Seq("seq"))
      assert(salted.count() == naive.count())
      assert(salted.exceptAll(naive).isEmpty && naive.exceptAll(salted).isEmpty)
    }
  }

  test("RangeJoin.pointInInterval equals the naive range predicate") {
    import graft.operators.RangeJoin
    // points at bin boundaries, interval edges, and far outside; intervals
    // narrower than / spanning / aligned to the bin width, overlapping,
    // plus an empty (hi == lo) and an inverted one (dropped)
    val points = Seq(1L -> 0.0, 2L -> 7.999, 3L -> 8.0, 4L -> 15.5,
      5L -> 16.0, 6L -> 23.0, 7L -> 24.0, 8L -> 100.0, 9L -> -3.0)
      .toDF("pid", "v")
    val ivals = Seq((10L, 0L, 8L), (11L, 7L, 9L), (12L, 8L, 8L),
      (13L, 20L, 10L), (14L, -8L, 25L), (15L, 15L, 16L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", ivals, "lo", "hi", binWidth = 8L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(ivals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains(1L -> 10L) && !want.contains(3L -> 10L)) // hi exclusive
    assert(want.contains(9L -> 14L)) // negative values bin correctly
    assert(!want.exists(_._2 == 12L) && !want.exists(_._2 == 13L)) // empty + inverted
  }

  test("kmvDistinct: exact below k, estimator within 20% above k, mergeable") {
    import graft.text.Curation
    val Mod = graft.functions.PolyHash31.Mod
    // stratum a: 3 distinct hashes (< k) -> estimate is exact;
    // stratum b: 5000 distinct LCG hashes (> k) -> KMV estimator, expected
    // relative error ~1/sqrt(k) ~ 12.5% at k=64
    val rows =
      Seq("a" -> 11L, "a" -> 22L, "a" -> 33L, "a" -> 22L) ++
        (0 until 5000).map(i => "b" -> ((1103515245L * i + 12345L) % Mod))
    val r = Curation.kmvDistinct(rows.toDF("lang", "h"), k = 64)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("a")._1 == 3 && r("a")._3 == 3.0)
    assert(r("b")._1 == 64)
    assert(math.abs(r("b")._3 - 5000.0) / 5000.0 < 0.2)
    // merged row: min-64 of the union; 'a' hashes 11/22/33 are tiny so they
    // displace the 3 largest of b's sketch, and the estimate stays close
    assert(r("(all)")._1 == 64)
    assert(math.abs(r("(all)")._3 - 5003.0) / 5003.0 < 0.2)
    // estimator formula is exactly (k-1)*Mod/kth for the over-k stratum
    // (half-up rounding at scale 9, matching FastRound on positive input)
    assert(r("b")._3 ==
      math.floor(63.0 * Mod / r("b")._2.toDouble * 1e9 + 0.5) / 1e9)
  }

  test("repetitionStats: hand-computed gram fractions, short-doc zeros") {
    import graft.text.Curation
    val df = docs(
      // tokens: a a a b -> top token 3/4; bigrams (a a)x2 (a b) -> 2/3;
      // trigrams (a a a) (a a b) unique -> dup 0
      (1L, "a A a b"),
      // x y x y x y: top token 3/6; bigrams (x y)x3 (y x)x2 -> 3/5;
      // trigrams (x y x)x2 (y x y)x2 -> dup 4/4
      (2L, "x y x y x y"),
      // two tokens: no trigrams -> 0.0; one bigram -> 1.0
      (3L, "p q"))
    val r = Curation.repetitionStats(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((4L, 3.0 / 4, 2.0 / 3, 0.0)))
    assert(r(2L) == ((6L, 3.0 / 6, 3.0 / 5, 1.0)))
    assert(r(3L) == ((2L, 1.0 / 2, 1.0, 0.0)))
  }

  test("redactPii counts and replaces emails/urls, emails first") {
    import graft.text.Curation
    val df = docs(
      (1L, "mail bob.smith@corp.example.org and https://a.example.com/x_1 now"),
      (2L, "http://plain.example.com/p twice http://plain.example.com/q"),
      (3L, "no pii here"))
    val r = Curation.redactPii(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((1L, 1L, "mail <EMAIL> and <URL> now")))
    assert(r(2L) == ((0L, 2L, "<URL> twice <URL>")))
    assert(r(3L) == ((0L, 0L, "no pii here")))
  }

  test("survivors keeps the highest-score doc per cluster, id tiebreak") {
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val sc = Seq((1L, 4), (2L, 7), (3L, 7), (5L, 2), (6L, 2), (9L, 0))
      .toDF("doc_id", "n_tokens")
    val r = Dedup.survivors(cl, sc).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getInt(2)))).toMap
    assert(r == Map(
      1L -> ((2L, 7)),  // 2 and 3 tie on 7; smaller id wins
      5L -> ((5L, 2)),  // tie again -> 5
      9L -> ((9L, 0)))) // singleton survives itself
  }

  test("clusterSplit: whole cluster shares one split, hash decides it") {
    import graft.text.Curation
    // two clusters (reps 1 and 4) plus a singleton (7)
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (7L, 7L))
      .toDF("doc_id", "cluster_rep")
    val r = Curation.clusterSplit(cl).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    // all members of a cluster get the representative's split
    assert(r(1L)._2 == r(2L)._2 && r(2L)._2 == r(3L)._2)
    assert(r(4L)._2 == r(5L)._2)
    // expected buckets: (rep*2654435761) % 1000000007 % 100
    def bucket(rep: Long) = (rep * 2654435761L) % 1000000007L % 100L
    def split(rep: Long) = { val b = bucket(rep)
      if (b < 80) "train" else if (b < 90) "val" else "test" }
    Seq(1L, 4L, 7L).foreach(rep => assert(r(rep)._2 == split(rep)))
    // degenerate ratios: trainPct=0, valPct=100 -> never "train"
    val all = Curation.clusterSplit(cl, trainPct = 0, valPct = 100)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(all == Set("val"))
  }

  test("chunkDedup keeps first global occurrence, reassembles in order") {
    import graft.text.Curation
    val df = docs(
      (1L, "a b c d e f"),   // chunks (w=2): "a b","c d","e f"
      (2L, "c d x y"),       // "c d" seen in doc 1 -> drops; "x y" kept
      (3L, "a b c d"),       // both chunks seen -> doc drops entirely
      (4L, "e f e f g"))     // "e f" dup of doc1; second "e f" dup; tail "g" kept
    val r = Curation.chunkDedup(df, w = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r(1L) == ((3L, "a b c d e f")))
    assert(r(2L) == ((1L, "x y")))
    assert(!r.contains(3L))
    assert(r(4L) == ((1L, "g")))
  }

  test("removeBoilerplate drops EVERY copy of cross-doc chunks, keeps in-doc repeats") {
    import graft.text.Curation
    val df = docs(
      (1L, "a b c d e f"),   // "a b" shared with doc 3 -> dropped everywhere
      (2L, "x y x y"),       // "x y" repeats WITHIN one doc: df=1, both kept
      (3L, "a b q r"),       // loses "a b", keeps "q r"
      (4L, "a b"))           // only chunk is boilerplate -> doc drops entirely
    val r = Curation.removeBoilerplate(df, w = 2, maxDf = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r(1L) == ((2L, "c d e f")))
    assert(r(2L) == ((2L, "x y x y")))
    assert(r(3L) == ((1L, "q r")))
    assert(!r.contains(4L))
    // raising maxDf re-admits the shared chunk
    val loose = Curation.removeBoilerplate(df, w = 2, maxDf = 3).collect()
    assert(loose.length == 4)
  }

  test("goldenRecord elects per-cluster attribute modes with smallest-value ties") {
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_rep")
    val recs = Seq(
      (1L, "en", "web"), (2L, "en", "books"), (3L, "de", "books"),
      (4L, "fr", "news"))
      .toDF("doc_id", "lang", "source")
    val g = Dedup.goldenRecord(clustered, recs, Seq("lang", "source"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    // cluster 1: lang en (2 vs 1), source tie web/books 1-2? books wins 2-1
    assert(g(1L) == ((3L, "en", "books")))
    assert(g(4L) == ((1L, "fr", "news")))
    // tie case: two values with equal counts -> smallest value wins
    val tie = Dedup.goldenRecord(
      Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_rep"),
      Seq((1L, "b"), (2L, "a")).toDF("doc_id", "lang"), Seq("lang"))
      .collect().head
    assert(tie.getString(2) == "a")
  }

  test("quantizeInt8: extremes hit ±127, zeros stay zero, checksums exact") {
    import graft.similarity.Similarity
    val df = Seq(
      (1L, Array(2.0f, -4.0f, 0.0f, 1.0f)),   // scale 127/4: q = 64,-127,0,32
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))    // all-zero: scale 0, q all 0
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(df, dim = 4).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getLong(2), x.getLong(3)))).toMap
    // q(2.0) = round(2 * 31.75) = round(63.5) = 64 (half away from zero)
    val expHash = Seq(64L, -127L, 0L, 32L)
      .foldLeft(0L)((acc, v) => (acc * 31 + (v + 128)) % graft.functions.PolyHash31.Mod)
    assert(r(1L)._1 == math.floor(127.0 / 4 * 1e9 + 0.5) / 1e9)
    assert(r(1L)._2 == 64L - 127L + 0L + 32L)
    assert(r(1L)._3 == expHash)
    val zeroHash = (1 to 4).foldLeft(0L)((acc, _) => (acc * 31 + 128) % graft.functions.PolyHash31.Mod)
    assert(r(2L) == ((0.0, 0L, zeroHash)))
  }

  test("kmeans separates planted groups and is partition-independent") {
    import graft.similarity.KMeans
    // init = two lowest ids, one per planted group
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.95f)),
      (5L, Array(0.8f, 0.05f)), (6L, Array(0.05f, 0.9f)))
    val df = vecs.toDF("vec_id", "embedding")
    val r = KMeans.kmeans(df, k = 2, iters = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 3L, 5L).map(r).toSet.size == 1)
    assert(Seq(2L, 4L, 6L).map(r).toSet.size == 1)
    assert(r(1L) != r(2L))
    // fixed-point centroid sums: identical output on any partitioning
    val a = KMeans.kmeans(df, k = 2, iters = 2).collect().toSet
    val b = KMeans.kmeans(df.repartition(7), k = 2, iters = 2).collect().toSet
    assert(a == b)
  }

  test("ivfTopKWith kmeans centroids: full probe equals brute force") {
    import graft.similarity.KMeans
    val vecs = (1L to 20L).map(i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat / 11f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = KMeans.centroids(df, k = 3, iters = 2)
      .select(col("cluster").as("cid"), col("centroid"))
    val q = df.filter(col("vec_id") <= 3)
    // probing every list degrades IVF to exact search
    val ivf = Similarity.ivfTopKWith(df, q, cents, k = 4, nProbe = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    val brute = Similarity.bruteForceTopK(df, q, k = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    assert(ivf == brute)
  }

  test("tfidfTopK ranks distinctive terms above ubiquitous ones") {
    import graft.text.Curation
    val df = docs(
      (1L, "the zebra the the"), (2L, "the cat"), (3L, "the dog"))
    val r = Curation.tfidfTopK(df, k = 2)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(4)))
    // "the" appears in every doc -> idf ln(4/4)=0 -> score 0; distinctive
    // tokens (df=1, idf ln(2)) outrank it everywhere
    val byDoc = r.groupBy(_._1)
    assert(byDoc(1L).find(_._4 == 1L).get._2 == "zebra")
    assert(byDoc(1L).find(_._2 == "zebra").get._3 == 1L) // tf
    assert(byDoc(2L).find(_._4 == 1L).get._2 == "cat")
    assert(r.forall(_._4 <= 2L))
  }

  test("lmSurprisal: uniform corpus scores 0, rare tokens score high") {
    import graft.text.Curation
    val uni = docs((1L, "a a a"), (2L, "a a"))
    val r0 = Curation.lmSurprisal(uni).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r0(1L) == 0.0 && r0(2L) == 0.0) // p(a)=1 -> -ln(1)=0
    val mix = docs((1L, "a a a a"), (2L, "a a a rare"))
    val r1 = Curation.lmSurprisal(mix).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r1(2L) > r1(1L) && r1(1L) > 0.0)
  }

  test("epochMix replicates whole epochs and hash-selects the remainder") {
    import graft.text.Curation
    val df = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
      .toDF("doc_id", "lang")
    val r = Curation.epochMix(df, Map("en" -> 250), defaultWeight = 50)
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    val copies = r.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    def extra(id: Long, frac: Long): Long =
      if (((id * 2654435761L) % 1000000007L) % 100L < frac) 1L else 0L
    for (id <- Seq(1L, 2L)) // en: 2.5 epochs -> 2 or 3 copies
      assert(copies(id) == (1L to (2L + extra(id, 50))).toSeq)
    for (id <- Seq(3L, 4L)) // default: 0.5 epochs -> 0 or 1 copy
      assert(copies.getOrElse(id, Seq.empty[Long]) == (1L to extra(id, 50)).toSeq)
  }

  test("sessionWindowAgg: native session windows, touching windows fuse") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def plus(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (7L, t0, 1.0), (7L, plus(30), 2.0), (7L, plus(61), 4.0))
      .toDF("user_id", "ts", "value")
    val r = EventStreams.sessionWindowAgg(ev)
      .collect().map(x => (x.getTimestamp(1), x.getTimestamp(2), x.getLong(3), x.getDouble(4))).toSet
    // an event EXACTLY gap after the previous one fuses (touching windows
    // merge); +61 exceeds the 30-minute gap strictly -> new session;
    // session_end = last event + gap
    assert(r == Set(
      (t0, plus(60), 2L, 3.0),
      (plus(61), plus(91), 1L, 4.0)))
    // boundary rule matches the lag-based sessionize (splits only on
    // strictly greater gaps): same two sessions
    assert(EventStreams.sessionize(
      ev.withColumn("event_id", col("user_id"))).count() == 2)
  }

  test("semDedup drops same-cluster smaller-id duplicates, keeps the rest") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),  // near-dup of 1, same cluster
      (3L, Array(0.9f, 0.4f, 0.0f, 0.0f)),    // cluster 0, cos ~0.914 to 1
      (10L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f, 0.001f))) // near-dup of 10
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 0.0, 1.0, 0.0))).toDF("cluster", "centroid")
    val r = Similarity.semDedup(e, cents, tau = 0.99)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r == Map(
      1L -> ((0L, true)), 2L -> ((0L, false)), 3L -> ((0L, true)),
      10L -> ((1L, true)), 11L -> ((1L, false))))
  }

  test("semDedup's quadratic cluster bound is observable") {
    // largest cluster has 3 members -> max pair volume 3; the metric
    // fires on the internal snapshot write, so read it via the Recorder
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.4f, 0.0f, 0.0f)),
      (10L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f, 0.001f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 0.0, 1.0, 0.0))).toDF("cluster", "centroid")
    val rec = new graft.util.CapMetrics.Recorder
    spark.listenerManager.register(rec)
    try {
      Similarity.semDedup(e, cents, tau = 0.99).collect()
      assert(rec.await("semdedup_max_cluster_pairs").contains((3L, 5L)))
    } finally spark.listenerManager.unregister(rec)
  }

  test("bm25 ranks by the exact Robertson formula, absent terms score nothing") {
    import graft.text.Curation
    val df = docs((1L, "spark spark table"), (2L, "merge table"),
      (3L, "table table table table"))
    val r = Curation.bm25(df, Seq("spark", "merge"), topK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    // N=3, avgdl=3; df(spark)=df(merge)=1 -> idf = ln(2.5/1.5 + 1)
    val idf = math.log(2.5 / 1.5 + 1.0)
    val s1 = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    val s2 = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 2.0 / 3.0))
    assert(r.map(x => (x._1, x._2)).toSeq == Seq((1L, 1L), (2L, 2L)))
    assert(math.abs(r(0)._3 - s1) < 1e-8 && math.abs(r(1)._3 - s2) < 1e-8)
  }

  test("winnowLocate emits every (pos1, pos2) anchor of a surviving pair's shared hashes") {
    val fps = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 200L, 3L),
      (2L, 100L, 7L), (3L, 200L, 4L)).toDF("doc_id", "gram_hash", "pos")
    val pairs = Seq((1L, 2L)).toDF("d1", "d2")
    val r = TextAnalysis.winnowLocate(fps, pairs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    // hash 100 appears at positions 5 and 9 in doc 1, position 7 in doc 2:
    // both anchors emit; hash 200 is not shared by the pair (doc 3 is not
    // in any surviving pair) -> nothing else
    assert(r == Set((1L, 2L, 100L, 5L, 7L), (1L, 2L, 100L, 9L, 7L)))
  }

  test("noveltyScore: first-occurrence fraction by doc_id order") {
    import graft.text.Curation
    val df = docs((1L, "a b c d"), (2L, "a b c x"), (3L, "a"))
    val r = Curation.noveltyScore(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // doc 1: shingles {a b c, b c d}, both first here -> 1.0
    // doc 2: {a b c} first in 1, {b c x} first here -> 0.5
    // doc 3: < 3 tokens -> no shingles, no row
    assert(r == Map(1L -> ((2L, 2L, 1.0)), 2L -> ((2L, 1L, 0.5))))
  }

  test("zscoreStreaming equals the batch z-score (trained-threshold scoring)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.zscoreStreaming(spark, dir)
    val batch = EventStreams.zscoreBatch(EventStreams.loadEvents(spark, dir))
    assert(streamed.count() > 0 && streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("chunkOverlap: stride windows share w-stride tokens, short tail kept") {
    import graft.text.Curation
    val df = docs((1L, "a b c d e f g"), (2L, ""))
    val r = Curation.chunkOverlap(df, w = 3, stride = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
      .sortBy(t => (t._1, t._2))
    // starts 0,2,4,6: last two windows run past the end and shorten
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 3L, "a b c"), (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 3L, "e f g"), (1L, 3L, 6L, 1L, "g")))
    // stride == w degenerates to disjoint chunking, every token once
    val disjoint = Curation.chunkOverlap(docs((1L, "a b c d e")), w = 2, stride = 2)
      .agg(sum("n_toks")).head.getLong(0)
    assert(disjoint == 5L)
    intercept[IllegalArgumentException] {
      Curation.chunkOverlap(df, w = 2, stride = 3)
    }
  }

  test("qualityGate keeps exactly the docs at/above their language's exact p25") {
    import graft.text.Curation
    val df = Seq(
      (1L, "the cat is in the hat and it is good", "en"),
      (2L, "!!!! ???? ;;;; ::::", "en"),
      (3L, "a plain sentence of some words to read", "en"),
      (4L, "der hund ist gut und die katze auch", "de"),
      (5L, "x", "de"))
      .toDF("doc_id", "text", "lang")
    val kept = Curation.qualityGate(df, p = 0.25).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // recompute the gate independently: exact interpolated p25 per lang
    val scored = df.select(col("lang"), col("doc_id"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def p25(xs: Seq[Double]): Double = {
      val s = xs.sorted; val idx = 0.25 * (s.size - 1)
      val lo = s(idx.toInt); val hi = s(math.ceil(idx).toInt)
      val v = lo + (idx - idx.toInt) * (hi - lo)
      math.copySign(math.floor(math.abs(v * 1e9) + 0.5), v) / 1e9
    }
    val th = scored.groupBy(_._1).map { case (l, g) => l -> p25(g.map(_._3).toSeq) }
    val expect = scored.filter { case (l, _, q) => q >= th(l) }
      .map { case (l, id, q) => id -> (q, th(l)) }.toMap
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < 5) // the gate actually drops something
  }

  test("dupSpans: cross-doc span, within-doc repeat merging adjacent windows") {
    val df = docs(
      (1L, "a b c d e f g h i j k l"),            // window pos0 = a..j shared
      (2L, "x a b c d e f g h i j z"),            // window pos1 = a..j shared
      (3L, "p q r s t u v w y z p q r s t u v w y z"), // pos0 == pos10
      (4L, "one two three"))                      // < 10 tokens: no windows
    val got = graft.text.Curation.dupSpans(df, L = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 0L, 10L, 10L, 1L),
      (2L, 1L, 11L, 10L, 1L),
      // positions 0 and 10 both marked, gap 10 <= L: ONE merged span
      (3L, 0L, 20L, 20L, 2L)))
  }

  test("dupSpans: distinct islands when marked windows are > L apart") {
    // 40 tokens; "m1..m10" repeats at pos 0 and pos 25 in doc 1 and also
    // appears in doc 2, the fillers are all unique -> two islands in doc 1
    val rep = (1 to 10).map("m" + _).mkString(" ")
    val fill1 = (1 to 15).map("f" + _).mkString(" ")
    val fill2 = (1 to 5).map("g" + _).mkString(" ")
    val df = docs((1L, s"$rep $fill1 $rep $fill2"), (2L, rep))
    val got = graft.text.Curation.dupSpans(df, L = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    assert(got == Set((1L, 0L, 10L, 1L), (1L, 25L, 35L, 1L), (2L, 0L, 10L, 1L)))
  }

  test("bigramSurprisal: hand-computed add-one NLLs") {
    val df = docs((1L, "a b a b"), (2L, "a b c"))
    // unigrams a:3 b:3 c:1, V=3; bigrams (a,b):3 (b,a):1 (b,c):1
    val got = graft.text.Curation.bigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ab = -math.log(4.0 / 6.0); val ba = -math.log(2.0 / 6.0)
    val bc = -math.log(2.0 / 6.0) // c(b,c)=1 -> (1+1)/(3+3)
    def fx(x: Double) = math.floor(x * 1e9 + 0.5) // the 1e-9 fixed point
    def avg(xs: Seq[Double]) =
      math.floor(xs.map(fx).sum / 1e9 / xs.size * 1e9 + 0.5) / 1e9
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - avg(Seq(ab, ba, ab))) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - avg(Seq(ab, bc))) < 1e-12)
  }

  test("contaminatedSpans marks exactly the benchmark-overlapping spans") {
    val corpus = docs(
      (1L, "a b c d e f g h i j k l"),  // pos0 window = benchmark doc
      (2L, "totally novel words nine ten eleven twelve thirteen fourteen fifteen sixteen"))
    val bench = docs((100L, "a b c d e f g h i j"))
    val got = graft.text.Curation.contaminatedSpans(corpus, bench, L = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 10L)))
  }

  test("dsirWeights: target-like docs rank higher, per-token additivity") {
    val target = docs((100L, "aurora aurora aurora aurora"),
      (101L, "aurora borealis aurora"))
    val cand = docs((1L, "aurora aurora"), (2L, "zzz zzz"), (3L, "aurora zzz"))
    val w = graft.text.Curation.dsirWeights(cand, target, buckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(1L)._1 == 2L && w(3L)._1 == 2L)
    // all-target tokens > mixed > no-target tokens
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2, s"ordering: $w")
    // the score is a per-token sum: mixed doc = half of each pure doc
    assert(math.abs(2 * w(3L)._2 - (w(1L)._2 + w(2L)._2)) < 1e-9, s"additivity: $w")
  }

  test("dsirSelect: exactly k survivors, keys reproduce the hash-Gumbel draw") {
    val target = docs((100L, "aurora aurora"))
    val cand = docs((1 to 30).map(i =>
      i.toLong -> (if (i % 3 == 0) "aurora aurora" else "zzz yyy xxx")): _*)
    val sel = graft.text.Curation.dsirSelect(cand, target, buckets = 256, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(sel.length == 5)
    val mod = graft.functions.PolyHash31.Mod
    sel.foreach { case (id, w, key9) =>
      val u = (graft.functions.PolyHash31.hash(s"dsir:$id") + 1L).toDouble / (mod + 1L).toDouble
      val expect = BigDecimal(w - math.log(-math.log(u)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(key9 - expect) < 1e-9, s"doc $id key $key9 vs $expect")
    }
  }

  test("substrDupSpans: char-level spans, canonical first copy survives") {
    val df = docs(
      (1L, "abcdefghijKLMNO"),    // "abcdefghij" at pos 0 — the canonical copy
      (2L, "xxabcdefghijyy"),     // same substring mid-"word" at pos 2
      (3L, "012345678901234567890123456789"), // d*3: pos 10..20 all repeat
      (4L, "short"),              // < L chars: no windows
      (5L, "abcdefghijzz"))       // third copy of the shared substring
    val got = graft.text.Curation.substrDupSpans(df, L = 10)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rows == Set(
      // doc 1 keeps the canonical copy: NO span there
      (2L, 2L, 12L, 10L, 1L),     // arbitrary-boundary duplicate marked
      // consecutive repeated positions 10..20 merge into one span
      (3L, 10L, 30L, 20L, 11L),
      (5L, 0L, 10L, 10L, 1L)))
    // drop metrics observable: 13 non-canonical positions out of the 24
    // occurrences of repeated windows (3 copies of "abcdefghij" + doc 3's
    // 21 self-repeating windows; unique windows never reach the join)
    assert(graft.util.CapMetrics.lastDrops(got, "substr_dedup_marks")
      .contains((13L, 24L)))
  }

  test("substrDedupApply cuts duplicate spans, keeps exactly one copy") {
    val df = docs(
      (1L, "abcdefghijKLMNO"),
      (2L, "xxabcdefghijyy"),
      (3L, "012345678901234567890123456789"),
      (4L, "short"),
      (5L, "abcdefghijzz"))
    val got = graft.text.Curation.substrDedupApply(df, L = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 0L, "abcdefghijKLMNO"),  // canonical copy untouched
      (2L, 10L, "xxyy"),            // mid-word duplicate cut
      (3L, 20L, "0123456789"),      // self-repeat collapsed to one period
      (4L, 0L, "short"),            // too short for windows: unchanged
      (5L, 10L, "zz")))
  }

  test("dupSpansRemove keeps the globally first copy of each span text") {
    val df = docs(
      (1L, "a b c d e f g h i j k l"),       // span [0,10) — the keeper
      (2L, "x a b c d e f g h i j z"),       // same text at [1,11) — removed
      (3L, "p q r s t u v w y z p q r s t u v w y z"), // merged 20-token span:
      (4L, "one two three"))                 //   distinct text, its own keeper
    val got = graft.text.Curation.dupSpansRemove(df, L = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((12L, "a b c d e f g h i j k l")))
    assert(got(2L) == ((2L, "x z")))
    assert(got(3L)._1 == 20L) // unique merged-span text keeps itself whole
    assert(got(4L) == ((3L, "one two three")))
  }

  test("keyframes: frame 0 always kept, identical frames collapse to it") {
    val threeSame = "ab" * 128 * 3 // three identical 256-byte frames
    val short = "tiny clip"        // single ragged frame
    val df = docs((1L, threeSame), (2L, short))
    val mm = Multimodal.asMultimodal(df)
    val got = Multimodal.keyframes(mm, chunkBytes = 256, threshold = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 0L)))
  }

  test("keyframes keeps exactly the frames whose signature jumps >= threshold") {
    val text = ("x" * 256) + ("y" * 256) + ("z" * 128)
    val df = docs((1L, text))
    val mm = Multimodal.asMultimodal(df)
    // independent expectation from the raw signatures
    val sigs = Multimodal.chunkPayload(mm, 256)
      .select(col("chunk_idx"),
        (graft.functions.PolyHash31(decode(col("chunk"), "UTF-8")) % 1000L).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    val expect = sigs.indices.filter(i => i == 0 || math.abs(sigs(i) - sigs(i - 1)) >= 200L)
      .map(i => (1L, i.toLong)).toSet
    val got = Multimodal.keyframes(mm, chunkBytes = 256, threshold = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.contains((1L, 0L)))
  }

  test("removal audit: total, stage vocabulary, and gate-order invariants") {
    val d = "/root/testdata/sf0.001"
    val audit = graft.queries.TrainQueries.all("txt_removal_audit")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    // exactly one verdict per document (the joins must not drop or dup)
    assert(audit.size.toLong == nDocs)
    val allowed = Set("benchmark", "exact_dup", "near_dup", "contaminated",
      "lang", "quality", "kept")
    assert(audit.values.forall(allowed))
    // the holdout gate fires first: every 50th doc is 'benchmark' and no
    // benchmark doc leaks into any later stage
    audit.foreach { case (id, st) =>
      if (id % 50 == 0) assert(st == "benchmark", s"doc $id -> $st")
      else assert(st != "benchmark", s"doc $id -> $st")
    }
    // 'kept' docs survive every individual gate, re-checked independently
    val kept = audit.collect { case (id, "kept") => id }.toSet
    val ana = graft.text.TextAnalysis.analyze(
        spark.read.parquet(s"$d/documents.parquet"), "text")
      .select("doc_id", "lang_id", "quality")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    kept.foreach { id =>
      assert(ana(id)._1 == "en" && ana(id)._2 >= 0.5, s"kept doc $id fails a gate")
    }
  }

  test("Bucketed.table memoizes the layout and reuses the catalog table") {
    val d = "/root/testdata/sf0.001"
    val t1 = graft.sources.Bucketed.table(spark, d, "orders", "o_orderkey")
    val n = t1.count()
    assert(n == spark.read.parquet(s"$d/orders.parquet").count())
    // second call returns the registered table without rewriting
    val t2 = graft.sources.Bucketed.table(spark, d, "orders", "o_orderkey")
    assert(t2.count() == n)
    val tables = spark.catalog.listTables().collect().map(_.name)
    assert(tables.exists(_.startsWith("graft_orders_b")), tables.mkString(","))
  }
}
