package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** The WAV codec's parsing claims, exercised directly: canonical
 * round-trip, chunk-list walking (LIST/fact chunks before data,
 * odd-length padding), and malformed-payload rejection. */
class MultimodalWavSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def feats(payload: Array[Byte], id: Long = 1L) =
    Multimodal.decodeWav(id, payload)

  test("encode/decode round-trip recovers rate, count, checksum, energy") {
    val samples = Array[Short](100, -200, 300, -400, 500)
    val r = feats(Multimodal.encodeWav(16000, samples))
    assert(r.getInt(1) == 16000)
    assert(r.getLong(2) == 5L)
    // checksum = sum (i+1)*v over 1-based positions
    assert(r.getLong(3) == (1 * 100 - 2 * 200 + 3 * 300 - 4 * 400 + 5 * 500).toLong)
    val sumSq = samples.map(v => v.toLong * v).sum
    assert(r.getDouble(4) == math.floor(sumSq.toDouble / 5 * 1e6 + 0.5) / 1e6)
  }

  test("decoder walks unknown chunks (LIST before data, odd length padded)") {
    val base = Multimodal.encodeWav(8000, Array[Short](7, -7, 13))
    // splice a 5-byte (odd -> padded to 6) LIST chunk between fmt and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix the RIFF size field (bytes 4..7, LE)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val r = feats(spliced)
    assert(r.getLong(2) == 3L && r.getInt(1) == 8000)
    assert(r.getLong(3) == (1 * 7 - 2 * 7 + 3 * 13).toLong)
  }

  test("decoder rejects non-RIFF, stereo, and truncated payloads") {
    intercept[IllegalArgumentException](feats("not a wav at all".getBytes))
    val stereo = Multimodal.encodeWav(8000, Array[Short](1, 2))
    stereo(22) = 2 // channels field
    intercept[IllegalArgumentException](feats(stereo))
    val trunc = Multimodal.encodeWav(8000, Array[Short](1, 2, 3)).dropRight(2)
    intercept[IllegalArgumentException](feats(trunc))
  }

  test("dHash: monotone gradients saturate / clear the fingerprint") {
    // 9x8 grey ramp: grid sampling is the identity, luminance == the
    // channel value (299+587+114 = 1000), so a strictly decreasing ramp
    // sets every cur>next bit and an increasing one sets none
    def ramp(desc: Boolean): Array[Byte] = {
      val rgb = Array.tabulate(9 * 8 * 3) { i =>
        val x = (i / 3) % 9
        (if (desc) 240 - 20 * x else 20 * x).toByte
      }
      Multimodal.encodePpm(9, 8, rgb)
    }
    assert(Multimodal.decodePpmDhash(1L, ramp(desc = true)).getLong(1) == -1L)
    assert(Multimodal.decodePpmDhash(2L, ramp(desc = false)).getLong(1) == 0L)
  }

  test("dHash: planted perturbed twins stay close; banded pairs recover every one") {
    val hams = (0L until 500L).map { id =>
      val a = Multimodal.decodePpmDhash(id,
        Multimodal.ppmDhashFixture(id)).getLong(1)
      val b = Multimodal.decodePpmDhash(id,
        Multimodal.ppmDhashFixture(id, perturb = true)).getLong(1)
      java.lang.Long.bitCount(a ^ b)
    }
    // measured: the +1-every-9th-byte twin flips 0-2 gradient bits; 6 is
    // the operator's verify radius, so any drift past it is a real break
    assert(hams.max <= 6, s"twin hamming drifted to ${hams.max}")
    val rows = (0L until 50L).flatMap(id => Seq(
      (id, Multimodal.decodePpmDhash(id,
        Multimodal.ppmDhashFixture(id)).getLong(1)),
      (id + 1000L, Multimodal.decodePpmDhash(id,
        Multimodal.ppmDhashFixture(id, perturb = true)).getLong(1))))
    val pairs = Multimodal.dhashNearDupPairs(
        rows.toDF("doc_id", "dhash"), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 50L).foreach(id =>
      assert(pairs.contains((id, id + 1000L)), s"planted twin $id missed"))
  }

  test("audio fingerprint: monotone envelopes saturate / clear the bits") {
    // n = 130 -> envelope point f samples position 2f; a strictly
    // decreasing |amplitude| ramp sets every louder-than-next bit, an
    // increasing one sets none
    val desc = Multimodal.encodeWav(8000,
      Array.tabulate(130)(i => (2000 - 15 * i).toShort))
    assert(Multimodal.decodeWavAfp(1L, desc).getLong(1) == -1L)
    val asc = Multimodal.encodeWav(8000,
      Array.tabulate(130)(i => (15 * i).toShort))
    assert(Multimodal.decodeWavAfp(2L, asc).getLong(1) == 0L)
  }

  test("audio fingerprint: planted noise twins stay close; banded pairs recover them") {
    val hams = (0L until 500L).map { id =>
      val a = Multimodal.decodeWavAfp(id, Multimodal.wavFpFixture(id)).getLong(1)
      val b = Multimodal.decodeWavAfp(id,
        Multimodal.wavFpFixture(id, perturb = true)).getLong(1)
      java.lang.Long.bitCount(a ^ b)
    }
    // measured: the +1500-every-5th-sample twin flips 0-5 envelope bits
    assert(hams.max <= 6, s"twin hamming drifted to ${hams.max}")
    val rows = (0L until 50L).flatMap(id => Seq(
      (id, Multimodal.decodeWavAfp(id, Multimodal.wavFpFixture(id)).getLong(1)),
      (id + 1000L, Multimodal.decodeWavAfp(id,
        Multimodal.wavFpFixture(id, perturb = true)).getLong(1))))
    val pairs = Multimodal.afpNearDupPairs(
        rows.toDF("doc_id", "afp"), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a >3-bit twin can legitimately miss all four bands (pigeonhole);
    // measured: 49 of these 50 recover
    val hit = (0L until 50L).count(id => pairs.contains((id, id + 1000L)))
    assert(hit >= 48, s"only $hit/50 planted twins recovered")
  }

  test("jlProject is deterministic and pipeline-compatible") {
    val e = Seq(
      (1L, Array.tabulate(64)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(64)(i => (64 - i).toFloat))).toDF("vec_id", "embedding")
    val p = graft.similarity.Similarity.jlProject(e, outDim = 16)
    assert(p.columns.toSeq == Seq("vec_id", "embedding"))
    val a = p.orderBy("vec_id").as[(Long, Seq[Double])].collect()
    val b = graft.similarity.Similarity.jlProject(e, outDim = 16)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._2.length == 16))
    // distinct inputs stay distinct under the projection
    assert(a(0)._2 != a(1)._2)
  }
}
