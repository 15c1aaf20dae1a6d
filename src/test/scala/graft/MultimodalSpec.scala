package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, batched decode, resize, frame sampling,
  * payload features. The decode *content* is the documented stub (offline
  * container, SURVEY.md context); everything else — schema, partitioning,
  * iterator batch shape, 1→N frame generator — is production-real and
  * asserted here.
  */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def mediaDf(rows: Seq[(Long, Array[Byte], String, Int, Int)]) = {
    val data = rows.map { case (id, payload, kind, w, h) =>
      Row(id, Option.empty[Long].orNull, payload,
        Row(kind, "raw", w, h, null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), Multimodal.MediaSchema)
  }

  test("decode stub: deterministic byte→[0,1) float map, schema + count") {
    val payload = Array[Byte](0, 64, -128, -1) // unsigned: 0,64,128,255
    val out = Multimodal.decode(mediaDf(Seq((1L, payload, "image", 2, 2))))
    val r = out.collect().head
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "n_samples", "samples"))
    assert(r.getAs[Int]("n_samples") == 4)
    val s = r.getSeq[Float](r.fieldIndex("samples"))
    assert(s == Seq(0.0f, 0.25f, 0.5f, 255 / 256.0f))
  }

  test("resize: nearest-neighbor 4x4 → 2x2 picks the expected pixels") {
    // 4x4 image with value = row*4+col, as bytes
    val payload = (0 until 16).map(_.toByte).toArray
    val decoded = Multimodal.decode(mediaDf(Seq((7L, payload, "image", 4, 4))))
    val out = Multimodal.resize(decoded, srcW = 4, srcH = 4, dstW = 2, dstH = 2)
    val s = out.collect().head.getSeq[Float](1)
    // NN with floor mapping: dst(0,0)=src(0,0)=0, dst(0,1)=src(0,2)=2,
    // dst(1,0)=src(2,0)=8, dst(1,1)=src(2,2)=10 — each /256
    assert(s == Seq(0 / 256.0f, 2 / 256.0f, 8 / 256.0f, 10 / 256.0f))
  }

  test("sampleFrames: 1→N generator, stride sampling, frame bytes exact") {
    val payload = (0 until 12).map(_.toByte).toArray // 4 frames of 3 bytes
    val out = Multimodal.sampleFrames(
      mediaDf(Seq((3L, payload, "video", 1, 3))), frameBytes = 3, stride = 2)
    val rows = out.orderBy("frame_index").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(rows(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 1, 2))
    assert(rows(1).getAs[Array[Byte]](2).toSeq == Seq[Byte](6, 7, 8))
  }

  test("payloadFeatures: entropy/mean/distinct over known distributions") {
    val uniform = Array.tabulate(256)(_.toByte) // all bytes once → H = 8
    val constant = Array.fill(100)(7.toByte)    // one value → H = 0
    val out = Multimodal.payloadFeatures(
      mediaDf(Seq((1L, uniform, "image", 16, 16),
                  (2L, constant, "audio", 0, 0))))
      .collect().map(r => r.getLong(0) -> r).toMap
    val u = out(1L)
    assert(u.getAs[Int]("n_bytes") == 256)
    assert(math.abs(u.getAs[Double]("entropy") - 8.0) < 1e-9)
    assert(math.abs(u.getAs[Double]("mean_byte") - 127.5) < 1e-9)
    assert(u.getAs[Int]("n_distinct_bytes") == 256)
    val c = out(2L)
    assert(c.getAs[Double]("entropy") == 0.0)
    assert(c.getAs[Double]("mean_byte") == 7.0)
    assert(c.getAs[Int]("n_distinct_bytes") == 1)
  }

  test("pcmFrameRms: silence → 0, full-scale square wave → known RMS") {
    val silence = Array.fill(8)(0.toByte)
    val square = Array.fill(8)(-128.toByte) // |s| = 1.0 each sample
    val out = Multimodal.pcmFrameRms(
      mediaDf(Seq((1L, silence, "audio", 0, 0), (2L, square, "audio", 0, 0))),
      frameSamples = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 4) // 2 payloads × 2 frames
    out.filter(_._1 == 1L).foreach { case (_, _, rms) => assert(rms == 0.0) }
    out.filter(_._1 == 2L).foreach { case (_, _, rms) =>
      assert(math.abs(rms - 1.0) < 1e-12) }
  }

  test("decode runs distributed across partitions (no driver collect)") {
    val many = (0L until 64L).map(i =>
      (i, Array.fill(8)((i % 127).toByte), "image", 2, 4))
    val out = Multimodal.decode(mediaDf(many))
    assert(out.rdd.getNumPartitions > 1)
    assert(out.count() == 64)
  }

  test("byteBucketEmbedding counts bytes mod buckets; bad rows degrade") {
    // bytes 0x41('A')=65 → bucket 1 (mod 64); 0x01 → bucket 1; 0xFF=255 → 63
    val payload = Array[Byte](0x41, 0x01, -1) // -1 = 0xFF unsigned
    val out = Multimodal.byteBucketEmbedding(
        mediaDf(Seq((7L, payload, "image", 1, 3))), buckets = 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(out.length == 1)
    val (id, v) = out.head
    assert(id == 7L && v.length == 64)
    assert(v(1) == 2.0 && v(63) == 1.0 && v.sum == 3.0)
    intercept[IllegalArgumentException](
      Multimodal.byteBucketEmbedding(mediaDf(Seq.empty), buckets = 0))
  }

  test("byteSignHash: bit i set iff bucket i exceeds its equal share") {
    val rows = Seq(
      (1L, Array[Byte](0, 0, 0), "image", 1, 1),      // all bucket 0 -> sig 1
      (2L, Array.emptyByteArray, "image", 1, 1),      // empty -> sig 0
      (3L, (0 until 32).map(_.toByte).toArray, "image", 1, 1), // uniform -> 0
      (4L, Array[Byte](0, 0, 1), "image", 1, 1))      // buckets 0,1 -> sig 3
    val got = Multimodal.byteSignHash(mediaDf(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 3L), got.toString)
  }

  test("mediaNearDupGroups: clones collapse, banded Hamming pairs found") {
    // group A (ids 1,2,3): bytes [0,0,1] -> sig 3 (bits 0,1)
    // group B (id 10):     bytes [0,0,2] -> sig 5 (bits 0,2), xor ham 2
    // group C (id 20):     bytes [10,10,11] -> bits 10,11, ham 4 from both
    val rows = Seq(
      (1L, Array[Byte](0, 0, 1), "image", 1, 1),
      (2L, Array[Byte](0, 0, 1), "image", 1, 1),
      (3L, Array[Byte](0, 0, 1), "image", 1, 1),
      (10L, Array[Byte](0, 0, 2), "image", 1, 1),
      (20L, Array[Byte](10, 10, 11), "image", 1, 1))
    val got = Multimodal.mediaNearDupGroups(mediaDf(rows), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 10L, 3L, 1L, 2L)), got.toSeq.toString)
    intercept[IllegalArgumentException](
      Multimodal.mediaNearDupGroups(mediaDf(rows), maxHamming = 4, bands = 4))
  }

  test("sceneCuts: hand diffs, threshold, partial frame dropped, tiny empty") {
    // 4-byte frames: [0×4][0×4][100×4][100,104,100,104] + 2 trailing
    // bytes (dropped): pair diffs 0, 100, 2
    val payload = (Array.fill(4)(0) ++ Array.fill(4)(0) ++
      Array.fill(4)(100) ++ Array(100, 104, 100, 104) ++ Array(9, 9))
      .map(_.toByte)
    val got = Multimodal.sceneCuts(
        mediaDf(Seq((5L, payload, "video", 1, 1))), frameBytes = 4,
        threshold = 50.0)
      .orderBy("frame_index")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1, 0.0, false), (2, 100.0, true), (3, 2.0, false)),
      got.toSeq.toString)
    // payloads under 2 full frames emit nothing
    val tiny = Multimodal.sceneCuts(
      mediaDf(Seq((6L, Array[Byte](1, 2, 3, 4, 5), "video", 1, 1))),
      frameBytes = 4)
    assert(tiny.count() == 0)
    intercept[IllegalArgumentException](
      Multimodal.sceneCuts(mediaDf(Seq.empty), frameBytes = 0))
  }

  test("sniffFormat: magic prefixes, RIFF subtypes, ftyp offset, corruption") {
    import org.apache.spark.sql.functions.col
    def b(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val cases: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, b("FFD8FFE0") ++ "rest".getBytes, "jpeg"),
      (2L, b("89504E47") ++ "rest".getBytes, "png"),
      (3L, b("47494638"), "gif"),
      (4L, b("504B0304"), "zip"),
      (5L, b("1F8B0800"), "gzip"),
      (6L, b("49443303"), "mp3"),
      (7L, "OggSxxxx".getBytes("ISO-8859-1"), "ogg"),
      (8L, "fLaCxxxx".getBytes("ISO-8859-1"), "flac"),
      (9L, "RIFF".getBytes ++ b("00000000") ++ "WAVE".getBytes, "wav"),
      (10L, "RIFF".getBytes ++ b("00000000") ++ "WEBP".getBytes, "webp"),
      (11L, "RIFF".getBytes ++ b("00000000") ++ "AVI ".getBytes, "riff"),
      (12L, b("00000018") ++ "ftypisom".getBytes, "mp4"),
      (13L, b("424D") ++ "xx".getBytes, "bmp"),
      // corruption: one leading NUL defeats every anchored rule
      (14L, b("00") ++ b("FFD8FFE0"), "unknown"),
      (15L, "just some text".getBytes, "unknown"),
      (16L, Array.emptyByteArray, "unknown"))
    val df = mediaDf(cases.map { case (id, p, _) => (id, p, "image", 1, 1) })
      .select(col("media_id"),
        Multimodal.sniffFormat(col("payload")).as("sniffed"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"media $id: got ${got(id)}, want $want")
    }
  }
}
