package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline.
  *
  * The reference engine is text-only (`/root/reference/repo_to_vector.py`
  * ingests UTF-8 source files and skips binary, `repo_to_vector.py:241-244`);
  * a 100 TB training corpus is not. This module adds the Spark-side
  * plumbing for opaque media payloads: a typed schema (binary payload +
  * metadata struct), batched per-partition transforms with the same batch
  * shape a vectorized (Arrow) UDF would see, and deterministic stand-ins
  * for the codec step — the actual image/audio decoders are NOT available
  * in this offline container, so `decodeStub` is a clearly-marked
  * deterministic fake with the real interface; swap [[MediaCodec]] for a
  * JNI/javacv-backed implementation in production.
  *
  * Scale posture:
  *  - payloads stay in executor space end-to-end (no collect); transforms
  *    are `mapPartitions` over columnar-read parquet binary;
  *  - metadata (kind/width/height/...) is a separate small struct column,
  *    so metadata-only queries prune the payload at the parquet scan
  *    (column pruning — never read the bytes to count them);
  *  - partition sizing: payload rows are wide, so callers should set
  *    `spark.sql.files.maxPartitionBytes` down (or repartition by
  *    byte-size) so one task's batch fits executor memory.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),        // image|audio|video
    StructField("format", StringType, nullable = true),       // png|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true), // audio
    StructField("n_frames", IntegerType, nullable = true)))   // video

  /** Full media-table schema: id, provenance, payload, metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MetaSchema, nullable = false)))

  /** Codec interface — the seam where a real decoder plugs in. Decode
    * turns payload bytes into a row-major float pixel/sample buffer.
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], meta: Row): Array[Float]
  }

  /** STUB codec (offline container has no image/audio libraries).
    * Deterministic fake: each payload byte maps to a float in [0,1)
    * (unsigned byte / 256). Interface, batch shape, and partitioning are
    * the production-real parts; only this byte→sample map is fake.
    */
  object DecodeStub extends MediaCodec {
    def decode(payload: Array[Byte], meta: Row): Array[Float] = {
      val out = new Array[Float](payload.length)
      var i = 0
      while (i < payload.length) {
        out(i) = (payload(i) & 0xff) / 256.0f
        i += 1
      }
      out
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("samples", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Decode payloads partition-by-partition. The iterator-in/iterator-out
    * shape is the JVM analog of a vectorized Python `mapInPandas` UDF:
    * rows stream through in executor-sized batches, nothing materializes
    * per-partition beyond the current row's buffers.
    *
    * Expects columns (media_id, payload, meta); emits
    * (media_id, kind, n_samples, samples).
    */
  def decode(media: DataFrame, codec: MediaCodec = DecodeStub): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // bad rows degrade (zero samples, null kind), never NPE the scan
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val meta = r.getStruct(2)
          val samples = codec.decode(payload, meta)
          val kind = if (meta == null) null else meta.getString(0)
          Row(id, kind, samples.length, samples)
        }
      }(enc)
  }

  /** Nearest-neighbor resize of a decoded image to w×h. Pure per-row
    * compute (no shuffle); index math mirrors a standard NN resampler.
    */
  def resize(decoded: DataFrame, srcW: Int, srcH: Int,
             dstW: Int, dstH: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("samples", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = Encoders.row(schema)
    decoded.select(col("media_id"), col("samples"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val src = r.getSeq[Float](1)
          val out = new Array[Float](dstW * dstH)
          var y = 0
          while (y < dstH) {
            val sy = y * srcH / dstH
            var x = 0
            while (x < dstW) {
              val sx = x * srcW / dstW
              val idx = sy * srcW + sx
              out(y * dstW + x) = if (idx < src.length) src(idx) else 0.0f
              x += 1
            }
            y += 1
          }
          Row(id, out)
        }
      }(enc)
  }

  /** Sample every `stride`-th frame of a "video" payload: the payload is
    * treated as n_frames contiguous frames of frameBytes each; emits one
    * row per kept frame (1→N generator, like the text chunker).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int,
                   stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    require(frameBytes > 0, s"frameBytes must be > 0, got $frameBytes")
    require(stride > 0, s"stride must be > 0, got $stride")
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          // bad rows degrade (no frames), never NPE the scan
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(id, f, java.util.Arrays.copyOfRange(
              payload, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }(enc)
  }

  /** Framed audio energy: treat the payload as signed 8-bit PCM and emit
    * per-frame RMS amplitude (normalized to [0,1]) — the
    * silence-detection / audio-quality signal, and the audio analog of
    * [[sampleFrames]]'s 1→N shape. A real codec decodes compressed audio
    * to PCM upstream at the [[MediaCodec]] seam; the framing/RMS math
    * here is the production-real part.
    */
  def pcmFrameRms(media: DataFrame, frameSamples: Int,
                  idCol: String = "media_id",
                  payloadCol: String = "payload"): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be > 0, got $frameSamples")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val enc = Encoders.row(schema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Iterator.empty
          else {
            val nFrames = payload.length / frameSamples
            (0 until nFrames).iterator.map { f =>
              var ss = 0.0
              var i = f * frameSamples
              val end = i + frameSamples
              while (i < end) {
                val s = payload(i) / 128.0 // signed 8-bit → [-1, 1)
                ss += s * s
                i += 1
              }
              Row(id, f, math.sqrt(ss / frameSamples))
            }
          }
        }
      }(enc)
  }

  /** Per-payload content features — byte count, Shannon entropy
    * (bits/byte; the classic compressibility / junk-media filter signal),
    * mean byte value, and distinct byte count — in ONE JVM pass per
    * payload via mapPartitions. A histogram per row is O(n) with a
    * 256-slot scratch array here; the pure-expression phrasing would be
    * O(256·n) per row, so the imperative loop is the scale-correct choice
    * (this is genuine per-partition imperative logic).
    *
    * Expects (media_id, payload); emits
    * (media_id, n_bytes, entropy, mean_byte, n_distinct_bytes).
    */
  /** Deterministic byte-bucket embedding: `buckets`-dim vector where
    * component b counts payload bytes ≡ b (mod buckets) — a codec-free
    * media fingerprint that makes cross-modal retrieval (media ⋈ cosine
    * top-k, q70) oracle-replayable from the raw bytes. A real pipeline
    * swaps this for a model embedding behind the same (id, embedding)
    * contract; the Spark shape (one JVM pass per payload, mapPartitions,
    * no shuffle) is identical either way.
    */
  def byteBucketEmbedding(media: DataFrame, buckets: Int = 64,
                          idCol: String = "media_id",
                          payloadCol: String = "payload"): DataFrame = {
    require(buckets > 0 && buckets <= 256, s"need 0 < buckets <= 256, got $buckets")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val enc = Encoders.row(schema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val v = new Array[Double](buckets)
          var i = 0
          while (i < payload.length) {
            v((payload(i) & 0xff) % buckets) += 1.0; i += 1
          }
          Row(id, v.toSeq)
        }
      }(enc)
  }

  def payloadFeatures(media: DataFrame,
                      idCol: String = "media_id",
                      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("entropy", DoubleType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("n_distinct_bytes", IntegerType, nullable = false)))
    val enc = Encoders.row(schema)
    val log2 = math.log(2.0)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        val hist = new Array[Long](256) // reused scratch, zeroed per row
        rows.map { r =>
          val id = r.getLong(0)
          // null payload → same zero-feature row as an empty payload
          // (F5-style tolerance: bad rows degrade, never NPE the scan)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          java.util.Arrays.fill(hist, 0L)
          var sum = 0L
          var i = 0
          while (i < payload.length) {
            val b = payload(i) & 0xff
            hist(b) += 1
            sum += b
            i += 1
          }
          val n = payload.length.toDouble
          var entropy = 0.0
          var distinct = 0
          var j = 0
          while (j < 256) {
            if (hist(j) > 0) {
              distinct += 1
              val p = hist(j) / n
              entropy -= p * math.log(p) / log2
            }
            j += 1
          }
          // unrounded: presentation rounding belongs to the query so the
          // oracle can apply the identical HALF_UP round() on both sides
          val mean = if (payload.length == 0) 0.0 else sum / n
          Row(id, payload.length, entropy, mean, distinct)
        }
      }(enc)
  }

  /** Perceptual-hash-style signature of a binary payload: bucket the byte
    * histogram into `buckets` bins and set bit i iff bin i holds MORE than
    * its equal share of the bytes (buckets·hist[i] > n — the exact-integer
    * form of hist[i] > mean, the same above-the-median thresholding real
    * pHash applies to DCT coefficients). Payloads with similar byte
    * distributions — re-encodes, crops, metadata-edited copies under the
    * stub codec's stand-in — land at small Hamming distance. One
    * mapPartitions pass; no floats anywhere.
    */
  def byteSignHash(media: DataFrame, buckets: Int = 32,
                   idCol: String = "media_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(buckets > 0 && buckets <= 63,
      s"need 0 < buckets <= 63 (signature packs into one long), got $buckets")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        val hist = new Array[Long](buckets)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          java.util.Arrays.fill(hist, 0L)
          var i = 0
          while (i < payload.length) {
            hist((payload(i) & 0xff) % buckets) += 1; i += 1
          }
          val n = payload.length.toLong
          var sig = 0L
          var b = 0
          while (b < buckets) {
            if (buckets * hist(b) > n) sig |= (1L << b)
            b += 1
          }
          Row(id, sig)
        }
      }(enc)
  }

  /** Near-duplicate media via banded Hamming join over [[byteSignHash]]
    * signatures — the multimodal twin of the SimHash text path (q15/q55).
    *
    * Identical payload byte distributions share a signature, so the join runs
    * between SIGNATURE GROUPS, not media rows: exact copies collapse
    * before any pairing (the q97 clone-guard discipline), and each
    * surviving pair reports both groups' representative ids and sizes.
    * Splitting the `buckets`-bit signature into `bands` equal slices
    * guarantees recall for Hamming distance ≤ bands−1 by pigeonhole —
    * with the defaults (32 bits, 4 bands, maxHamming 3) recall is exact.
    *
    * Scale posture: one shuffle on sig (group collapse, map-side
    * combined), then the band self-join runs over distinct signatures
    * only — a set that grows with content diversity, not corpus size
    * (the 100× stress replica adds zero new signatures). Verification is
    * a codegen `bit_count(xor)` on two longs.
    */
  def mediaNearDupGroups(media: DataFrame, maxHamming: Int = 3,
                         bands: Int = 4, buckets: Int = 32): DataFrame = {
    require(bands > 0 && buckets % bands == 0,
      s"bands must divide buckets, got $bands/$buckets")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val width = buckets / bands
    val mask = (1L << width) - 1
    // localCheckpoint: both sides of the band self-join consume this
    // (signature-group) table — without the cut the whole payload scan +
    // signature pass runs twice (the q112 double-compute lesson); the
    // table itself is distinct-signature-sized, tiny next to the corpus
    val grp = byteSignHash(media, buckets)
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("n_media"))
      .localCheckpoint()
    val banded = grp.select(col("sig"), col("rep"), col("n_media"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "band_val")))
    val x = banded.select(col("band"), col("band_val"),
      col("sig").as("sig_a"), col("rep").as("rep_a"), col("n_media").as("n_a"))
    val y = banded.select(col("band"), col("band_val"),
      col("sig").as("sig_b"), col("rep").as("rep_b"), col("n_media").as("n_b"))
    x.join(y, Seq("band", "band_val"))
      .filter(col("sig_a") < col("sig_b"))
      .select("sig_a", "sig_b", "rep_a", "rep_b", "n_a", "n_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("rep_a", "rep_b", "n_a", "n_b", "hamming")
  }

  /** Scene-cut detection over framed payload bytes: per consecutive
    * FULL-frame pair, the mean absolute byte difference (0..255 scale);
    * a cut is flagged where the difference exceeds `threshold`. This is
    * the shot-boundary primitive every video curation pipeline runs
    * before frame sampling (sample once per SCENE, not once per N
    * frames, or the dataset over-represents static shots) — under the
    * stub codec the "frames" are raw payload strides, but framing,
    * differencing, thresholding, and the Spark shape (one JVM pass per
    * payload via mapPartitions, no shuffle; a real decoder plugs in at
    * the [[MediaCodec]] seam upstream) are the production-real parts.
    * Trailing partial frames are dropped (mean-diff over unequal
    * lengths is undefined); payloads under 2 full frames emit nothing.
    *
    * Emits (media_id, frame_index, diff, is_cut) — frame_index is the
    * LATER frame of the pair (1-based over full frames).
    */
  def sceneCuts(media: DataFrame, frameBytes: Int = 32,
                threshold: Double = 24.0,
                idCol: String = "media_id",
                payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be > 0, got $frameBytes")
    require(threshold >= 0.0, s"threshold must be >= 0, got $threshold")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("diff", DoubleType, nullable = false),
      StructField("is_cut", BooleanType, nullable = false)))
    val enc = Encoders.row(schema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val nFrames = payload.length / frameBytes
          (1 until nFrames).iterator.map { f =>
            var s = 0L
            var i = 0
            while (i < frameBytes) {
              val a = payload((f - 1) * frameBytes + i) & 0xff
              val b = payload(f * frameBytes + i) & 0xff
              s += math.abs(a - b)
              i += 1
            }
            val d = s.toDouble / frameBytes
            Row(id, f, d, d > threshold)
          }
        }
      }(enc)
  }

  /** Magic-byte format sniffing — classify a payload by its leading byte
    * signature (the public file-magic numbers: JPEG `FF D8 FF`, PNG
    * `89 50 4E 47`, RIFF containers resolved by the subtype tag at
    * offset 8, ISO-BMFF/`mp4` by the `ftyp` box tag at offset 4, ...).
    * At crawl scale the declared content-type is attacker- or
    * misconfiguration-controlled metadata; the bytes are not. This is the
    * trust-but-verify gate a 100 TB multimodal ingest runs BEFORE routing
    * payloads to format-specific decoders (a mislabeled payload fed to
    * the wrong codec is at best a decode error, at worst a CVE).
    *
    * Pure `Column` expression over `hex(substring(payload, 1, 12))` — one
    * codegen'd projection, no UDF, oracle-replayable byte-for-byte (both
    * Spark and DuckDB emit uppercase hex). Only the first 12 bytes of
    * each payload are inspected; the whole column is still read from
    * parquet (cell-level pruning does not exist), so the scan is
    * byte-volume-bound but strictly map-only: no shuffle, no state.
    */
  def sniffFormat(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      sniffFormatExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(payload)))

  /** Catalyst-tree form of [[sniffFormat]] — the single source of the
    * sniff rules, built from expression nodes directly so the SQL
    * surface (`GraftExtensions` registers `sniff_format`) can inject it
    * without a Column round-trip (a Column built over an already-
    * analyzed SQL expression stays an unevaluable wrapper node).
    */
  def sniffFormatExpr(payload: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val h = Upper(Hex(Substring(payload, Literal(1), Literal(12))))
    def sw(prefix: String) = StartsWith(h, Literal(prefix))
    def tag(pos: Int, hexTag: String) =
      EqualTo(Substring(h, Literal(pos), Literal(8)), Literal(hexTag))
    CaseWhen(Seq[(Expression, Expression)](
      sw("FFD8FF") -> Literal("jpeg"),
      sw("89504E47") -> Literal("png"),
      sw("474946") -> Literal("gif"),
      sw("504B") -> Literal("zip"),
      sw("1F8B") -> Literal("gzip"),
      sw("494433") -> Literal("mp3"),
      sw("4F676753") -> Literal("ogg"),
      sw("664C6143") -> Literal("flac"),
      // RIFF containers: kind lives in the subtype tag at byte offset 8
      And(sw("52494646"), tag(17, "57415645")) -> Literal("wav"),
      And(sw("52494646"), tag(17, "57454250")) -> Literal("webp"),
      sw("52494646") -> Literal("riff"),
      // ISO base media (mp4/mov family): 'ftyp' box tag at byte offset 4
      tag(9, "66747970") -> Literal("mp4"),
      sw("424D") -> Literal("bmp")),
      Some(Literal("unknown")))
  }
}
