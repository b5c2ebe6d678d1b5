package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions (north-star extension): media travel as
  * opaque `BinaryType` payloads with typed metadata alongside — exactly how
  * the reference treats every column (opaque Arrow buffers, duck.go:217) but
  * with the pipeline plumbing made first-class.
  *
  * Decode support is split by what a pure JVM can genuinely do:
  *   - COMPRESSED formats (JPEG/MP3/H.264) need codec libraries this
  *     container doesn't have — `decodeFeatures` stays a documented,
  *     deterministic STUB wrapped in real plumbing.
  *   - RAW container formats are decoded for REAL: `decodeWavPcm16` is a
  *     compliant RIFF chunk-walk PCM16 parser and `decodePpmP6` a binary
  *     PPM reader — header validation, unknown-chunk skipping, exact
  *     integer features (gated query `ns48_wav_decode` hash-checks the
  *     parser against an oracle that recomputes features from first
  *     principles).
  * All metadata extraction is codegen'd column expressions (no decode
  * needed).
  */
object Multimodal {

  /** Media payload schema: (bytes, mime, meta). */
  val payloadType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a string column as a binary media payload (the zero-codec
    * stand-in for reading real image/audio bytes).
    */
  def withPayload(df: DataFrame, srcCol: String, mime: String = "text/plain"): DataFrame =
    df.withColumn(
      "media",
      struct(
        encode(col(srcCol), "UTF-8").as("bytes"),
        lit(mime).as("mime"),
        octet_length(encode(col(srcCol), "UTF-8")).cast("long").as("n_bytes")))

  /** Byte-level metadata without decoding: size, magic (first 4 bytes, hex),
    * first/last byte values. Pure column expressions — scan-local.
    */
  def extractMeta(df: DataFrame, payload: String = "media"): DataFrame = {
    val bytes = col(s"$payload.bytes")
    // hex() already emits uppercase digits (both Spark and DuckDB) — no
    // upper() needed. That also matters operationally: Spark 4's first
    // upper()/lower() call initializes the ICU collation tables (~1.2 s
    // one-time), which made this scan-local query look 6 s slow when it
    // happened to run before any other casing query.
    df.withColumn("meta_n_bytes", octet_length(bytes).cast("long"))
      .withColumn("meta_magic", hex(substring(bytes, 1, 4)))
      .withColumn(
        "meta_first_byte",
        conv(hex(substring(bytes, 1, 1)), 16, 10).cast("long"))
  }

  /** Number of fixed-stride "frames" in the payload (the frame-sampling
    * plan shape; a video decoder would replace byte-slicing with real frame
    * extraction at the same points).
    */
  def frameCount(df: DataFrame, stride: Int, payload: String = "media"): DataFrame =
    df.withColumn(
      "n_frames",
      ceil(octet_length(col(s"$payload.bytes")).cast("double") / lit(stride.toDouble)).cast("long"))

  /** Fixed-stride frame sampling: an array of byte-slice "frames" (what a
    * video decoder would replace with real frame extraction at the same
    * offsets). Pure codegen'd expression — `transform` over the stride
    * sequence with binary `substring` — so sampling is scan-local.
    */
  def sampleFrames(df: DataFrame, stride: Int, maxFrames: Int, payload: String = "media"): DataFrame = {
    val bytes = col(s"$payload.bytes")
    val nFrames = least(
      ceil(octet_length(bytes).cast("double") / lit(stride.toDouble)).cast("int"),
      lit(maxFrames))
    df.withColumn(
      "frames",
      when(octet_length(bytes) > 0,
        transform(
          sequence(lit(0), nFrames - 1),
          i => substring(bytes, i * stride + lit(1), lit(stride))))
        .otherwise(array().cast("array<binary>")))
  }

  /** Decoded feature record produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int)

  /** Executor-side decode via mapPartitions — the real plumbing a codec
    * plugs into: one partition in, one iterator of decoded features out,
    * no shuffle introduced, batch-at-a-time memory profile.
    *
    * STUB: `decodeFrame` fakes decode deterministically from the bytes
    * (checksum + pretend-dimensions). Formats with a real in-repo decoder
    * use their genuine paths instead: [[wavFeatures]] (RIFF/WAVE PCM16),
    * [[decodePpmP6]] (binary PPM), and [[imageFeatures]] (PNG/JPEG/BMP/GIF
    * through the JDK's built-in javax.imageio readers). The stub remains
    * only for formats with no JDK codec (MP3, H.264, WebP).
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String, payload: String = "media")
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(s"$payload.bytes").as("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeFrame(id, bytes)
        }
      }
  }

  /** The deterministic fake decoder (library-free stand-in). */
  private def decodeFrame(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      checksum = sum,
      width = (sum % 640).toInt,
      height = (sum % 480).toInt)
  }

  // ------------------------------------------------------------------------
  // REAL codec-free decoders: RIFF/WAVE PCM and binary PPM are raw formats
  // a pure-JVM parser decodes completely. (Compressed images are ALSO real
  // — via the JDK's built-in ImageIO readers, further below; only formats
  // with no JDK codec at all stay stubbed.)
  // ------------------------------------------------------------------------

  /** Integer-only audio features decoded from a PCM16 WAV payload —
    * exact values (no float accumulation), so results are engine- and
    * partitioning-independent.
    */
  final case class WavFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_channels: Long,
      bits: Long,
      n_samples: Long,
      peak: Long,
      energy: Long)

  /** Encode a standard 44-byte-header RIFF/WAVE PCM16 file: `data` is the
    * little-endian int16 sample stream (odd trailing byte dropped).
    */
  private[graft] def encodeWavPcm16(
      data: Array[Byte],
      sampleRate: Int,
      channels: Int): Array[Byte] = {
    val n = data.length - (data.length % 2)
    val out = java.nio.ByteBuffer
      .allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort) // block align
    out.putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(n)
    out.put(data, 0, n)
    out.array()
  }

  /** Real RIFF chunk-walk parser: validates the RIFF/WAVE container, reads
    * the `fmt ` chunk (format tag must be 1 = PCM, 16-bit), and decodes the
    * `data` chunk as little-endian int16 samples. Unknown chunks are
    * skipped (with the RIFF odd-size pad byte), like any compliant reader.
    */
  private[graft] def decodeWavPcm16(id: Long, bytes: Array[Byte]): WavFeatures = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    require(bytes.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      s"doc $id: not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = 0L
    var channels = 0L
    var bits = 0L
    var nSamples = 0L
    var peak = 0L
    var energy = 0L
    var sawFmt = false
    var sawData = false
    while (off + 8 <= bytes.length) {
      val chunkId = ascii(off, 4)
      val size = buf.getInt(off + 4)
      // Long arithmetic: a hostile size field near Int.MaxValue must fail
      // this bound, not wrap negative and bypass it.
      require(size >= 0 && off.toLong + 8L + size.toLong <= bytes.length.toLong,
        s"doc $id: truncated '$chunkId' chunk")
      chunkId match {
        case "fmt " =>
          require(size >= 16, s"doc $id: short fmt chunk")
          val fmtTag = buf.getShort(off + 8) & 0xffff
          require(fmtTag == 1, s"doc $id: not PCM (fmt tag $fmtTag)")
          channels = (buf.getShort(off + 10) & 0xffff).toLong
          sampleRate = (buf.getInt(off + 12) & 0xffffffffL)
          bits = (buf.getShort(off + 22) & 0xffff).toLong
          require(bits == 16, s"doc $id: only PCM16 supported, got $bits-bit")
          sawFmt = true
        case "data" =>
          require(sawFmt, s"doc $id: data chunk before fmt")
          require(!sawData, s"doc $id: multiple data chunks")
          nSamples = (size / 2).toLong
          var p = off + 8
          val end = off + 8 + (size - size % 2)
          while (p < end) {
            val s = buf.getShort(p).toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s * s
            p += 2
          }
          sawData = true
        case _ => () // skip unknown chunk
      }
      off += 8 + size + (size % 2) // RIFF pads odd chunks
    }
    require(sawFmt && sawData, s"doc $id: missing fmt/data chunk")
    WavFeatures(id, sampleRate, channels, bits, nSamples, peak, energy)
  }

  /** Encode-then-decode through REAL WAV bytes: builds a PCM16 RIFF file
    * from each row's payload bytes, then runs the chunk-walk parser on the
    * produced file. Partition-preserving mapPartitions — encode and decode
    * happen executor-side on the same pass, no shuffle.
    */
  def wavFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      sampleRate: Int = 16000): Dataset[WavFeatures] = {
    import spark.implicits._
    // per-row encode+decode is CPU-bound beyond its input bytes: spread
    // a narrow scan first or every file decodes in one task. fanout: the
    // PCM16 round trip is two memcpy-class passes over the payload —
    // light (~16×); at toy scale the gate correctly skips the exchange.
    Par.spread(df.select(col(idCol).cast("long"), col(bytesCol)), fanout = 16)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        decodeWavPcm16(id, encodeWavPcm16(data, sampleRate, channels = 1))
      })
  }

  // ------------------------------------------------------ G.711 mu-law

  /** G.711 mu-law ENCODE of one PCM16 sample (CCITT software tables —
    * the 0x84-bias, 32635-clip variant every codec ships, including the
    * JDK's; pinned byte-for-byte against `javax.sound` in OpsSpec).
    */
  private[graft] def ulawEncode(s: Int): Int = {
    val sign = if (s < 0) 0x80 else 0
    val x = math.min(math.abs(s), 32635) + 132
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** G.711 mu-law DECODE of one encoded byte back to PCM16 (the exact
    * inverse table the JDK codec applies — max magnitude 32124).
    */
  private[graft] def ulawDecode(b: Int): Int = {
    val u = ~b & 0xff
    val x = ((((u & 0x0f) << 3) + 132) << ((u >> 4) & 7)) - 132
    if ((u & 0x80) != 0) -x else x
  }

  /** Encode a RIFF/WAVE file holding G.711 mu-law data (format tag 7,
    * 8 bits per sample — the COMPRESSED telephony WAV variant).
    */
  private[graft] def encodeWavUlaw(
      data: Array[Byte],
      sampleRate: Int,
      channels: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer
      .allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(7) // G.711 mu-law
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels) // byte rate: 1 byte per sample
    out.putShort(channels.toShort) // block align
    out.putShort(8) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(data.length)
    out.put(data)
    out.array()
  }

  /** Features of a mu-law COMPRESSED audio payload after a REAL codec
    * round-trip. */
  final case class UlawFeatures(
      doc_id: Long,
      n_samples: Long,
      peak: Long,
      energy: Long)

  /** Compressed-audio decode through a REAL JDK codec (closing C13's
    * "no compressed audio" gap without adding a dependency): each row's
    * PCM16 payload is G.711 mu-law-compressed executor-side, wrapped in
    * a format-tag-7 WAV container, and decoded back to linear PCM16 by
    * `javax.sound.sampled.AudioSystem`'s built-in ULAW codec — not by
    * this file's own formula. Features (exact integer peak/energy) are
    * computed over the DECODED samples, so the gate hash-checks the
    * codec's actual output against the oracle's replay of the published
    * G.711 quantization arithmetic.
    *
    * Partition-preserving mapPartitions (the documented codec-work
    * exception): encode, container build, and codec decode all happen
    * executor-side in one pass — no shuffle, no driver bytes.
    */
  def ulawFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      sampleRate: Int = 8000): Dataset[UlawFeatures] = {
    import spark.implicits._
    // The javax.sound entry points (`AudioSystem.getAudioInputStream`,
    // both overloads) resolve their SPI providers through the JDK's
    // GLOBALLY SYNCHRONIZED registry on EVERY call — 32 threads
    // contending on that lock measured 50x the per-row cost (ns208
    // 1.18s -> 2.53s when Par.spread; 65.9 thread-seconds of
    // MapPartitions for 5000 rows), and the round-13 10x screen
    // confirmed the dual: at 10x data AQE keeps more post-scan
    // partitions, so the lock convoy turned 10x rows into a 16x
    // wall-clock flag. Fix the lock, not the parallelism: resolve the
    // WAV reader and the ULAW->PCM converter ONCE PER PARTITION via the
    // public ServiceLoader SPI (the same providers the registry would
    // pick — the 256-byte OpsSpec table pins decode equality) and call
    // the providers directly per row. AudioSystem remains the fallback
    // when a JDK ships no matching provider.
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}
        import scala.jdk.CollectionConverters._
        // JDK providers FIRST: ServiceLoader order follows the executor
        // classpath, so a third-party audio SPI (mp3spi, tritonus) could
        // otherwise win the first-match find and decode G.711 with
        // different arithmetic than the OpsSpec-pinned JDK table —
        // silently changing features vs the oracle on clusters that ship
        // extra codecs. The pinned decode-equality table stays
        // authoritative regardless of classpath.
        def jdkFirst[T](providers: List[T]): List[T] =
          providers.sortBy(p =>
            if (p.getClass.getName.startsWith("com.sun.media.sound.")) 0 else 1)
        val readers = jdkFirst(
          java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala.toList)
        val converters = jdkFirst(
          java.util.ServiceLoader.load(classOf[FormatConversionProvider]).asScala.toList)
        it.map { case (id, data) =>
          val nSamples = data.length / 2
          val enc = new Array[Byte](nSamples)
          var i = 0
          while (i < nSamples) {
            val s = (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort).toInt
            enc(i) = ulawEncode(s).toByte
            i += 1
          }
          val wav = encodeWavUlaw(enc, sampleRate, channels = 1)
          val ais = readers.iterator
            .flatMap { r =>
              try Iterator.single(
                r.getAudioInputStream(new java.io.ByteArrayInputStream(wav)))
              catch {
                case _: javax.sound.sampled.UnsupportedAudioFileException =>
                  Iterator.empty
              }
            }
            .nextOption()
            .getOrElse(javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(wav)))
          val pcmFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            ais.getFormat.getSampleRate, 16, 1, 2, ais.getFormat.getSampleRate,
            false)
          val dec = converters
            .find(_.isConversionSupported(pcmFmt, ais.getFormat))
            .map(_.getAudioInputStream(pcmFmt, ais))
            .getOrElse(javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais))
          val buf =
            try dec.readAllBytes()
            finally { dec.close(); ais.close() }
          var peak = 0L
          var energy = 0L
          var j = 0
          while (j + 1 < buf.length) {
            val s = (((buf(j + 1) << 8) | (buf(j) & 0xff)).toShort).toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s * s
            j += 2
          }
          UlawFeatures(id, (buf.length / 2).toLong, peak, energy)
        }
      }
  }

  /** Per-frame PCM16 energy row. */
  final case class FrameEnergy(
      doc_id: Long,
      frame: Long,
      n_samples: Long,
      energy: Long,
      rms: Double)

  /** Frame-wise audio energy over little-endian PCM16 payloads — the
    * primitive behind silence trimming / voice-activity gating in an
    * audio training pipeline: per `frameSize`-sample frame, the exact
    * integer sum of squared samples and its RMS. The last frame may be
    * short (its true sample count is reported); payloads with fewer than
    * 2 bytes produce no frames.
    *
    * Determinism: sample decode is bit-exact ((hi << 8) | lo, signed),
    * energy is an exact long sum in index order, and RMS is
    * sqrt(energy/n) — two correctly-rounded IEEE ops on exact integers,
    * identical across engines. Partition-preserving flatMap: byte-level
    * codec work, the documented mapPartitions exception — no shuffle,
    * frames are generated executor-side in one pass.
    */
  def pcmFrameEnergy(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      frameSize: Int): Dataset[FrameEnergy] = {
    require(frameSize > 0, "frameSize must be positive")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, data) =>
        val nSamples = data.length / 2
        val nFrames = (nSamples + frameSize - 1) / frameSize
        (0 until nFrames).iterator.map { f =>
          var i = f * frameSize
          val end = math.min(i + frameSize, nSamples)
          val n = end - i
          var energy = 0L
          while (i < end) {
            val s = (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort).toLong
            energy += s * s
            i += 1
          }
          FrameEnergy(id, f.toLong, n.toLong, energy, math.sqrt(energy.toDouble / n))
        }
      }
  }

  /** Integer-only image features decoded from a binary (P6) PPM payload. */
  final case class PpmFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      maxval: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Encode a binary PPM (P6) image from raw RGB bytes (length w*h*3). */
  private[graft] def encodePpmP6(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Real P6 parser: whitespace-delimited header (with `#` comment
    * support, per the spec), then raw RGB triples; per-channel exact
    * integer sums.
    */
  private[graft] def decodePpmP6(id: Long, bytes: Array[Byte]): PpmFeatures = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"doc $id: not a P6 PPM payload")
    var off = 2
    def nextInt(): Int = {
      while (off < bytes.length &&
        (bytes(off) == ' ' || bytes(off) == '\n' || bytes(off) == '\t' ||
          bytes(off) == '\r' || bytes(off) == '#')) {
        if (bytes(off) == '#') { while (off < bytes.length && bytes(off) != '\n') off += 1 }
        else off += 1
      }
      var v = 0
      var digits = 0
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9' && digits < 9) {
        v = v * 10 + (bytes(off) - '0'); off += 1; digits += 1
      }
      require(digits > 0, s"doc $id: malformed PPM header (expected a number)")
      v
    }
    val w = nextInt()
    val h = nextInt()
    val mx = nextInt()
    off += 1 // single whitespace after maxval, per spec
    require(w > 0 && h > 0, s"doc $id: invalid PPM dimensions ${w}x$h")
    require(mx >= 1 && mx <= 255, s"doc $id: unsupported PPM maxval $mx (8-bit only)")
    // Long arithmetic: declared dimensions near 2^16 x 2^16 must fail the
    // bound, not wrap w*h*3 around Int and pass it.
    require(off.toLong + w.toLong * h.toLong * 3L <= bytes.length.toLong,
      s"doc $id: truncated PPM raster")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = off
    val end = off + w * h * 3
    while (i < end) {
      sr += bytes(i) & 0xff
      sg += bytes(i + 1) & 0xff
      sb += bytes(i + 2) & 0xff
      i += 3
    }
    PpmFeatures(id, w.toLong, h.toLong, mx.toLong, sr, sg, sb)
  }

  // ------------------------------------------------------------------------
  // REAL compressed-image decode. The JDK SHIPS image codecs — javax.imageio
  // has built-in PNG/JPEG/BMP/GIF readers — so "no codec libraries in the
  // container" does not apply to these formats: decode is genuine, zero
  // added dependencies. Formats without a JDK reader (MP3, H.264, WebP)
  // remain behind the documented deterministic stub above.
  // ------------------------------------------------------------------------

  /** Features decoded from a compressed image payload (PNG/JPEG/BMP/GIF):
    * container format, dimensions, color components, and exact integer
    * per-channel sums of the decoded RGB raster. For the lossless formats
    * the sums are bit-exact properties of the payload; for JPEG they are
    * decoder-version-dependent (pin dims/format, not sums, across JVMs).
    */
  final case class ImageFeatures(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_components: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** ImageIO's default stream wrappers spool every image through a temp
    * FILE (FileCache{Input,Output}Stream) — but our payloads are
    * in-memory byte arrays, so the per-image disk round trip is pure
    * waste (measured 2.4× on the sf0.1 5k-image decode pass: 0.62 s →
    * 0.26 s single-thread) and contends on the tmp dir across parallel
    * tasks. JVM-global flag, flipped once per JVM on first use of any
    * codec path; memory-backed streams hold one image at a time, the
    * same bound the decode itself already has.
    */
  private lazy val imageIoInMemory: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Decode one payload with the JDK's ImageIO reader chain (format
    * sniffed from the bytes, not trusted from metadata).
    */
  private[graft] def decodeImage(id: Long, bytes: Array[Byte]): ImageFeatures = {
    imageIoInMemory
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"doc $id: no JDK image reader recognizes this payload")
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        // Bulk row transfer: one getRGB call per row into a reused buffer
        // (per-pixel getRGB pays a color-model conversion call per pixel —
        // ~2x the decode cost on large rasters).
        val row = new Array[Int](w)
        var sr = 0L
        var sg = 0L
        var sb = 0L
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(
          id, reader.getFormatName.toLowerCase, w.toLong, h.toLong,
          img.getColorModel.getNumComponents.toLong, sr, sg, sb)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Executor-side compressed-image decode — same partition-preserving
    * mapPartitions shape as [[decodeFeatures]]/[[wavFeatures]]: one
    * decoded-feature row per payload row, no shuffle, batch-at-a-time
    * memory (one BufferedImage live per row).
    */
  def imageFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String): Dataset[ImageFeatures] = {
    import spark.implicits._
    // per-row decode is CPU-bound beyond its input bytes: spread a
    // narrow scan first or every raster decodes in one task. fanout:
    // JDK ImageIO round trip measured ~0.5 s single-task over an 821 KB-
    // stats input at sf0.1 ≈ 50× scan-equivalent work per byte — below
    // the exchange-worthiness bar at toy scale (the ns67 regression:
    // round 12's ungated spread cost more than the decode it spread).
    Par.spread(df.select(col(idCol).cast("long"), col(bytesCol)), fanout = 48)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) => decodeImage(id, data) })
  }

  /** Encode-then-decode through REAL PNG bytes: each row's payload bytes
    * become a width-wide RGB raster (truncated to whole rows), deflate-
    * compressed into an actual PNG container, then decoded back through
    * the JDK reader chain. Because PNG is lossless, the decoded channel
    * sums must equal the raw raster's byte sums — which is exactly what
    * the SQL oracle recomputes from first principles, so a real
    * compressed-image decode is hash-gated end to end (`ns67`). Same
    * partition-preserving mapPartitions shape as [[wavFeatures]].
    */
  def pngFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      width: Int): Dataset[ImageFeatures] = {
    require(width > 0, "non-positive raster width")
    import spark.implicits._
    // per-row encode+decode is CPU-bound beyond its input bytes: spread
    // a narrow scan first or every raster decodes in one task. fanout:
    // deflate round trip ≈ the imageFeatures measurement (~50×) — the
    // gate skips the exchange at toy scale (the ns67 fix) and spreads
    // once the corpus carries ≥ MinWorkBytes/48 of estimated payload.
    Par.spread(df.select(col(idCol).cast("long"), col(bytesCol)), fanout = 48)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        val n = data.length - data.length % (width * 3)
        val h = n / (width * 3)
        require(h > 0, s"doc $id: payload shorter than one $width-pixel raster row")
        decodeImage(id, encodePng(java.util.Arrays.copyOf(data, n), width, h))
      })
  }

  final case class ImageAHash(doc_id: Long, ahash: Long, n_bits: Long)

  /** Perceptual average-hash over a REAL PNG round-trip: payload bytes →
    * RGB raster → JDK PNG encode → JDK decode → per-cell gray sums → one
    * bit per grid cell ("cell brighter than the image mean"). The
    * near-dup signature for image corpora (hamming distance over ahash ≈
    * visual similarity), expressed in EXACT integers end to end: gray =
    * r+g+b (no luma weights), the brightness test cross-multiplies
    * (cellSum·nCells > totalSum — no division), so the oracle replays
    * the identical hash from the raster-generation rule while the Spark
    * side proves the full compressed-image decode path (`ns123`).
    *
    * Scale shape: partition-preserving mapPartitions, one image per row,
    * no shuffle; the hash is a fixed-width long however large the image.
    */
  def pngAHash(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      width: Int,
      height: Int,
      gridW: Int,
      gridH: Int): Dataset[ImageAHash] = {
    require(width % gridW == 0 && height % gridH == 0, "grid must tile the image")
    require(gridW * gridH <= 63, "hash must fit a signed long")
    import spark.implicits._
    val (cw, ch, nCells) = (width / gridW, height / gridH, gridW * gridH)
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        val need = width * height * 3
        require(data.length >= need, s"doc $id: payload shorter than $width x $height raster")
        val png = encodePng(java.util.Arrays.copyOf(data, need), width, height)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        val cells = new Array[Long](nCells)
        var tot = 0L
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val rgb = img.getRGB(x, y)
            val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            tot += g
            cells((y / ch) * gridW + (x / cw)) += g
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var bits = 0L
        var k = 0
        while (k < nCells) {
          if (cells(k) * nCells > tot) { hash |= 1L << k; bits += 1 }
          k += 1
        }
        ImageAHash(id, hash, bits)
      })
  }

  /** PNG-encode an RGB raster with the JDK encoder (test/fixture helper —
    * PNG is lossless, so decode(encode(rgb)) recovers the exact pixels).
    */
  private[graft] def encodePng(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    imageIoInMemory
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // One bulk setRGB with a packed pixel array (per-pixel setRGB pays a
    // color-model conversion call per pixel).
    val px = new Array[Int](width * height)
    var i = 0
    var p = 0
    while (p < px.length) {
      px(p) = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
      i += 3
      p += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
