package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The heavy codecs (JPEG decode, audio resample, video frame grab) are
  * NOT available in this environment — `stubDecode` below is a
  * deterministic fake standing in for the real library call, clearly
  * marked. Two formats need no library and get REAL decoders in the same
  * mapPartitions seam: PPM (P6) images ([[parsePpm]]) and RIFF/WAVE PCM
  * audio ([[parseWav]], a full container chunk walk) — two existence
  * proofs that the stub's replace-the-body contract holds across
  * modalities. Everything around it is real and load-bearing: the schema
  * (payload BINARY + meta STRUCT), the typed Dataset boundary, the
  * mapPartitions batch shape (one decoder init per partition, streaming
  * iterator — the Scala analog of mapInPandas), and the expression-level
  * frame sampling, which all survive unchanged when the stub is replaced.
  *
  * Scale shapes: ingest and frame-sample are pure projections; decode is
  * mapPartitions (no shuffle, decoder state amortized per partition). At
  * 100 TB the payload column dominates I/O — these operators never shuffle
  * it; only extracted features (small) flow downstream.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)
  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
                           mean_byte: Double, byte_hist: Array[Long])

  /** Bronze→silver ingest: wrap a text corpus as a media table — payload
    * is the raw bytes, meta is a typed struct. (Stands in for `spark.read
    * .format("binaryFile")` + sidecar metadata at scale.) */
  def ingestFromText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        concat(lit("fake/"), col("source")).as("format"),
        (lit(32) + col("n_chars") % 64).cast("int").as("width"),
        (lit(32) + col("doc_id") % 48).cast("int").as("height"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB DECODER — deterministic fake for the missing codec libraries.
    * Real implementation would decode `payload` (e.g. javax.imageio /
    * ffmpeg) and emit pixel-level features; the fake derives the same
    * OUTPUT SHAPE from byte statistics so the pipeline is fully testable.
    * Replace the body, keep the signature. */
  private def stubDecode(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < r.payload.length) {
      val b = r.payload(i) & 0xff
      hist(b % 16) += 1
      sum += b
      i += 1
    }
    val mean = if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length
    MediaFeatures(r.media_id, r.meta.format, r.meta.n_bytes, mean, hist)
  }

  /** Batched decode: one decoder instance per partition, streaming
    * iterator in/out — the Spark-native equivalent of mapInPandas. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real codec init would happen HERE, once per partition
      iter.map(stubDecode)
    }
  }

  // ---- REAL codec: PPM (P6) ----------------------------------------------
  // One format decoded from actual bytes end-to-end — the proof the stub
  // seam's replace-the-body promise holds. P6 needs no external library:
  // ASCII header (magic, dims, maxval, '#' comments legal anywhere in the
  // header), one whitespace byte, then w·h·3 raw samples.

  case class PpmRecord(media_id: Long, payload: Array[Byte])
  case class PpmFeatures(media_id: Long, width: Int, height: Int, maxval: Int,
                         mean_r: Double, mean_g: Double, mean_b: Double)

  /** Build REAL P6 payloads in-plan from a text corpus: header plus the
    * doc's bytes tiled across w×h×3 samples (ASCII text ⇒ byte == char,
    * so an oracle can recompute the same pixels from the same text).
    * Pure projection — the payload column is born and stays executor-side. */
  def ppmFromText(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      // same byte == char contract as [[wavFromText]]: the pixel array is
      // sized in chars, read in bytes — pin ASCII-only explicitly
      .filter(octet_length(col("text")) === length(col("text")))
      .withColumn("w", (lit(4) + col("doc_id") % 4).cast("int"))
      .withColumn("h", (lit(3) + col("doc_id") % 3).cast("int"))
      .withColumn("need", (col("w") * col("h") * 3).cast("int"))
      .select(col("doc_id").as("media_id"),
        concat(
          concat(lit("P6\n"), col("w").cast("string"), lit(" "),
            col("h").cast("string"), lit("\n255\n")),
          expr("substring(repeat(text, CAST((need + length(text) - 1) / length(text) AS INT)), 1, need)"))
          .cast("binary").as("payload"))

  /** Typed view of a (media_id, payload) PPM table. */
  def asPpm(df: DataFrame): Dataset[PpmRecord] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload")).as[PpmRecord]
  }

  /** Parse one P6 image: magic / width / height / maxval with comment and
    * whitespace handling per the netpbm spec, then per-channel means over
    * the raw samples (integer sums, one division — engine-replayable).
    * Malformed input fails loudly with the media id. */
  private[graft] def parsePpm(id: Long, b: Array[Byte]): PpmFeatures = {
    var pos = 0
    def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def token(): String = {
      var scanning = true
      while (scanning && pos < b.length) {
        val c = b(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '#') { while (pos < b.length && b(pos) != '\n'.toByte) pos += 1 }
        else scanning = false
      }
      val start = pos
      while (pos < b.length && !isWs(b(pos) & 0xff)) pos += 1
      new String(b, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"media $id: not a binary PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"media $id: bad dimensions ${w}x$h")
    require(maxval > 0 && maxval <= 255,
      s"media $id: unsupported maxval $maxval (1-byte samples only)")
    pos += 1 // exactly one whitespace byte separates header from samples
    require(b.length - pos >= w * h * 3, s"media $id: truncated pixel data " +
      s"(${b.length - pos} of ${w * h * 3} bytes)")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var j = 0
    while (j < w * h) {
      sr += b(pos + 3 * j) & 0xff
      sg += b(pos + 3 * j + 1) & 0xff
      sb += b(pos + 3 * j + 2) & 0xff
      j += 1
    }
    val n = (w * h).toDouble
    PpmFeatures(id, w, h, maxval, sr / n, sg / n, sb / n)
  }

  /** Batched REAL decode, same shape as [[decodeFeatures]]: one decoder
    * per partition, streaming iterator, payloads never shuffle — only the
    * fixed-width feature rows flow downstream. */
  def decodePpm(media: Dataset[PpmRecord]): Dataset[PpmFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parsePpm(r.media_id, r.payload)))
  }

  // ---- REAL codec: WAV (RIFF PCM) ------------------------------------------
  // The audio sibling of [[parsePpm]], and the second proof the codec
  // seam's replace-the-body promise holds: a full RIFF container walk
  // (chunk ids + little-endian sizes, unknown chunks skipped, odd sizes
  // word-padded per the spec) + 8-bit PCM feature extraction from the
  // actual bytes. No external library — RIFF is just offsets.

  case class WavRecord(media_id: Long, payload: Array[Byte])
  case class WavFeatures(media_id: Long, sample_rate: Int, n_channels: Int,
                         n_frames: Long, mean_l: Double, mean_r: Double,
                         peak_l: Long, peak_r: Long)

  /** Hex of the i-th little-endian byte of a non-negative integral
    * column — the building block for writing binary container headers
    * in-plan (no UDF: shiftright + AND + hex are all codegen'd). */
  private def leByteHex(c: Column, i: Int): Column =
    lpad(hex(shiftright(c.cast("long"), 8 * i).bitwiseAND(lit(255L))), 2, "0")

  private def le32(c: Column): Column =
    unhex(concat(leByteHex(c, 0), leByteHex(c, 1), leByteHex(c, 2), leByteHex(c, 3)))
  private def le16(c: Column): Column =
    unhex(concat(leByteHex(c, 0), leByteHex(c, 1)))

  /** Build REAL RIFF/WAVE payloads in-plan from a text corpus: a
    * canonical 44-byte header (PCM, stereo, 8-bit; sample rate varies by
    * id) followed by the doc's bytes tiled across the interleaved L/R
    * sample data — ASCII text ⇒ byte == char, so an oracle can recompute
    * the same amplitudes from the same text. Pure projection; the payload
    * is born and stays executor-side. */
  def wavFromText(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      // byte == char is load-bearing: the data chunk is sized in CHARS
      // (`need`) but cast to binary as BYTES — one multi-byte UTF-8 char
      // in the first `need` chars and the payload outruns the declared
      // chunk size (parseWav then walks trailing bytes as a bogus chunk
      // header), and the oracle's ascii() arithmetic diverges the same
      // way. Make the assumption explicit: ASCII-only docs, same
      // predicate in the oracle SQL (strlen = length).
      .filter(octet_length(col("text")) === length(col("text")))
      .withColumn("sr", (lit(8000) + (col("doc_id") % 3) * 4000).cast("long"))
      .withColumn("nf", (lit(20) + col("doc_id") % 50).cast("long"))
      .withColumn("need", (col("nf") * 2).cast("int")) // stereo, 1 byte/sample
      .select(col("doc_id").as("media_id"),
        concat(
          lit("RIFF").cast("binary"), le32(col("need") + 36), lit("WAVE").cast("binary"),
          lit("fmt ").cast("binary"), le32(lit(16)),
          le16(lit(1)),            // audioFormat = PCM
          le16(lit(2)),            // nChannels = stereo
          le32(col("sr")),         // sampleRate
          le32(col("sr") * 2),     // byteRate = sr · blockAlign
          le16(lit(2)),            // blockAlign = 2 ch · 1 byte
          le16(lit(8)),            // bitsPerSample
          lit("data").cast("binary"), le32(col("need")),
          expr("cast(substring(repeat(text, CAST((need + length(text) - 1) / length(text) AS INT)), 1, need) as binary)")
        ).as("payload"))

  /** Typed view of a (media_id, payload) WAV table. */
  def asWav(df: DataFrame): Dataset[WavRecord] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload")).as[WavRecord]
  }

  /** Parse one RIFF/WAVE stream: walk the chunk list (ids are 4 ASCII
    * bytes, sizes little-endian 32-bit, unknown chunks — LIST, fact, … —
    * skipped, odd sizes padded to word boundaries per the RIFF spec),
    * take format geometry from `fmt ` and amplitudes from `data`.
    * 8-bit PCM stores unsigned samples biased by 128; amplitude =
    * byte − 128. Per-channel mean (integer sum, one division) and peak
    * |amplitude| — engine-replayable. Mono input duplicates its channel
    * into both outputs. Malformed input fails loudly with the media id. */
  private[graft] def parseWav(id: Long, b: Array[Byte]): WavFeatures = {
    def ascii4(p: Int) = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(p: Int): Long = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def u16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    require(b.length >= 12 && ascii4(0) == "RIFF" && ascii4(8) == "WAVE",
      s"media $id: not a RIFF/WAVE stream")
    var pos = 12
    var fmtSeen = false
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataPos = -1
    var dataLen = 0L
    while (pos + 8 <= b.length) {
      val cid = ascii4(pos)
      val sz = u32(pos + 4)
      val body = pos + 8
      require(body + sz <= b.length, s"media $id: chunk '$cid' overruns the stream")
      cid match {
        case "fmt " =>
          require(sz >= 16, s"media $id: fmt chunk too short ($sz bytes)")
          val audioFormat = u16(body)
          require(audioFormat == 1, s"media $id: non-PCM audio format $audioFormat")
          channels = u16(body + 2)
          sampleRate = u32(body + 4).toInt
          bits = u16(body + 14)
          fmtSeen = true
        case "data" => dataPos = body; dataLen = sz
        case _ => () // LIST/INFO/fact/cue — legal, irrelevant here: skip
      }
      pos = body + sz.toInt + (sz.toInt & 1) // odd-size chunks carry a pad byte
    }
    require(fmtSeen, s"media $id: missing fmt chunk")
    require(dataPos >= 0, s"media $id: missing data chunk")
    require(bits == 8, s"media $id: only 8-bit PCM supported, got $bits-bit")
    require(channels == 1 || channels == 2,
      s"media $id: unsupported channel count $channels")
    val frames = dataLen / channels
    require(frames > 0, s"media $id: empty data chunk")
    var (sl, sr, pl, pr) = (0L, 0L, 0L, 0L)
    var j = 0
    while (j < frames) {
      val l = (b(dataPos + channels * j.toInt) & 0xff) - 128
      val r = if (channels == 2) (b(dataPos + 2 * j.toInt + 1) & 0xff) - 128 else l
      sl += l; sr += r
      if (math.abs(l) > pl) pl = math.abs(l)
      if (math.abs(r) > pr) pr = math.abs(r)
      j += 1
    }
    WavFeatures(id, sampleRate, channels, frames,
      sl.toDouble / frames, sr.toDouble / frames, pl, pr)
  }

  /** Batched REAL decode, same shape as [[decodePpm]]: one decoder per
    * partition, streaming iterator, payloads never shuffle — only the
    * fixed-width feature rows flow downstream. */
  def decodeWav(media: Dataset[WavRecord]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseWav(r.media_id, r.payload)))
  }

  /** Typed view of an ingested media DataFrame. */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload"),
      col("meta").cast("struct<format:string,width:int,height:int,n_bytes:bigint>"))
      .as[MediaRecord]
  }

  /** Expression-level frame sampling: k evenly-spaced fixed-width byte
    * windows of the payload, each fingerprinted (md5). Pure projection —
    * the payload never crosses a shuffle. */
  def frameSample(df: DataFrame, k: Int, frameBytes: Int): DataFrame = {
    val nBytes = col("meta").getField("n_bytes")
    val stride = (nBytes / lit(k)).cast("long") // exact: n_bytes << 2^53
    val frames = (0 until k).map { i =>
      md5(col("payload").substr(lit(1) + lit(i) * stride, lit(frameBytes)))
        .as(s"frame_$i")
    }
    df.select(col("media_id") +: nBytes.as("n_bytes") +: frames: _*)
  }
}
