package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * Three formats get REAL decoders — they need no external library, the
  * containers are just offsets: PPM (P6) images ([[parsePpm]]), RIFF/WAVE
  * PCM audio ([[parseWav]], a full chunk walk), and YUV4MPEG2 video
  * ([[parseY4m]], stream header + per-FRAME planar samples) — one per
  * modality, all through the same mapPartitions seam. Compressed codecs
  * (JPEG, MP3, H.264) aren't linkable in this environment; a deployment
  * adds them by dropping the library call into the same seam —
  * [[byteStatsDecode]] is the format-AGNOSTIC fallback pass (honest byte
  * statistics, not pixels) for payloads no linked codec claims. The
  * surrounding plumbing is identical either way: the schema (payload
  * BINARY + meta STRUCT), the typed Dataset boundary, the mapPartitions
  * batch shape (one decoder init per partition, streaming iterator — the
  * Scala analog of mapInPandas), and the expression-level frame sampling.
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

  /** Format-agnostic byte-statistics pass: mean byte + 16-bin histogram
    * over the raw payload. This is the catch-all arm of the decode seam —
    * content-level decoders ([[parsePpm]], [[parseWav]], [[parseY4m]], or
    * a linked library codec dropped into the same seam) handle the
    * formats they claim; everything else still yields deterministic,
    * oracle-replayable features for dedup/quality triage. */
  private def byteStatsDecode(r: MediaRecord): MediaFeatures = {
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
      // a linked-library codec would init HERE, once per partition
      iter.map(byteStatsDecode)
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
  /** Shared P6 header scan: magic / width / height / maxval with comment
    * and whitespace handling per the netpbm spec; returns the dims plus
    * the offset of the first sample byte. Malformed input fails loudly
    * with the media id. */
  private def ppmHeader(id: Long, b: Array[Byte]): (Int, Int, Int, Int) = {
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
    (w, h, maxval, pos)
  }

  private[graft] def parsePpm(id: Long, b: Array[Byte]): PpmFeatures = {
    val (w, h, maxval, pos) = ppmHeader(id, b)
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

  case class PpmHash(media_id: Long, width: Int, height: Int, phash: Long)

  /** Perceptual average-hash from the REAL decoded pixels: bit j is set
    * iff pixel j is brighter than the image mean — stated integer-only
    * as gray_j·n > Σgray (cross-multiplied, no mean ever divided), with
    * gray = r+g+b per pixel and the first min(n, 64) pixels packed
    * little-endian into one long. Tiny crops/brightness-uniform shifts
    * of an image preserve most bits, so equal hashes group perceptual
    * near-dups the byte-level payload hash misses. Lives in the same
    * codec seam as [[parsePpm]]; only (id, w, h, hash) rows flow out. */
  private[graft] def parsePpmHash(id: Long, b: Array[Byte]): PpmHash = {
    val (w, h, _, pos) = ppmHeader(id, b)
    val n = w * h
    val gray = new Array[Long](n)
    var tot = 0L
    var j = 0
    while (j < n) {
      val g = (b(pos + 3 * j) & 0xff) + (b(pos + 3 * j + 1) & 0xff) +
        (b(pos + 3 * j + 2) & 0xff)
      gray(j) = g; tot += g; j += 1
    }
    var hash = 0L
    val bits = math.min(n, 64)
    j = 0
    while (j < bits) {
      if (gray(j) * n > tot) hash |= (1L << j)
      j += 1
    }
    PpmHash(id, w, h, hash)
  }

  /** Batched perceptual-hash decode in the codec seam — payloads never
    * shuffle; the fixed-width hash rows feed the dedup grouping. */
  def decodePpmHash(media: Dataset[PpmRecord]): Dataset[PpmHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parsePpmHash(r.media_id, r.payload)))
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
  private case class WavGeom(sampleRate: Int, channels: Int,
                             dataPos: Int, frames: Long)

  /** RIFF chunk walk + format validation shared by every WAV consumer
    * ([[parseWav]]'s whole-stream stats, [[wavWindowEnergy]]'s windows):
    * returns the data-chunk geometry, raising loudly (with the media id)
    * on anything malformed. */
  private def parseWavHeader(id: Long, b: Array[Byte]): WavGeom = {
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
    WavGeom(sampleRate, channels, dataPos, frames)
  }

  private[graft] def parseWav(id: Long, b: Array[Byte]): WavFeatures = {
    val g = parseWavHeader(id, b)
    val channels = g.channels
    val sampleRate = g.sampleRate
    val dataPos = g.dataPos
    val frames = g.frames
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

  case class WavWindow(media_id: Long, win_idx: Int, n_frames: Int,
                       energy_l: Long, energy_r: Long)

  /** WINDOWED audio energy — the spectrogram-precursor verb audio
    * pipelines run before any model sees a sample (VAD gating, silence
    * trimming, loudness segmentation): the real RIFF decode walked in
    * non-overlapping `windowFrames`-frame windows, per window the exact
    * integer energy Σ amplitude² per channel (8-bit PCM amplitudes are
    * −128..127, so a window's energy fits a long at ANY window size) and
    * the window's true frame count (the tail window is short, not
    * padded — padding would bias a per-frame comparison). Same seam
    * discipline as [[decodeWav]]: one decoder per partition, payloads
    * never shuffle, only fixed-width window rows flow downstream —
    * windows-per-media is duration/window, so output scales with AUDIO
    * LENGTH, not payload bytes. */
  def wavWindowEnergy(media: Dataset[WavRecord],
                      windowFrames: Int): Dataset[WavWindow] = {
    require(windowFrames >= 1, s"windowFrames must be positive: $windowFrames")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.payload
      val g = parseWavHeader(r.media_id, b)
      val nw = ((g.frames + windowFrames - 1) / windowFrames).toInt
      (0 until nw).iterator.map { w =>
        val lo = w.toLong * windowFrames
        val hi = math.min(g.frames, lo + windowFrames)
        var el = 0L; var er = 0L; var j = lo
        while (j < hi) {
          val l = (b(g.dataPos + g.channels * j.toInt) & 0xff) - 128
          val rr = if (g.channels == 2)
            (b(g.dataPos + 2 * j.toInt + 1) & 0xff) - 128 else l
          el += l.toLong * l; er += rr.toLong * rr
          j += 1
        }
        WavWindow(r.media_id, w, (hi - lo).toInt, el, er)
      }
    })
  }

  // ---- REAL codec: Y4M (YUV4MPEG2) video -----------------------------------
  // The third real decoder, and the one with FRAME structure: a plain-text
  // stream header ("YUV4MPEG2 W.. H.. F..:.. C444\n"), then per frame a
  // "FRAME...\n" marker followed by raw planar Y/Cb/Cr samples (C444 ⇒
  // 3·w·h bytes per frame). No library — the container is just offsets,
  // like RIFF. This retires the codec-seam stub vocabulary: image (PPM),
  // audio (WAV), and video (Y4M) all decode real bytes through the same
  // mapPartitions shape.

  case class Y4mRecord(media_id: Long, payload: Array[Byte])
  case class Y4mFeatures(media_id: Long, width: Int, height: Int,
                         n_frames: Int, mean_y: Double, mean_cb: Double,
                         mean_cr: Double, f_first: String, f_mid: String,
                         f_last: String)
  case class Y4mFrame(media_id: Long, frame_idx: Int, n_frames: Int,
                      frame_md5: String)

  /** Build REAL YUV4MPEG2 payloads in-plan from a text corpus: stream
    * header, then `nf` frames (varying per doc) each "FRAME\n" + 3·w·h
    * planar samples taken from the doc's bytes tiled CONTINUOUSLY across
    * frames — frame f holds tiled offsets [f·3wh, (f+1)·3wh), so an
    * oracle can recompute every plane mean and frame fingerprint from the
    * text alone. Same ASCII byte == char contract as [[wavFromText]].
    * Pure projection; the payload never leaves the executor.
    *
    * `geomCol` keys the stream GEOMETRY (w/h/frame count); it defaults to
    * the media id, but a re-encode corpus points it at a shared footage
    * id so members of a footage group produce byte-identical streams
    * (the duplicate-frame-detection fixture shape). */
  def y4mFromText(docs: DataFrame, geomCol: String = "doc_id"): DataFrame = {
    val maxFrames = 4
    val d = docs.filter(length(col("text")) > 0)
      .filter(octet_length(col("text")) === length(col("text")))
      .withColumn("w", (lit(4) + col(geomCol) % 3).cast("int"))
      .withColumn("h", (lit(2) + col(geomCol) % 2).cast("int"))
      .withColumn("nf", (lit(2) + col(geomCol) % 3).cast("int"))
      .withColumn("fs", col("w") * col("h") * 3)
      .withColumn("rep", expr(
        "repeat(text, CAST((nf * fs + length(text) - 1) / length(text) AS INT))"))
    val header = concat(lit("YUV4MPEG2 W").cast("binary"),
      col("w").cast("string").cast("binary"), lit(" H").cast("binary"),
      col("h").cast("string").cast("binary"),
      lit(" F25:1 Ip A1:1 C444\n").cast("binary"))
    val frames = (0 until maxFrames).map { f =>
      when(lit(f) < col("nf"),
        concat(lit("FRAME\n").cast("binary"),
          expr(s"cast(substring(rep, 1 + $f * fs, fs) as binary)")))
        .otherwise(lit("").cast("binary"))
    }
    d.select(col("doc_id").as("media_id"),
      concat(header +: frames: _*).as("payload"))
  }

  /** Typed view of a (media_id, payload) Y4M table. */
  def asY4m(df: DataFrame): Dataset[Y4mRecord] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload")).as[Y4mRecord]
  }

  /** Parse one YUV4MPEG2 stream: stream-header tag walk (W/H/C honored,
    * F/I/A legal and skipped), then the frame loop — each "FRAME" marker
    * may carry its own parameters up to '\n', followed by exactly 3·w·h
    * C444 samples. Per-plane means are integer sums with one final
    * division (engine-replayable); three sampled frames — first, middle
    * ⌊(nf−1)/2⌋, last — are fingerprinted (md5 hex) from their raw plane
    * bytes, the real-frame feed for frame-sampling pipelines. Malformed
    * input fails loudly with the media id. */
  /** Header parse + FRAME-marker walk shared by every Y4M consumer:
    * returns (width, height, body-start offset of each frame). The walk
    * is the byte-level ground truth for "where does frame f start" —
    * [[parseY4m]] aggregates over it, [[parseY4mFrames]] fingerprints
    * every entry. */
  private def y4mWalk(id: Long, b: Array[Byte]): (Int, Int, Array[Int]) = {
    val magic = "YUV4MPEG2"
    require(b.length > magic.length &&
      new String(b, 0, magic.length, java.nio.charset.StandardCharsets.US_ASCII) == magic,
      s"media $id: not a YUV4MPEG2 stream")
    var eol = magic.length
    while (eol < b.length && b(eol) != '\n') eol += 1
    require(eol < b.length, s"media $id: unterminated stream header")
    val tags = new String(b, magic.length, eol - magic.length,
      java.nio.charset.StandardCharsets.US_ASCII).trim.split("\\s+").filter(_.nonEmpty)
    var (w, h) = (0, 0)
    var cs = "420jpeg" // the spec's default when no C tag is present
    tags.foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'C' => cs = t.drop(1)
        case _ => () // F (rate), I (interlace), A (aspect), X (extension)
      }
    }
    require(w > 0 && h > 0, s"media $id: missing W/H in stream header")
    require(cs == "444", s"media $id: only C444 supported, got C$cs")
    val frameLen = 3 * w * h
    var pos = eol + 1
    var nf = 0
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    while (pos < b.length) {
      require(pos + 5 <= b.length &&
        new String(b, pos, 5, java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
        s"media $id: expected FRAME marker at byte $pos")
      var fe = pos + 5
      while (fe < b.length && b(fe) != '\n') fe += 1 // frame params: legal, skipped
      require(fe < b.length, s"media $id: unterminated FRAME header")
      val body = fe + 1
      require(body + frameLen <= b.length,
        s"media $id: frame $nf truncated (${b.length - body} of $frameLen bytes)")
      starts += body
      nf += 1
      pos = body + frameLen
    }
    require(nf > 0, s"media $id: no frames")
    (w, h, starts.toArray)
  }

  private def md5Hex(b: Array[Byte], pos: Int, len: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(b, pos, pos + len))
      .map("%02x".format(_)).mkString

  private[graft] def parseY4m(id: Long, b: Array[Byte]): Y4mFeatures = {
    val (w, h, starts) = y4mWalk(id, b)
    val planeLen = w * h
    val frameLen = 3 * planeLen
    val nf = starts.length
    var (sy, scb, scr) = (0L, 0L, 0L)
    starts.foreach { body =>
      var i = 0
      while (i < planeLen) { sy += b(body + i) & 0xff; i += 1 }
      while (i < 2 * planeLen) { scb += b(body + i) & 0xff; i += 1 }
      while (i < 3 * planeLen) { scr += b(body + i) & 0xff; i += 1 }
    }
    val n = (nf.toLong * planeLen).toDouble
    Y4mFeatures(id, w, h, nf, sy / n, scb / n, scr / n,
      md5Hex(b, starts(0), frameLen), md5Hex(b, starts((nf - 1) / 2), frameLen),
      md5Hex(b, starts(nf - 1), frameLen))
  }

  /** One row per REAL frame: (media_id, frame_idx, n_frames, frame_md5),
    * fingerprints taken at the decoder's exact frame-body offsets. The
    * relational feed for frame-level sampling/dedup — never an array
    * column, so rows stay driver-comparable and frame tables join/filter
    * like any other. */
  private[graft] def parseY4mFrames(id: Long, b: Array[Byte]): Seq[Y4mFrame] = {
    val (w, h, starts) = y4mWalk(id, b)
    val frameLen = 3 * w * h
    val nf = starts.length
    starts.toSeq.zipWithIndex.map { case (body, i) =>
      Y4mFrame(id, i, nf, md5Hex(b, body, frameLen))
    }
  }

  /** Batched REAL decode, same shape as [[decodePpm]]/[[decodeWav]]. */
  def decodeY4m(media: Dataset[Y4mRecord]): Dataset[Y4mFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseY4m(r.media_id, r.payload)))
  }

  /** Batched per-frame decode: the frame TABLE of a Y4M corpus — one
    * (media_id, frame_idx, n_frames, frame_md5) row per real frame, from
    * [[parseY4mFrames]]' byte-exact boundaries. Row count is Σ n_frames,
    * payloads stay executor-side; downstream sampling/dedup is plain
    * relational work on 4-column rows. */
  def decodeY4mFrames(media: Dataset[Y4mRecord]): Dataset[Y4mFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => parseY4mFrames(r.media_id, r.payload)))
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
