package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The heavy codecs (JPEG decode, audio resample, video frame grab) are
  * NOT available in this environment — `stubDecode` below is a
  * deterministic fake standing in for the real library call, clearly
  * marked. PPM (P6) needs no library, so it gets a REAL decoder
  * ([[parsePpm]]) in the same mapPartitions seam — the existence proof
  * that the stub's replace-the-body contract holds. Everything around it is real and load-bearing: the schema
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
