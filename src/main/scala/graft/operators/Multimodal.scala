package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The actual codecs (JPEG decode, audio resample, video frame grab) are
  * NOT available in this environment — `stubDecode` below is a
  * deterministic fake standing in for the real library call, clearly
  * marked. Everything around it is real and load-bearing: the schema
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
