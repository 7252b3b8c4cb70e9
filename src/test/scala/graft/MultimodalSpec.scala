package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The REAL PPM (P6) codec in the multimodal seam: golden-image decode
  * (header comments and all), loud failures on malformed bytes, and the
  * in-plan payload builder round-tripping through the distributed
  * decoder. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 2×2 P6 with a comment line: pixels (R,G,B) = (10,20,30) (40,50,60)
    * (70,80,90) (100,110,120) → means (55, 65, 75). */
  private def golden: Array[Byte] =
    ("P6\n# a comment the parser must skip\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))

  test("parsePpm: golden image — header, comment, dims, exact channel means") {
    val f = Multimodal.parsePpm(7L, golden)
    assert(f == Multimodal.PpmFeatures(7L, 2, 2, 255, 55.0, 65.0, 75.0))
  }

  test("parsePpm: malformed inputs fail loudly with the media id") {
    val wrongMagic = intercept[IllegalArgumentException] {
      Multimodal.parsePpm(3L, "P5\n2 2\n255\n____________".getBytes("US-ASCII"))
    }
    assert(wrongMagic.getMessage.contains("media 3") &&
      wrongMagic.getMessage.contains("P5"))
    val truncated = intercept[IllegalArgumentException] {
      Multimodal.parsePpm(4L, "P6\n2 2\n255\nabc".getBytes("US-ASCII"))
    }
    assert(truncated.getMessage.contains("truncated"))
    val wideSamples = intercept[IllegalArgumentException] {
      Multimodal.parsePpm(5L, "P6\n1 1\n65535\n______".getBytes("US-ASCII"))
    }
    assert(wideSamples.getMessage.contains("maxval"))
  }

  test("ppmFromText -> decodePpm: in-plan payloads are valid P6 and decode distributed") {
    val s = spark
    import s.implicits._
    // doc 0: w=4, h=3 → 36 samples tiled from "ABCD" (A=65 B=66 C=67 D=68);
    // channel means over the tile pattern are exact integer ratios
    val docs = Seq((0L, "ABCD")).toDF("doc_id", "text")
    val out = Multimodal.decodePpm(Multimodal.asPpm(
      Multimodal.ppmFromText(docs))).collect()
    assert(out.length == 1)
    val f = out(0)
    assert(f.width == 4 && f.height == 3 && f.maxval == 255)
    // pixel byte i = "ABCD"[i % 4]: channel c sums bytes at i ≡ c (mod 3)
    def mean(c: Int) = (0 until 36).filter(_ % 3 == c)
      .map(i => "ABCD".charAt(i % 4).toInt).sum / 12.0
    assert(f.mean_r == mean(0) && f.mean_g == mean(1) && f.mean_b == mean(2))
    // empty text never becomes a (divide-by-zero) payload
    assert(Multimodal.ppmFromText(
      Seq((1L, "")).toDF("doc_id", "text")).isEmpty)
  }
}
