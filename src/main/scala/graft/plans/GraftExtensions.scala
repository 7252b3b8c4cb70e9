package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions wiring: registers every graft native expression
  * as a SQL function, so `spark.sql("SELECT graft_simhash(text, 30) …")`
  * works in any session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`). The Column API
  * (Dedup/Similarity/SteamParsers) does NOT require this — it binds
  * expressions directly — so driver-owned sessions still work unwired. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))

    reg("graft_poly_hash", "polynomial rolling hash mod 1e9+7") {
      args => PolyHashExpr(args.head)
    }
    reg("graft_shingle_hashes", "(text, n) distinct word n-gram shingle hashes") {
      args => ShingleHashesExpr(args.head, intArg(args(1), "n"))
    }
    reg("graft_seq_shingle_hashes", "(text, n) ordered positional word n-gram shingle hashes") {
      args => SeqShingleHashesExpr(args.head, intArg(args(1), "n"))
    }
    reg("graft_minhash_sig", "(shingles, k) minhash signature") {
      args => MinHashSigExpr(args.head, intArg(args(1), "k"))
    }
    reg("graft_band_keys", "(sig, bands, rows) LSH band keys") {
      args => BandKeysExpr(args.head, intArg(args(1), "bands"), intArg(args(2), "rows"))
    }
    reg("graft_simhash", "(text, nBits) simhash fingerprint") {
      args => SimHashExpr(args.head, intArg(args(1), "nBits"))
    }
    reg("graft_winnow", "(text, n, w) winnowed fingerprint set") {
      args => WinnowExpr(args.head, intArg(args(1), "n"), intArg(args(2), "w"))
    }
    reg("graft_char_ngrams", "(text, n, distinct) char n-gram hashes") {
      args => CharNgramHashesExpr(args.head, intArg(args(1), "n"),
        args(2).eval().asInstanceOf[Boolean])
    }
    reg("graft_hash_embed", "(text, d) feature-hashed ARRAY<FLOAT> embedding") {
      args => HashEmbedExpr(args.head, intArg(args(1), "d"))
    }
    reg("graft_cosine", "(vec, vec) cosine similarity") {
      args => CosineSimExpr(args.head, args(1))
    }
    reg("graft_lsh_bucket", "(vec, nPlanes) sign-LSH bucket id") {
      args => SignLshBucketExpr(args.head, intArg(args(1), "nPlanes"))
    }
    reg("graft_lsh_band_keys", "(vec, nBands, planesPerBand) banded sign-LSH keys") {
      args => SignLshBandKeysExpr(args.head, intArg(args(1), "nBands"),
        intArg(args(2), "planesPerBand"))
    }
    reg("graft_steam_price", "locale-aware Steam price parse") {
      args => SteamPriceExpr(args.head)
    }
    reg("graft_minor_to_major", "minor-units int-string to major units") {
      args => MinorUnitsExpr(args.head)
    }
    reg("graft_parse_volume", "thousands-separated volume parse") {
      args => VolumeExpr(args.head)
    }
    reg("graft_extract_currency", "ordered symbol scan to ISO code") {
      args => CurrencyExpr(args.head)
    }
    reg("graft_steam_datetime", "Steam hourly datetime parse") {
      args => SteamDatetimeExpr(args.head)
    }
    reg("graft_price_to_float", "read-path price re-parse") {
      args => PriceToFloatExpr(args.head)
    }
    reg("graft_parse_activity_html", "activity HTML tape parse to struct") {
      args => ActivityHtmlExpr(args.head)
    }
  }
}
