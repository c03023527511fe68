package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument surface: reference `download()` kwarg names map onto
  * DownloadConfig (`main.py:73-112` parity).
  */
class MainSpec extends AnyFunSuite {

  private def cfg(args: String*) = {
    val m = args.grouped(2).map { case Seq(k, v) => k -> v }.toMap
    Main.configFrom(m)
  }

  test("reference kwarg names map to config fields") {
    val c = cfg(
      "image_size", "128", "resize_mode", "center_crop",
      "resize_only_if_bigger", "True", "encode_format", "webp",
      "output_format", "webdataset", "number_sample_per_shard", "500",
      "compute_hash", "md5", "verify_hash", "[myhash,md5]",
      "timeout", "5", "retries", "2", "extract_exif", "true",
      "save_additional_columns", "['label','score']",
      "incremental_mode", "overwrite", "ignore_ssl_certificate", "true",
      "user_agent_token", "graft")
    assert(c.imageSize == 128 && c.resizeMode == "center_crop" && c.resizeOnlyIfBigger)
    assert(c.encodeFormat == "webp" && c.outputFormat == "webdataset")
    assert(c.samplesPerShard == 500 && c.computeHashCol.contains("md5"))
    assert(c.verifyHash.contains(("myhash", "md5")))
    assert(c.timeoutSeconds == 5 && c.retries == 2 && c.extractExif)
    assert(c.saveAdditionalColumns == Seq("label", "score"))
    assert(c.incrementalMode == "overwrite" && c.ignoreSslCertificate)
    assert(c.userAgentToken.contains("graft"))
    c.copy(computeHashCol = Some("md5")).validate() // parses to a valid config
  }

  test("scheduling knobs Spark subsumes are accepted and ignored") {
    val c = cfg("processes_count", "16", "distributor", "pyspark",
      "subjob_size", "1000", "max_shard_retry", "3")
    assert(c == graft.config.DownloadConfig())
  }

  test("interpolation knobs map through the CLI (main.py:80-81)") {
    val c = cfg("upscale_interpolation", "cubic", "downscale_interpolation", "nearest")
    assert(c.upscaleInterpolation == "cubic" && c.downscaleInterpolation == "nearest")
    // defaults are the reference's
    val d = graft.config.DownloadConfig()
    assert(d.upscaleInterpolation == "lanczos" && d.downscaleInterpolation == "area")
    intercept[IllegalArgumentException] {
      cfg("upscale_interpolation", "hamming").validate()
    }
  }

  test("unknown options and wandb are rejected") {
    intercept[IllegalArgumentException] { cfg("no_such_flag", "1") }
    intercept[IllegalArgumentException] { cfg("enable_wandb", "True") }
    assert(cfg("enable_wandb", "False") == graft.config.DownloadConfig())
  }

  test("compute_hash None disables the hash column") {
    assert(cfg("compute_hash", "None").computeHashCol.isEmpty)
  }

  test("None sentinel keeps defaults for every other optional") {
    val c = cfg("caption_col", "None", "bbox_col", "None", "verify_hash", "None",
      "user_agent_token", "None", "disallowed_header_directives", "None",
      "save_additional_columns", "None")
    assert(c == graft.config.DownloadConfig())
  }

  test("double-quoted list values parse like single-quoted") {
    assert(cfg("save_additional_columns", """["label","score"]""").saveAdditionalColumns ==
      Seq("label", "score"))
  }

  test("parseArgs: --key=value, --key value, and bare flags") {
    val m = Main.parseArgs(Array(
      "--url_list=urls.txt", "--image_size", "128", "--extract_exif"))
    assert(m == Map("url_list" -> "urls.txt", "image_size" -> "128", "extract_exif" -> "true"))
    intercept[IllegalArgumentException] { Main.parseArgs(Array("image_size=5")) }
  }
}
