package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Interop oracle against the zstd / xz command-line tools — bit-exact
  * stand-ins for the reference's two compression backends (zstd-codec
  * WASM and npm lzma, /root/reference/src/EncodeTools.ts:1600-1661, whose
  * node_modules are not installed offline): our streams must decompress
  * what the CLIs produce and vice versa (format-level compatibility, not
  * just self-round-trip).
  */
class CliOracleSpec extends AnyFunSuite {
  private def cli(name: String): Option[String] =
    Seq(s"/root/miniconda/bin/$name", s"/usr/bin/$name")
      .find(p => new java.io.File(p).exists())

  private def run(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $out")
  }

  private val payload = ("the quick brown fox " * 200 + "é世界")
    .getBytes("UTF-8")

  test("zstd: CLI-compressed data decompresses with zstd-jni, and back") {
    assume(cli("zstd").isDefined, "zstd CLI not present")
    val z = cli("zstd").get
    val dir = Files.createTempDirectory("cli_zstd")
    val raw = dir.resolve("raw.bin")
    Files.write(raw, payload)
    run(z, "-3", "-q", "-f", raw.toString, "-o", s"$raw.zst")
    val cliBytes = Files.readAllBytes(Paths.get(s"$raw.zst"))
    assert(Compression.zstdDecompress(cliBytes).sameElements(payload))
    // ours -> CLI
    val ours = dir.resolve("ours.zst")
    Files.write(ours, Compression.zstdCompress(payload, 3))
    run(z, "-d", "-q", "-f", ours.toString, "-o", dir.resolve("back.bin").toString)
    assert(Files.readAllBytes(dir.resolve("back.bin")).sameElements(payload))
  }

  test("lzma: CLI(xz --format=lzma)-compressed data decompresses with our stream, and back") {
    assume(cli("xz").isDefined, "xz CLI not present")
    val xz = cli("xz").get
    val dir = Files.createTempDirectory("cli_lzma")
    val raw = dir.resolve("raw.bin")
    Files.write(raw, payload)
    run(xz, "--format=lzma", "-6", "-q", "-k", "-f", raw.toString)
    val cliBytes = Files.readAllBytes(Paths.get(s"$raw.lzma"))
    assert(Compression.lzmaDecompress(cliBytes).sameElements(payload))
    val ours = dir.resolve("ours.lzma")
    Files.write(ours, Compression.lzmaCompress(payload, 6))
    run(xz, "--format=lzma", "-d", "-q", "-k", "-f", ours.toString)
    assert(Files.readAllBytes(dir.resolve("ours")).sameElements(payload))
  }
}
