package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Magic-byte dispatch pins: every encoded container sniffs to its
  * type, RIFF disambiguates by form type, and short/garbage buffers
  * fall through to octet-stream. */
class SniffSpec extends AnyFunSuite {
  private val M = Multimodal
  private val b = "payload bytes".getBytes("UTF-8")

  test("every encoder's output sniffs to its own type") {
    assert(M.sniffKind(M.encodeBmp(3, 3, b)) == "image/bmp")
    assert(M.sniffKind(M.encodePng(3, 3, b)) == "image/png")
    assert(M.sniffKind(M.encodeGif(3, 3, b)) == "image/gif")
    assert(M.sniffKind(M.encodeJpegHeader(3, 3, b)) == "image/jpeg")
    assert(M.sniffKind(M.encodeTiff(3, 3, true, b)) == "image/tiff")
    assert(M.sniffKind(M.encodeTiff(3, 3, false, b)) == "image/tiff")
    assert(M.sniffKind(M.encodeWavPcm8(8000, b)) == "audio/wav")
    assert(M.sniffKind(M.encodeWebp("VP8 ", 3, 3, b)) == "image/webp")
    assert(M.sniffKind(M.encodeAviMjpeg(8, 8, 40000,
      Seq(Jpeg.encodePixels(1, 1, Array[Byte](1, 2, 3))))) ==
      "video/x-msvideo")
    assert(M.sniffKind(M.encodeMp4(3, 3, 1000, 400, b)) == "video/mp4")
    assert(M.sniffKind(M.encodeMp3(2, b)) == "audio/mpeg")
    assert(M.sniffKind(Warc.buildRecord(1, "http://x/1", b)) ==
      "application/warc")
    assert(M.sniffKind(Warc.buildArchive(
      Seq(Warc.buildRecord(1, "http://x/1", b)), gzip = true)) ==
      "application/gzip")
    assert(M.sniffKind(Bzip2.encode(b)) == "application/x-bzip2")
    assert(M.sniffKind(Zstd.encodeStore(b)) == "application/zstd")
    assert(M.sniffKind(Xz.encodeStore(b)) == "application/x-xz")
    assert(M.sniffKind(Qoi.encode(2, 2, (b ++ b).take(12))) == "image/qoi")
    assert(M.sniffKind(Y4m.build(
      Y4m.Y4mHeader(1, 3, 25, 1, "", "", "mono"),
      Seq(Y4m.Y4mFrame("", b.take(3))))) == "video/x-yuv4mpeg")
    assert(M.sniffKind(WebVtt.build(
      Seq(("", 0L, 1000L, "", "x"))).getBytes("UTF-8")) == "text/vtt")
    assert(M.sniffKind(Pdf.build(Seq(("H", "pdf body")),
      flate = false)) == "application/pdf")
    assert(M.sniffKind("7z".getBytes ++ Array[Byte](0xbc.toByte,
      0xaf.toByte, 0x27, 0x1c)) == "application/x-7z-compressed")
    assert(M.sniffKind(Npy.build("u1", Seq(b.length), b)) ==
      "application/x-npy")
    assert(M.sniffKind(Gguf.build(Seq("k" -> Gguf.GvStr("v")),
      Seq(Gguf.GTensor("t", Seq(b.length.toLong), "I8", b)))) ==
      "application/x-gguf")
    assert(M.sniffKind(Sqlite.build("t", Seq("v"),
      Seq((1L, Seq[Any]("x"))))) == "application/vnd.sqlite3")
    // a real parquet footer-framed file leads with PAR1
    assert(M.sniffKind("PAR1".getBytes ++ b) ==
      "application/vnd.apache.parquet")
  }

  test("short, empty and text buffers fall through") {
    assert(M.sniffKind(Array.emptyByteArray) ==
      "application/octet-stream")
    assert(M.sniffKind("B".getBytes) == "application/octet-stream")
    assert(M.sniffKind("plain words here".getBytes) ==
      "application/octet-stream")
    // RIFF with an unknown form type is NOT a known container
    assert(M.sniffKind("RIFF1234JUNK".getBytes) ==
      "application/octet-stream")
    // MP3 sync byte pair without a full header still sniffs (stream tail)
    assert(M.sniffKind(Array(0xff.toByte, 0xfb.toByte)) == "audio/mpeg")
  }
}
