package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Y4M pins: round trips per colorspace (incl. odd dims and the
  * chroma ceil), header pinning, frame params preservation, default
  * colorspace, short-frame/garbage rejection, bomb caps. */
class Y4mSpec extends AnyFunSuite {

  import Y4m.{Y4mHeader, Y4mFrame}

  private def frames(n: Int, size: Int): Seq[Y4mFrame] =
    (0 until n).map(i =>
      Y4mFrame(if (i == 1) "Xtag=1" else "",
        Array.tabulate[Byte](size)(j => ((i * 131 + j) % 251).toByte)))

  test("round trips across colorspaces and odd dims") {
    for ((cs, w, h) <- Seq(("420jpeg", 6, 4), ("420", 5, 3),
      ("420mpeg2", 2, 2), ("420paldv", 4, 6), ("422", 5, 4),
      ("444", 3, 3), ("mono", 7, 5))) {
      val fs = Y4m.frameSize(w, h, cs).get
      val hdr = Y4mHeader(w, h, 30000, 1001, "p", "1:1", cs)
      val data = Y4m.build(hdr, frames(3, fs))
      val (gh, gf) = Y4m.parse(data).get
      assert(gh == hdr)
      assert(gf.length == 3)
      assert(gf(1).params == "Xtag=1")
      for ((a, b) <- gf.zip(frames(3, fs)))
        assert(a.planes.sameElements(b.planes))
    }
  }

  test("frame sizes use ceil for odd chroma dims") {
    assert(Y4m.frameSize(5, 3, "420").get == 15 + 2 * 3 * 2)
    assert(Y4m.frameSize(5, 4, "422").get == 20 + 2 * 3 * 4)
    assert(Y4m.frameSize(3, 3, "444").get == 27)
    assert(Y4m.frameSize(7, 5, "mono").get == 35)
    assert(Y4m.frameSize(2, 2, "nonsense").isEmpty)
  }

  test("header text is pinned and the colorspace default applies") {
    val hdr = Y4mHeader(4, 2, 25, 1, "", "", "mono")
    val data = Y4m.build(hdr, frames(1, 8))
    val line = new String(data.takeWhile(_ != '\n'), "US-ASCII")
    assert(line == "YUV4MPEG2 W4 H2 F25:1 Cmono")
    // no C token -> 420jpeg default
    val noC = "YUV4MPEG2 W2 H2 F25:1\n".getBytes("US-ASCII") ++
      Array.fill[Byte](0)(0)
    assert(Y4m.parse(noC).get._1.colorspace == "420jpeg")
  }

  test("rejections: bad magic, short frame, unknown colorspace, junk token") {
    assert(Y4m.parse("MPEG".getBytes).isEmpty)
    val hdr = Y4mHeader(4, 4, 25, 1, "", "", "mono")
    val good = Y4m.build(hdr, frames(2, 16))
    assert(Y4m.parse(good.dropRight(1)).isEmpty) // short last frame
    assert(Y4m.parse(
      "YUV4MPEG2 W2 H2 F25:1 Cwat\nFRAME\nxxxx".getBytes).isEmpty)
    assert(Y4m.parse(
      "YUV4MPEG2 W2 H2 F25:1 Qz\n".getBytes).isEmpty) // unknown token
    assert(Y4m.parse(
      "YUV4MPEG2 W0 H2 F25:1\n".getBytes).isEmpty)
    // frame header must literally be FRAME
    assert(Y4m.parse(
      ("YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAMX\n" + "x" * 4).getBytes).isEmpty)
    // maxFrames cap
    val many = Y4m.build(Y4mHeader(1, 1, 1, 1, "", "", "mono"),
      (0 until 5).map(_ => Y4mFrame("", Array[Byte](0))))
    assert(Y4m.parse(many, maxFrames = 4).isEmpty)
    assert(Y4m.parse(many, maxFrames = 5).isDefined)
  }

  test("fuzz never throws") {
    val rnd = new scala.util.Random(0x44d)
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Y4m.parse(junk)
      Y4m.parse("YUV4MPEG2 ".getBytes ++ junk)
    }
  }
}
