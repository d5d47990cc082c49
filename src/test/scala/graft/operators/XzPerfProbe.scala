package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Perf probe (not a correctness pin): splits the .tar.xz gate cost
  * into tukaani-compress vs our-decode at shard sizes, and pins the
  * fix — a shard-sized dictionary — against the preset-6 default
  * (8 MiB dict + match finder allocated PER SHARD). */
class XzPerfProbe extends AnyFunSuite {
  test("compress/decode split at shard sizes") {
    val rnd = new scala.util.Random(2)
    val data = Array.fill[Byte](30000)(('a' + rnd.nextInt(20)).toByte)
    def compress(opt: org.tukaani.xz.LZMA2Options): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val z = new org.tukaani.xz.XZOutputStream(buf, opt)
      z.write(data); z.finish(); z.close()
      buf.toByteArray
    }
    for ((name, opt) <- Seq(
      ("preset6-default", new org.tukaani.xz.LZMA2Options(6)),
      ("preset6-64k", { val o = new org.tukaani.xz.LZMA2Options(6)
        o.setDictSize(1 << 16); o }),
      ("preset1-64k", { val o = new org.tukaani.xz.LZMA2Options(1)
        o.setDictSize(1 << 16); o }))) {
      compress(opt) // warm
      val t0 = System.nanoTime()
      var enc: Array[Byte] = null
      for (_ <- 0 until 10) enc = compress(opt)
      val t1 = System.nanoTime()
      var dec: Option[Array[Byte]] = None
      for (_ <- 0 until 10) dec = Xz.decode(enc)
      val t2 = System.nanoTime()
      assert(dec.get.sameElements(data))
      info(f"$name%16s compress=${(t1 - t0) / 1e7}%7.2f ms/shard " +
        f"decode=${(t2 - t1) / 1e7}%7.2f ms/shard")
    }
  }

  test("OUR LZMA encoder vs tukaani: ratio within 1.6x of " +
    "preset 3, decode parity (late r14)") {
    // a jsonl-shaped corpus sample — repeated keys + varying values
    val sb = new StringBuilder
    for (i <- 0 until 2000)
      sb.append(s"""{"id":$i,"label":"cat${i % 7}","lang":"${
        Seq("en", "de", "fr")(i % 3)}","text":"sample body $i with shared phrasing"}\n""")
    val data = sb.toString.getBytes
    def tukaani(preset: Int): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val o = new org.tukaani.xz.LZMA2Options(preset)
      o.setDictSize(1 << 18)
      val z = new org.tukaani.xz.XZOutputStream(buf, o)
      z.write(data); z.finish(); z.close()
      buf.toByteArray
    }
    XzEncode.encode(data) // warm
    val t0 = System.nanoTime()
    var ours: Array[Byte] = null
    for (_ <- 0 until 5) ours = XzEncode.encode(data)
    val t1 = System.nanoTime()
    val t3 = tukaani(3)
    val t6 = tukaani(6)
    info(f"input ${data.length}%d B — ours ${ours.length}%d B, " +
      f"tukaani p3 ${t3.length}%d B, p6 ${t6.length}%d B; " +
      f"our encode ${(t1 - t0) / 5e6}%.1f ms " +
      f"(${data.length * 5e3 / (t1 - t0)}%.1f MB/s)")
    // the greedy single-pass encoder (with rep-match emission but
    // no optimal parse) must stay in the same league as the
    // reference's level 3 — a structural slip like dead probability
    // contexts or a broken rep path would blow far past this bound
    assert(ours.length < t3.length * 1.6,
      s"ratio fell off: ours ${ours.length} vs p3 ${t3.length}")
    assert(Xz.decode(ours).exists(_.sameElements(data)))
  }
}
