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
}
