package graft

import graft.functions.TextFunctions
import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  test("language detection on genuine multilingual samples") {
    assert(TextFunctions.detectLang(
      "the quick brown fox is jumping over the lazy dog and the cat") == "en")
    assert(TextFunctions.detectLang(
      "der schnelle braune fuchs springt über den faulen hund und die katze") == "de")
    assert(TextFunctions.detectLang(
      "le renard brun rapide saute par dessus le chien paresseux et les chats") == "fr")
    assert(TextFunctions.detectLang(
      "el rápido zorro marrón salta sobre el perro perezoso y los gatos") == "es")
    assert(TextFunctions.detectLang("我们的人不是在这个地方他有一个大的") == "zh")
    assert(TextFunctions.detectLang("") == "und")
    assert(TextFunctions.detectLang("zzz qqq xxx") == "und")
  }

  test("ngrams pads word boundaries") {
    assert(TextFunctions.ngrams("ab", 3) == Seq(" ab", "ab "))
    assert(TextFunctions.ngrams("", 3).isEmpty ||
      TextFunctions.ngrams("", 3) == Seq("  "))
  }

  test("multimodal stub decode is deterministic and byte-length driven") {
    val d = Array.fill[Byte](130)(65)
    assert(Multimodal.decodeStub(d) == (1 + 130 % 64, 1 + (130 / 64) % 64))
    assert(Multimodal.decodeStub(Array.emptyByteArray) == (1, 1))
  }

  test("content hash matches the engine char fold for ASCII") {
    // fold: ((0*31 + 'a')*31 + 'b') % P
    val expected = ((0L * 31 + 'a'.toLong) * 31 + 'b'.toLong) % Multimodal.P
    assert(Multimodal.contentHash("ab".getBytes("UTF-8")) == expected)
  }

  test("resize stub: byte-stride downsample to the target payload size") {
    val d = Array.tabulate[Byte](1000)(i => (i % 127).toByte)
    val r = Multimodal.resizeStub(d, 8, 8)
    assert(r.length == 64)
    assert(r(0) == d(0)) // stride sampling keeps the leading byte
    // payloads already below target pass through untouched
    assert(Multimodal.resizeStub(d, 100, 100) sameElements d)
  }
}
