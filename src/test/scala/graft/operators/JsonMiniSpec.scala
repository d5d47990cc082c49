package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The shared minimal JSON reader now sits under four format
  * operators (Avro schemas, safetensors headers, the Delta log,
  * Iceberg metadata) — pin its grammar directly: value shapes,
  * escapes, exact-consumption, the 2^53 long guard, the depth cap,
  * per-line parsing, quoting round trips, and fuzz. */
class JsonMiniSpec extends AnyFunSuite {

  import JsonMini._

  test("value shapes parse to plain Scala") {
    assert(parse("""{"a":1,"b":[true,null,"x"],"c":{"d":-2.5}}""")
      .contains(Map(
        "a" -> 1.0,
        "b" -> Seq(true, null, "x"),
        "c" -> Map("d" -> -2.5))))
    assert(parse("[]").contains(Seq()))
    assert(parse("{}").contains(Map()))
    assert(parse(" 42 ").contains(42.0))
    assert(parse("\"\"").contains(""))
    assert(parse("1e3").contains(1000.0))
  }

  test("escapes decode; quote() round-trips") {
    assert(parse(""""a\"b\\c\/d\n\tA"""").contains(
      "a\"b\\c/d\n\tA"))
    val nasty = "q\"uote \\ back \n nl \t tab  ctl é"
    assert(parse(quote(nasty)).contains(nasty))
  }

  test("exact consumption and malformations reject") {
    assert(parse("{}x").isEmpty)        // trailing bytes
    assert(parse("{\"a\":}").isEmpty)
    assert(parse("{\"a\" 1}").isEmpty)
    assert(parse("[1,]").isEmpty)
    assert(parse("[1 2]").isEmpty)
    assert(parse("\"unterminated").isEmpty)
    assert(parse("tru").isEmpty)
    assert(parse("").isEmpty)
    assert(parse("00x").isEmpty)
    // depth cap: 70 nested arrays reject, 50 pass
    assert(parse("[" * 70 + "]" * 70).isEmpty)
    assert(parse("[" * 50 + "]" * 50).isDefined)
  }

  test("long(): integer tokens are EXACT 64-bit (r14); the 2^53 " +
    "ambiguity bound applies only to Double-sourced values") {
    // pure-integer tokens parse as Long — random iceberg/delta
    // snapshot ids survive at any magnitude
    assert(long(parse("9007199254740992").get)
      .contains(1L << 53))
    assert(long(parse("9007199254740993").get)
      .contains((1L << 53) + 1))
    assert(long(parse(Long.MaxValue.toString).get)
      .contains(Long.MaxValue))
    assert(long(parse(Long.MinValue.toString).get)
      .contains(Long.MinValue))
    assert(long(parse("9007199254740991").get)
      .contains((1L << 53) - 1))
    assert(long(parse("-9007199254740991").get)
      .contains(-((1L << 53) - 1)))
    // beyond 64 bits the token falls back to Double → rejected
    assert(long(parse("92233720368547758080").get).isEmpty)
    // Double-sourced values (caller defaults, fraction/exponent
    // tokens) keep the strict 2^53 ambiguity bound
    assert(long(9007199254740992.0).isEmpty) // exactly 2^53
    assert(long(9007199254740991.0).contains((1L << 53) - 1))
    assert(long(parse("1.5").get).isEmpty)
    assert(long(parse("1e3").get).contains(1000L)) // exponent→Double
    assert(long("nope").isEmpty)
  }

  test("parseLines: blank lines skip, any torn line fails the batch") {
    assert(parseLines("{\"a\":1}\n\n{\"b\":2}\n").contains(Seq(
      Map("a" -> 1.0), Map("b" -> 2.0))))
    assert(parseLines("{\"a\":1}\n{torn").isEmpty)
    assert(parseLines("").contains(Seq()))
  }

  test("fuzz: garbage never throws") {
    val rnd = new scala.util.Random(91)
    val chars = "{}[]\",:0123456789.eE+-truefalsenull\\u \n"
    (0 until 800).foreach { _ =>
      parse(Array.fill(rnd.nextInt(60))(
        chars(rnd.nextInt(chars.length))).mkString)
    }
  }
}
