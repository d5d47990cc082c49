package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** SQLite file-format pins: the spec's header layout byte for
  * byte, serial-type codec across every value class (incl. the
  * 0/1 constant forms and all int widths), the INTEGER PRIMARY KEY
  * rowid alias, multi-level table b-trees at a small page size,
  * overflow chains (spec local-payload formula both directions —
  * note index pages use a DIFFERENT X than table leaves), WITHOUT
  * ROWID tables both directions (index b-tree in-order walk,
  * PK-first record permutation, pulled-up separators, composite
  * keys), column-name + PRIMARY KEY extraction from CREATE TABLE,
  * zero-row tables, UTF-16 / truncation rejections, cycle guards,
  * and mutation fuzz. */
class SqliteSpec extends AnyFunSuite {

  import Sqlite._

  private def simpleRows(n: Int): Seq[(Long, Seq[Any])] =
    (1 to n).map(i => (i.toLong,
      Seq(i.toLong, s"name$i", if (i % 5 == 0) null else i * 0.5,
        Array.tabulate(i % 7)(j => (i + j).toByte))))

  test("hand-pinned header: magic, page size, encoding, page count") {
    val db = build("t", Seq("id", "s", "x", "b"), simpleRows(3),
      pageSize = 512, ipkColumn = 0)
    assert(new String(db, 0, 15, "ISO-8859-1") == "SQLite format 3")
    assert(db(15) == 0)
    assert(((db(16) & 0xff) << 8 | (db(17) & 0xff)) == 512)
    assert(db.length % 512 == 0)
    // text encoding UTF-8 at offset 56
    assert(db(59) == 1)
    val opened = open(db)
    assert(opened.isDefined && opened.get.pageSize == 512)
  }

  test("round trip: every value class + the rowid alias") {
    val rows = Seq(
      (1L, Seq(1L, "hello", 2.5, Array[Byte](1, 2))),
      (2L, Seq(2L, "", 0.0, Array.emptyByteArray)),
      (3L, Seq(3L, "héllo wörld", -1.0, Array[Byte](-1))),
      (7L, Seq(7L, null, null, null)))
    val db = build("t", Seq("id", "s", "x", "b"), rows,
      pageSize = 512, ipkColumn = 0)
    val ts = tables(db).get
    assert(ts.map(_.name) == Seq("t"))
    assert(ts.head.columns == Seq("id", "s", "x", "b"))
    assert(ts.head.ipkColumn == 0)
    val got = Sqlite.rows(db, "t").get
    assert(got.map(_.rowid) == Seq(1L, 2L, 3L, 7L))
    // the ipk column comes back as the rowid, not NULL
    assert(got.head.values(0) == 1L && got.last.values(0) == 7L)
    assert(got.head.values(1) == "hello")
    assert(got(2).values(1) == "héllo wörld")
    assert(got.head.values(2) == 2.5)
    assert(got(1).values(2) == 0.0) // serial type 8/7 both decode
    assert(got.head.values(3).asInstanceOf[Array[Byte]]
      .sameElements(Array[Byte](1, 2)))
    assert(got.last.values(1) == null)
  }

  test("integer widths: every serial-int form survives") {
    val vals = Seq(0L, 1L, 2L, -1L, 127L, -128L, 128L, 32767L,
      -32768L, 8388607L, -8388608L, 8388608L, Int.MaxValue.toLong,
      Int.MinValue.toLong, 1L << 40, -(1L << 40), Long.MaxValue,
      Long.MinValue)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, Seq(v): Seq[Any]) }
    val db = build("ints", Seq("v"), rows, pageSize = 512)
    val got = Sqlite.rows(db, "ints").get
    assert(got.map(_.values.head) == vals)
  }

  test("multi-level b-tree: thousands of rows at 512-byte pages") {
    val rows = (1 to 3000).map(i =>
      (i.toLong, Seq(s"row-$i-${"x" * (i % 40)}"): Seq[Any]))
    val db = build("big", Seq("s"), rows, pageSize = 512)
    // must have produced interior pages: > 80 pages of data
    assert(db.length / 512 > 80)
    val got = Sqlite.rows(db, "big").get
    assert(got.length == 3000)
    assert(got.map(_.rowid) == (1L to 3000L))
    assert(got(1499).values.head ==
      s"row-1500-${"x" * (1500 % 40)}")
  }

  test("overflow chains: payloads far beyond one page") {
    val big1 = "A" * 5000
    val big2 = ("B" * 1300) + ("C" * 1300) // > 2 overflow pages at 512
    val blob = Array.tabulate(4096)(i => (i * 31).toByte)
    val rows = Seq(
      (1L, Seq(big1, null): Seq[Any]),
      (2L, Seq(big2, blob): Seq[Any]),
      (3L, Seq("small", Array[Byte](9)): Seq[Any]))
    val db = build("of", Seq("s", "b"), rows, pageSize = 512)
    val got = Sqlite.rows(db, "of").get
    assert(got.length == 3)
    assert(got(0).values(0) == big1)
    assert(got(1).values(0) == big2)
    assert(got(1).values(1).asInstanceOf[Array[Byte]]
      .sameElements(blob))
    assert(got(2).values(0) == "small")
  }

  test("zero-row tables and column-name parsing") {
    val db = build("empty", Seq("a", "b"), Seq.empty, pageSize = 512)
    assert(Sqlite.rows(db, "empty").get.isEmpty)
    // ddl parsing shapes
    assert(columnsFromSql(
      "CREATE TABLE t(a INTEGER, b TEXT NOT NULL, c)").get._1 ==
      Seq("a", "b", "c"))
    assert(columnsFromSql(
      """CREATE TABLE "q t"("a b" TEXT, price DECIMAL(10,2),
        |PRIMARY KEY (price))""".stripMargin).get._1 ==
      Seq("a b", "price"))
    val (cols, ipk, pk) = columnsFromSql(
      "CREATE TABLE t(id INTEGER PRIMARY KEY, v TEXT)").get
    assert(cols == Seq("id", "v") && ipk == 0 && pk == Seq(0))
    assert(columnsFromSql("CREATE VIRTUAL TABLE x USING fts5").isEmpty)
    // table-level composite PK, quoted + DESC + case-insensitive
    val (c2, i2, p2) = columnsFromSql(
      """CREATE TABLE t(a TEXT, b INT, c REAL,
        |PRIMARY KEY ("B" DESC, a)) WITHOUT ROWID""".stripMargin).get
    assert(c2 == Seq("a", "b", "c") && i2 == -1 && p2 == Seq(1, 0))
  }

  test("WITHOUT ROWID: round trip, declared-order values, big tree") {
    // composite PK (k2, k1) — stored PK-first, read back declared
    val rows = (1 to 1200).map { i =>
      (0L, Seq(s"v$i" * (i % 5), i.toLong, i * 0.25,
        s"k${1200 - i}"): Seq[Any])
    }
    // key order = (k2 asc): rows must be pre-sorted by the PK —
    // pk columns are (3, 1) = (text k, long id)
    val sorted = rows.sortBy(_._2(3).asInstanceOf[String])
    val db = build("wr", Seq("payload", "id", "x", "k"), sorted,
      pageSize = 512, pkColumns = Seq(3, 1))
    val ts = tables(db).get
    assert(ts.head.withoutRowid && ts.head.pkColumns == Seq(3, 1))
    assert(ts.head.ipkColumn == -1)
    assert(db.length / 512 > 20) // multi-level: separators pulled up
    val got = Sqlite.rows(db, "wr").get
    assert(got.length == 1200)
    // values come back in DECLARED order, key order preserved
    assert(got.map(_.values(3)) ==
      sorted.map(_._2(3)))
    assert(got.map(_.values(1)) == sorted.map(_._2(1)))
    assert(got.map(_.values(0)) == sorted.map(_._2(0)))
    assert(got.map(_.rowid) == (1L to 1200L)) // positional
    // every row of the in-order walk exists exactly once (the
    // pulled-up interior keys are rows too)
    assert(got.map(_.values(1)).toSet == rows.map(_._2(1)).toSet)
  }

  test("WITHOUT ROWID: overflow payloads under the INDEX X formula") {
    // payloads straddling the index maxLocal at 512-byte pages:
    // X_index = (500·64/255)-23 = 102, X_table = 477 — a payload of
    // ~200 bytes overflows on an index page but NOT a table leaf,
    // which is exactly the formula difference worth pinning
    val rows = (1 to 30).map { i =>
      (0L, Seq(s"k%03d".format(i), "p" * (i * 37)): Seq[Any])
    }
    val db = build("ov", Seq("k", "body"), rows, pageSize = 512,
      pkColumns = Seq(0))
    val got = Sqlite.rows(db, "ov").get
    assert(got.length == 30)
    assert(got.map(_.values(1)) == rows.map(_._2(1)))
    // a single giant row (multi-page overflow chain)
    val big = build("big1", Seq("k", "body"),
      Seq((0L, Seq("k", "z" * 5000): Seq[Any])), pageSize = 512,
      pkColumns = Seq(0))
    assert(Sqlite.rows(big, "big1").get.head.values(1) ==
      "z" * 5000)
  }

  test("rejections: UTF-16, truncation, bad magic") {
    val db = build("t", Seq("v"), Seq((1L, Seq("x"): Seq[Any])),
      pageSize = 512)
    assert(tables(db.take(511)).isEmpty)           // truncated
    assert(tables(db ++ Array[Byte](0)).isEmpty)   // not page-aligned
    val badMagic = db.clone(); badMagic(0) = 'X'
    assert(tables(badMagic).isEmpty)
    val utf16 = db.clone(); utf16(59) = 2
    assert(tables(utf16).isEmpty)
    // splice WITHOUT ROWID into the schema sql text
    val db2 = build("t", Seq("v"),
      Seq((1L, Seq("WITHOUT ROWID bait"): Seq[Any])), pageSize = 512)
    assert(Sqlite.rows(db2, "t").isDefined) // data text is NOT ddl
    // a self-referencing interior page must not spin: patch root
    // type to interior pointing at itself via the rightmost pointer
    val loop = db.clone()
    // page 2 is the data root (leaf): make it interior with
    // rightmost pointer to itself, 0 cells
    loop(512) = 5
    loop(512 + 3) = 0; loop(512 + 4) = 0
    loop(512 + 8) = 0; loop(512 + 9) = 0
    loop(512 + 10) = 0; loop(512 + 11) = 2
    assert(Sqlite.rows(loop, "t").isEmpty)
  }

  test("mutation fuzz: corruptions never throw") {
    val base = build("t", Seq("s", "x"),
      (1 to 40).map(i => (i.toLong,
        Seq(s"v$i" * (i % 9), i * 1.5): Seq[Any])), pageSize = 512)
    val rnd = new scala.util.Random(47)
    (0 until 400).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      try { tables(m).foreach(_ => Sqlite.rows(m, "t")) }
      catch { case _: OutOfMemoryError => fail("oom") }
    }
    // the index b-tree walk under the same hammer
    val wr = build("w", Seq("k", "v"),
      (1 to 40).map(i => (0L,
        Seq(f"k$i%03d", s"v$i" * (i % 9)): Seq[Any])),
      pageSize = 512, pkColumns = Seq(0))
    (0 until 400).foreach { _ =>
      val m = wr.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      try { tables(m).foreach(_ => Sqlite.rows(m, "w")) }
      catch { case _: OutOfMemoryError => fail("oom") }
    }
    (0 until 200).foreach { _ =>
      tables(Array.fill(rnd.nextInt(1200))(rnd.nextInt().toByte))
    }
  }

  test("WAL sidecar: committed frames apply over the main image " +
    "(REAL-sqlite fixture) (late r14)") {
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/wal/$name")
      assert(in != null, s"missing resource $name")
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
    val db = res("t.db")
    val wal = res("t.db-wal")
    def facts(rows: Seq[Sqlite.Row]): (Int, Long, Long, Long) = (
      rows.length,
      rows.map(_.values(2).asInstanceOf[Long]).sum,
      rows.map(_.values(0).asInstanceOf[Long]).sum,
      rows.map(_.values(1).asInstanceOf[String].length.toLong).sum)
    // the main image alone: the pre-WAL checkpointed state
    assert(facts(Sqlite.rows(db, "t").get) ==
      ((60, 12810L, 1830L, 513L)))
    // db + wal: both commits applied (inserts, updates, deletes,
    // later frames overriding earlier ones on shared pages) —
    // values pinned from the generating sqlite3 session
    val merged = Sqlite.applyWal(db, wal).getOrElse(
      fail("wal rejected"))
    assert(facts(Sqlite.rows(merged, "t").get) ==
      ((106, 63067L, 6581L, 1003L)))
    // corrupting a frame AFTER the first commit rolls back to the
    // first commit's state — the torn-tail recovery rule
    val pageSize = 512
    val frameSize = 24 + pageSize
    val firstCommit = (0 until (wal.length - 32) / frameSize).find {
      i =>
        val off = 32 + i * frameSize
        ((wal(off + 4) & 0xffL) << 24 | (wal(off + 5) & 0xffL) << 16 |
          (wal(off + 6) & 0xffL) << 8 | (wal(off + 7) & 0xffL)) != 0
    }.getOrElse(fail("no commit frame"))
    val torn = wal.clone()
    val tearAt = 32 + (firstCommit + 1) * frameSize + 40
    torn(tearAt) = (torn(tearAt) ^ 0x2d).toByte
    val mergedMid = Sqlite.applyWal(db, torn).getOrElse(
      fail("torn wal rejected entirely"))
    assert(facts(Sqlite.rows(mergedMid, "t").get) ==
      ((86, 47597L, 4371L, 753L)))
    // a salt flip on the FIRST frame: no committed frames at all —
    // the main image comes back unchanged
    val salted = wal.clone()
    salted(32 + 8) = (salted(32 + 8) ^ 1).toByte
    val unchanged = Sqlite.applyWal(db, salted).get
    assert(facts(Sqlite.rows(unchanged, "t").get) ==
      ((60, 12810L, 1830L, 513L)))
    // header damage rejects; a header-only wal is a no-op
    val badHdr = wal.clone()
    badHdr(25) = (badHdr(25) ^ 0x10).toByte
    assert(Sqlite.applyWal(db, badHdr).isEmpty)
    assert(Sqlite.applyWal(db, wal.take(32)).exists(
      _.sameElements(db)))
    assert(Sqlite.applyWal(db, wal.take(16)).isEmpty)
  }
}
