package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** from-raw-bytes parquet and ORC readers — the Columnar slice of the [[Pipeline]]
  * catalog (round-13 split: pure moves out of the former
  * single-file Pipeline.scala; composed back via
  * `object Pipeline extends ...`). */
private[graft] trait PipelineColumnarPart extends Serializable { this: Pipeline.type =>
  /** Parquet footer audit (r12) — the storage-layout readout
    * (operators/ParquetFooter): a 4-file lineitem projection is
    * written by Spark's own parquet-mr path, then OUR from-scratch
    * Thrift-compact footer reader audits every file — per-column
    * value counts summed across files must equal the row count,
    * physical types and codec must be what the writer was
    * configured for, and the file count is pinned by the explicit
    * repartition. A live differential against parquet-mr's
    * serializer, under the DuckDB oracle. */
  /** The shared write-roundtrip fixture shape: per-shard column
    * tuples (name, kind, optional, values) both writer gates map
    * into their own WCol type — one definition, two formats, so
    * the null rotations can never silently diverge between the
    * parquet and ORC twins (they answer to the same oracle). */
  private def writeRoundtripCols(
      docs: Seq[(Long, Long, String, String)])
      : Seq[(String, String, Boolean, IndexedSeq[Option[Any]])] =
    Seq(
      ("doc_id", "i64", false,
        docs.map(d => Some(d._2)).toIndexedSeq),
      ("lang", "string", true,
        docs.map(d => if (d._2 % 11 == 10) None
          else Some(d._3)).toIndexedSeq),
      ("n_chars", "i64", false,
        docs.map(d => Some(d._4.length.toLong)).toIndexedSeq),
      ("flag", "boolean", true,
        docs.map(d => if (d._2 % 7 == 3) None
          else Some(d._2 % 3 == 0)).toIndexedSeq),
      ("score", "f64", false,
        docs.map(d => Some(d._4.length * 0.25)).toIndexedSeq))

  /** The shared RICH-TYPES fixture (ts/day/amt residues) — one
    * definition for both formats' write_rich lanes, same reason as
    * [[writeRoundtripCols]]. docs = (id, n_chars). */
  private def richCols(docs: Seq[(Long, Long)])
      : Seq[(String, String, Boolean, IndexedSeq[Option[Any]])] =
    Seq(
      ("doc_id", "i64", false,
        docs.map(d => Some(d._1): Option[Any]).toIndexedSeq),
      ("ts", "ts", true,
        docs.map { d =>
          if (d._1 % 13 == 2) None
          else Some(((d._1 - 500L) * 86400000000L +
            (d._1 % 7) * 123457L): Any)
        }.toIndexedSeq),
      ("day", "date", true,
        docs.map { d =>
          if (d._1 % 17 == 5) None
          else Some(((18000 + d._1 % 1000 - 400).toInt): Any)
        }.toIndexedSeq),
      ("amt", "decimal(14,3)", true,
        docs.map { d =>
          if (d._1 % 7 == 1) None
          else Some(java.math.BigDecimal.valueOf(
            d._1 * 12345L - d._2, 3): Any)
        }.toIndexedSeq))

  /** [[richCols]]'s truth in DuckDB SQL — one oracle, both
    * formats. */
  private[graft] val RichOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, strlen(text) AS n FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 13 = 2 THEN NULL
      |    ELSE make_timestamp((doc_id - 500) * 86400000000
      |      + (doc_id % 7) * 123457) END AS ts,
      |  CASE WHEN doc_id % 17 = 5 THEN NULL
      |    ELSE CAST(DATE '1970-01-01' + CAST(
      |      18000 + doc_id % 1000 - 400 AS INTEGER)
      |      AS VARCHAR) END AS day,
      |  CASE WHEN doc_id % 7 = 1 THEN NULL
      |    ELSE doc_id * 12345 - n END AS amt_milli
      |FROM d ORDER BY doc_id""".stripMargin

  /** The shared STRUCT + MAP fixture rows (meta / m residues) —
    * one definition for both formats' write_struct lanes.
    * docs = (id, lang, n_chars). */
  private def structMetas(docs: Seq[(Long, String, Int)])
      : IndexedSeq[Option[Seq[Option[Any]]]] =
    docs.map { case (id, lang, n) =>
      if (id % 7 == 3) None
      else Some(Seq(
        Some(n.toLong: Any),
        if (id % 11 == 10) None else Some(lang: Any),
        Some((id % 3 == 0): Any)))
    }.toIndexedSeq

  private def structMaps(docs: Seq[(Long, String, Int)])
      : IndexedSeq[Option[Seq[(Any, Option[Any])]]] =
    docs.map { case (id, _, n) =>
      if (id % 13 == 2) None
      else if (id % 5 == 4) Some(Seq.empty)
      else Some(Seq(
        ("n": Any, if (id % 9 == 8) None else Some(n.toLong: Any)),
        ("id": Any, Some(id: Any))))
    }.toIndexedSeq

  /** [[structMetas]]/[[structMaps]]'s truth in DuckDB SQL (the
    * CASE order mirrors the Scala residue order: %13 before %5). */
  private[graft] val StructOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, strlen(text) AS n FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE n END AS n,
      |  CASE WHEN doc_id % 7 = 3 OR doc_id % 11 = 10 THEN NULL
      |    ELSE lang END AS lang,
      |  CASE WHEN doc_id % 7 = 3 THEN NULL
      |    ELSE CAST(doc_id % 3 = 0 AS BIGINT) END AS flag,
      |  CASE WHEN doc_id % 13 = 2 OR doc_id % 5 = 4
      |      OR doc_id % 9 = 8 THEN NULL
      |    ELSE n END AS m_n,
      |  CASE WHEN doc_id % 13 = 2 OR doc_id % 5 = 4 THEN NULL
      |    ELSE doc_id END AS m_id
      |FROM d ORDER BY doc_id""".stripMargin

  /** Parquet RAW SOURCE (r13): the SAME fixture tree
    * [[parquetWriteRoundtrip]] builds, read back through
    * `sources/ParquetRawSource` — the from-scratch page walker
    * surfaced as a typed DataFrame (the torn-file recovery path) —
    * under the SAME oracle. Three independent readers now answer
    * for these bytes: parquet-mr (the write gate), this source,
    * and the analytic truth. */
  private[graft] def parquetRawSource(s: SparkSession,
      dir: String): DataFrame = {
    // the write gate's fixture builder is idempotent — reuse it
    parquetWriteRoundtrip(s, dir) // ensures the tree exists
    val root = formatFixtureDir(dir, "pqwrite4", "documents")(_ =>
      sys.error("pqwrite4 fixture must already exist"))
    graft.sources.ParquetRawSource.read(s, root)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("flag").cast("long").as("flag"), col("score"))
      .orderBy("doc_id")
  }

  /** Parquet WRITE round trip, BYTE_STREAM_SPLIT + DELTA_BYTE_ARRAY
    * (late r14): shard files whose FLOAT/DOUBLE columns are
    * byte-plane split (encoding 9) and whose url column is
    * shared-prefix delta-coded (encoding 7) — the last two value
    * encodings [[graft.operators.ParquetData]] decodes that the
    * writer could not emit. Read back through
    * [[graft.sources.ParquetRawSource]] (the from-scratch walker);
    * ParquetWriteSpec covers the parquet-mr ROW-reader path too
    * (Spark's vectorized reader has no BYTE_STREAM_SPLIT decoder —
    * the one bundled-reader gap, and exactly why the raw source is
    * the gate's read path here). Every value recomputed
    * analytically by the oracle. */
  private[graft] def parquetWriteSplit(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.WCol
    val root = formatFixtureDir(dir, "pqsplit2", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols: Seq[ParquetWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2)).toIndexedSeq),
            // n/4 and n·1.5 are exact in binary — the oracle
            // recomputes the identical bits
            WCol("score", "f32", optional = true,
              docs.map(d => if (d._2 % 9 == 5) None
                else Some(d._4.length / 4f)).toIndexedSeq),
            WCol("measure", "f64", optional = false,
              docs.map(d => Some(d._4.length * 1.5d)).toIndexedSeq),
            // shared URL prefixes: the DELTA_BYTE_ARRAY sweet spot
            WCol("url", "string", optional = true,
              docs.map(d => if (d._2 % 13 == 7) None
                else Some(s"https://corpus.example/${d._3}/doc-${d._2}"))
                .toIndexedSeq))
          val codec = Seq("uncompressed", "snappy", "gzip", "zstd")(
            (sid % 4).toInt)
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            ParquetWrite.build(cols, codec,
              pageVersion = 1 + (sid % 2).toInt,
              split = Set("score", "measure"),
              deltaStr = Set("url")))
          sid
        }.count(): Unit
    }
    graft.sources.ParquetRawSource.read(s, root)
      .select(col("doc_id"), col("score"), col("measure"), col("url"))
      .orderBy("doc_id")
  }

  /** ORC WRITE round trip (r13): the [[parquetWriteRoundtrip]]
    * story for the other columnar format — per-shard files emitted
    * by OUR from-scratch ORC writer (operators/OrcWrite — protobuf
    * tail, byte-RLE bitmaps, RLEv1 runs, zlib chunk framing; codec
    * and stripe split rotating by shard) on executors, read back
    * by SPARK'S OWN orc-core path under the same documents
    * oracle. */
  private[graft] def orcWriteRoundtrip(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.OrcWrite
    import graft.operators.OrcWrite.WCol
    val root = formatFixtureDir(dir, "orcwrite4", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols = writeRoundtripCols(docs).map {
            case (n, k, o, vs) => WCol(n, k, o, vs) }
          val codec = if (sid % 2 == 0) "zlib" else "none"
          val rps = if ((sid / 2) % 2 == 0) Int.MaxValue else 3
          // r14: integer RLEv2 (orc-core's default) and DICTIONARY
          // strings rotate in beside the v1/DIRECT shards; late
          // r14: BLOOM_FILTER_UTF8 streams ride along on odd
          // shards (presence transparent; consumption pinned in
          // OrcWriteSpec)
          val rle = if ((sid / 4) % 2 == 0) "v1" else "v2"
          val dict: Set[String] =
            if (sid % 3 == 0) Set("lang") else Set.empty
          val blooms: Set[String] =
            if (sid % 2 == 1) Set("lang", "doc_id") else Set.empty
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.orc"),
            OrcWrite.build(cols, codec, rps, rle, dict, blooms))
          sid
        }.count(): Unit
    }
    spark.read.orc(root)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("flag").cast("long").as("flag"), col("score"))
      .orderBy("doc_id")
  }

  /** ORC WRITE round trip, RICH TYPES (r14): timestamp (micros,
    * incl. pre-1970 sub-second values — the truncate-toward-zero
    * writer quirk orc-core's readers compensate), date and
    * decimal(14,3) columns emitted by OUR writer under rotating
    * codec/RLE-version/stripe splits, read back by orc-core. The
    * oracle recomputes each value analytically (timestamps as
    * make_timestamp micros, decimals surfaced as unscaled
    * BIGINT so the compare is representation-free). */
  private[graft] def orcWriteRich(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.OrcWrite
    import graft.operators.OrcWrite.WCol
    val root = formatFixtureDir(dir, "orcrich3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id / 8, id, t.length.toLong) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, Long)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols = richCols(docs.map(d => (d._2, d._3))).map {
            case (n, k, o, vs) => WCol(n, k, o, vs) }
          val codec = Seq("zlib", "none", "snappy")((sid % 3).toInt)
          val rle = if (sid % 2 == 0) "v2" else "v1"
          val rps = if ((sid / 2) % 2 == 0) Int.MaxValue else 3
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.orc"),
            OrcWrite.build(cols, codec, rps, rle))
          sid
        }.count(): Unit
    }
    spark.read.orc(root)
      .select(col("doc_id"), col("ts"),
        col("day").cast("string").as("day"),
        (col("amt") * 1000).cast("long").as("amt_milli"))
      .orderBy("doc_id")
  }

  /** Parquet WRITE round trip, RICH TYPES (late r14): the
    * [[orcWriteRich]] fixture for the other columnar format —
    * timestamp (INT64 + TIMESTAMP_MICROS, incl. pre-1970 values),
    * date (INT32 + DATE) and decimal(14,3) (INT64 + DECIMAL)
    * columns emitted by OUR parquet writer under rotating
    * codec/row-group splits, read back by parquet-mr. SAME
    * analytic oracle as the ORC twin — both formats' logical-type
    * write paths answer to one truth. */
  private[graft] def parquetWriteRich(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.WCol
    val root = formatFixtureDir(dir, "pqrich3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id / 8, id, t.length.toLong) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, Long)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols = richCols(docs.map(d => (d._2, d._3))).map {
            case (n, k, o, vs) => WCol(n, k, o, vs) }
          val codec = Seq("uncompressed", "snappy", "gzip", "zstd")(
            (sid % 4).toInt)
          val rpg = if ((sid / 4) % 2 == 0) Int.MaxValue else 3
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            ParquetWrite.build(cols, codec, rowsPerGroup = rpg))
          sid
        }.count(): Unit
    }
    spark.read.parquet(root)
      .select(col("doc_id"), col("ts"),
        col("day").cast("string").as("day"),
        (col("amt") * 1000).cast("long").as("amt_milli"))
      .orderBy("doc_id")
  }

  /** ORC WRITE round trip, NESTED + DICTIONARY (r14): the
    * [[parquetWriteNested]] story for the other columnar format —
    * shard files carrying a DICTIONARY(_V2) string column and a
    * LIST<i64> token column (parent PRESENT + LENGTH runs, child
    * column; null list / empty list / null element all rotated),
    * emitted by OUR ORC writer with codec/RLE-version rotation,
    * read back by orc-core. SAME analytic oracle as the parquet
    * twin — the two formats' nested write paths answer to one
    * truth. */
  private[graft] def orcWriteNested(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.OrcWrite
    import graft.operators.OrcWrite.{WCol, WListCol}
    val root = formatFixtureDir(dir, "orcnested3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val toks: IndexedSeq[Option[Seq[Option[Any]]]] =
            docs.map { d =>
              val id = d._2
              if (id % 7 == 3) None
              else if (id % 5 == 4) Some(Seq.empty)
              else Some(Seq(
                Some(id: Any),
                if (id % 3 == 1) None
                else Some(d._4.length.toLong: Any),
                Some((id % 10): Any)))
            }.toIndexedSeq
          val cols: Seq[OrcWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2): Option[Any]).toIndexedSeq),
            WCol("lang", "string", optional = true,
              docs.map(d => if (d._2 % 11 == 10) None
                else Some(d._3): Option[Any]).toIndexedSeq),
            WListCol("toks", "i64", optional = true,
              elemOptional = true, toks))
          val codec = Seq("zlib", "none", "snappy")((sid % 3).toInt)
          val rle = if (sid % 2 == 0) "v2" else "v1"
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.orc"),
            OrcWrite.build(cols, codec, Int.MaxValue, rle,
              dict = Set("lang")))
          sid
        }.count(): Unit
    }
    spark.read.orc(root)
      .select(col("doc_id"), col("lang"),
        when(col("toks").isNull, lit(-1L))
          .otherwise(size(col("toks")).cast("long")).as("n_toks"),
        expr("aggregate(filter(toks, x -> x is not null), " +
          "0L, (a, x) -> a + x)").as("tok_sum"))
      .orderBy("doc_id")
  }

  /** Parquet WRITE round trip, STRUCT + MAP columns (late r14):
    * shard files carrying a flat `meta{n i64, lang string?, flag
    * bool}` struct column (null struct / null field rotated by
    * doc_id residue) AND a map<string,i64> column (3-level
    * key_value repetition, two leaves sharing one rep structure)
    * emitted by OUR writer, read back by parquet-mr. SAME analytic
    * oracle as [[orcWriteStruct]] — both formats' nested write
    * paths answer to one truth; null structs surface as all-null
    * fields, map probes via element_at. */
  private[graft] def parquetWriteStruct(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.{WCol, WStructCol, WMapCol}
    val root = formatFixtureDir(dir, "pqstruct4", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t.length) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, Int)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val triples = docs.map(d => (d._2, d._3, d._4))
          val metas = structMetas(triples)
          val maps = structMaps(triples)
          val cols: Seq[ParquetWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2): Option[Any]).toIndexedSeq),
            WStructCol("meta", optional = true,
              fields = Seq(("n", "i64", false),
                ("lang", "string", true), ("flag", "boolean", false)),
              values = metas),
            WMapCol("m", "string", "i64", optional = true,
              valueOptional = true, values = maps))
          val codec = Seq("uncompressed", "snappy", "gzip", "zstd")(
            (sid % 4).toInt)
          val rpg = if ((sid / 4) % 2 == 0) Int.MaxValue else 5
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            ParquetWrite.build(cols, codec, rowsPerGroup = rpg))
          sid
        }.count(): Unit
    }
    spark.read.parquet(root)
      .select(col("doc_id"), col("meta.n").as("n"),
        col("meta.lang").as("lang"),
        col("meta.flag").cast("long").as("flag"),
        element_at(col("m"), "n").as("m_n"),
        element_at(col("m"), "id").as("m_id"))
      .orderBy("doc_id")
  }

  /** ORC WRITE round trip, STRUCT + MAP columns (late r14): the
    * [[parquetWriteStruct]] story for the other columnar format,
    * plus a map<string,i64> column (LENGTH runs + key/value
    * children) probed via element_at. The struct fields answer to
    * the SAME analytic truth as the parquet twin. */
  private[graft] def orcWriteStruct(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.OrcWrite
    import graft.operators.OrcWrite.{WCol, WStructCol, WMapCol}
    val root = formatFixtureDir(dir, "orcstruct3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t.length) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, Int)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val triples = docs.map(d => (d._2, d._3, d._4))
          val metas = structMetas(triples)
          val maps = structMaps(triples)
          val cols: Seq[OrcWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2): Option[Any]).toIndexedSeq),
            WStructCol("meta", optional = true,
              fields = Seq(("n", "i64", false),
                ("lang", "string", true), ("flag", "boolean", false)),
              values = metas),
            WMapCol("m", "string", "i64", optional = true,
              valueOptional = true, values = maps))
          val codec = Seq("zlib", "none", "snappy")((sid % 3).toInt)
          val rle = if (sid % 2 == 0) "v2" else "v1"
          val rps = if ((sid / 2) % 2 == 0) Int.MaxValue else 5
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.orc"),
            OrcWrite.build(cols, codec, rps, rle))
          sid
        }.count(): Unit
    }
    spark.read.orc(root)
      .select(col("doc_id"), col("meta.n").as("n"),
        col("meta.lang").as("lang"),
        col("meta.flag").cast("long").as("flag"),
        // map probes: element_at gives NULL for absent key, null
        // value and null map alike — the oracle mirrors that
        element_at(col("m"), "n").as("m_n"),
        element_at(col("m"), "id").as("m_id"))
      .orderBy("doc_id")
  }

  /** Parquet WRITE round trip, LIST<STRUCT> (late r14): shard
    * files carrying an `anns list<struct{pos i64, tag string?}>`
    * column — the token-annotation shape — with null list / empty
    * list / null element / null field all rotated by doc_id
    * residue, emitted by OUR writer (one chunk per struct field,
    * all sharing one repetition structure), read back by
    * parquet-mr. The oracle recomputes size / pos-sum / null-tag
    * count analytically; SAME truth as [[orcWriteDeep]]. */
  private[graft] def parquetWriteDeep(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.{WCol, WListStructCol}
    val root = formatFixtureDir(dir, "pqdeep3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"))
        .as[(Long, String)]
        .map { case (id, lang) => (id / 8, id, lang) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols: Seq[ParquetWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2): Option[Any]).toIndexedSeq),
            WListStructCol("anns", optional = true,
              elemOptional = true,
              fields = Seq(("pos", "i64", false),
                ("tag", "string", true)),
              values = docs.map(d =>
                deepAnns(d._2, d._3)).toIndexedSeq))
          val codec = Seq("uncompressed", "snappy", "gzip", "zstd")(
            (sid % 4).toInt)
          val rpg = if ((sid / 4) % 2 == 0) Int.MaxValue else 5
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            ParquetWrite.build(cols, codec, rowsPerGroup = rpg))
          sid
        }.count(): Unit
    }
    deepProbe(spark.read.parquet(root))
  }

  /** The [[deepAnns]]/[[deepProbe]] truth in DuckDB SQL — one
    * oracle for BOTH formats' list<struct> write lanes. */
  private[graft] val DeepOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 3 THEN -1
      |    WHEN doc_id % 5 = 4 THEN 0 ELSE 3 END AS n_anns,
      |  CASE WHEN doc_id % 7 = 3 THEN -1
      |    WHEN doc_id % 5 = 4 THEN 0 ELSE
      |      (CASE WHEN (doc_id + 0) % 11 <> 10
      |         THEN doc_id * 10 + 0 ELSE 0 END
      |     + CASE WHEN (doc_id + 1) % 11 <> 10
      |         THEN doc_id * 10 + 1 ELSE 0 END
      |     + CASE WHEN (doc_id + 2) % 11 <> 10
      |         THEN doc_id * 10 + 2 ELSE 0 END) END AS pos_sum,
      |  CASE WHEN doc_id % 7 = 3 THEN -1
      |    WHEN doc_id % 5 = 4 THEN 0 ELSE
      |      (CASE WHEN (doc_id + 0) % 11 <> 10
      |         AND (doc_id + 0) % 4 = 3 THEN 1 ELSE 0 END
      |     + CASE WHEN (doc_id + 1) % 11 <> 10
      |         AND (doc_id + 1) % 4 = 3 THEN 1 ELSE 0 END
      |     + CASE WHEN (doc_id + 2) % 11 <> 10
      |         AND (doc_id + 2) % 4 = 3 THEN 1 ELSE 0 END)
      |    END AS null_tags
      |FROM d ORDER BY doc_id""".stripMargin

  /** The shared list<struct> fixture row: null list / empty list /
    * 3 annotations with null-element and null-tag rotation. */
  private[graft] def deepAnns(id: Long, lang: String)
      : Option[Seq[Option[Seq[Option[Any]]]]] =
    if (id % 7 == 3) None
    else if (id % 5 == 4) Some(Seq.empty)
    else Some((0 until 3).map { j =>
      if ((id + j) % 11 == 10) None
      else Some(Seq(
        Some((id * 10 + j): Any),
        if ((id + j) % 4 == 3) None else Some(lang: Any)))
    })

  /** The shared list<struct> read-back probe (both formats answer
    * the same oracle through it). */
  private[graft] def deepProbe(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      when(col("anns").isNull, lit(-1L))
        .otherwise(size(col("anns")).cast("long")).as("n_anns"),
      when(col("anns").isNull, lit(-1L))
        .otherwise(expr("aggregate(filter(anns, x -> x is not " +
          "null), 0L, (a, x) -> a + x.pos)")).as("pos_sum"),
      when(col("anns").isNull, lit(-1L))
        .otherwise(expr("cast(size(filter(anns, x -> x is not " +
          "null and x.tag is null)) as long)")).as("null_tags"))
      .orderBy("doc_id")

  /** ORC WRITE round trip, LIST<STRUCT> (late r14): the
    * [[parquetWriteDeep]] fixture through OUR ORC writer — list
    * PRESENT + LENGTH runs, a present-gated STRUCT child, field
    * columns over non-null elements — read back by orc-core under
    * the SAME analytic oracle. */
  private[graft] def orcWriteDeep(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.OrcWrite
    import graft.operators.OrcWrite.{WCol, WListStructCol}
    val root = formatFixtureDir(dir, "orcdeep3", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"))
        .as[(Long, String)]
        .map { case (id, lang) => (id / 8, id, lang) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols: Seq[OrcWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2): Option[Any]).toIndexedSeq),
            WListStructCol("anns", optional = true,
              elemOptional = true,
              fields = Seq(("pos", "i64", false),
                ("tag", "string", true)),
              values = docs.map(d =>
                deepAnns(d._2, d._3)).toIndexedSeq))
          val codec = Seq("zlib", "none", "snappy")((sid % 3).toInt)
          val rle = if (sid % 2 == 0) "v2" else "v1"
          val rps = if ((sid / 2) % 2 == 0) Int.MaxValue else 5
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.orc"),
            OrcWrite.build(cols, codec, rps, rle))
          sid
        }.count(): Unit
    }
    deepProbe(spark.read.orc(root))
  }

  /** Parquet WRITE round trip (r13): per-shard files emitted by
    * OUR from-scratch writer (operators/ParquetWrite — Thrift
    * compact footer, PLAIN v1 pages, RLE def levels, codec
    * rotating uncompressed/snappy/gzip by shard) on executors,
    * then read back by SPARK'S OWN parquet-mr path — a live
    * in-gate differential on the write direction; the oracle
    * recomputes every fact from documents, so a footer framing,
    * level run, value encoding or codec bug flips the hash. */
  private[graft] def parquetWriteRoundtrip(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.WCol
    val root = formatFixtureDir(dir, "pqwrite4", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val cols = writeRoundtripCols(docs).map {
            case (n, k, o, vs) => WCol(n, k, o, vs) }
          val codec = Seq("uncompressed", "snappy", "gzip")(
            (sid % 3).toInt)
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            // late r14: split-block bloom filters ride along on
            // odd shards (presence must stay transparent to every
            // reader; consumption is pinned in ParquetWriteSpec)
            ParquetWrite.build(cols, codec,
              bloom = if (sid % 2 == 1) Set("lang", "doc_id")
                else Set.empty))
          sid
        }.count(): Unit
    }
    spark.read.parquet(root)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        // nullable BOOLEAN stringifies differently across the two
        // compare paths; surface it as nullable BIGINT (the file
        // itself still carries the boolean column + def levels)
        col("flag").cast("long").as("flag"), col("score"))
      .orderBy("doc_id")
  }

  /** Parquet WRITE round trip, NESTED + DICTIONARY (r14): shard
    * files carrying an RLE/bit-packed DICTIONARY string column
    * (`lang`) and a 3-level list<int64> column (`toks` — null list
    * / empty list / null element all rotated in by doc_id residue)
    * emitted by OUR writer on executors, read back by parquet-mr.
    * This is the corpus's dominant physical layout (dict-encoded
    * low-cardinality strings + token lists) — the r13 writer could
    * only emit flat PLAIN, so the audit surface was read-only for
    * exactly these shapes. The oracle recomputes list size and
    * element sum analytically from documents. */
  private[graft] def parquetWriteNested(s: SparkSession,
      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetWrite
    import graft.operators.ParquetWrite.{WCol, WListCol}
    val root = formatFixtureDir(dir, "pqnested4", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, t) => (id / 8, id, lang, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, String, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          val toks: IndexedSeq[Option[Seq[Option[Any]]]] =
            docs.map { d =>
              val id = d._2
              if (id % 7 == 3) None
              else if (id % 5 == 4) Some(Seq.empty)
              else Some(Seq(
                Some(id: Any),
                if (id % 3 == 1) None
                else Some(d._4.length.toLong: Any),
                Some((id % 10): Any)))
            }.toIndexedSeq
          val cols: Seq[ParquetWrite.AnyWCol] = Seq(
            WCol("doc_id", "i64", optional = false,
              docs.map(d => Some(d._2)).toIndexedSeq),
            WCol("lang", "string", optional = true,
              docs.map(d => if (d._2 % 11 == 10) None
                else Some(d._3)).toIndexedSeq),
            WListCol("toks", "i64", optional = true,
              elemOptional = true, toks))
          val codec = Seq("uncompressed", "snappy", "gzip", "zstd")(
            (sid % 4).toInt)
          // odd shards split into 3-row ROW GROUPS (r14) so the
          // multi-group footer shape stays gate-live; every 4th
          // pair rotates DATA_PAGE_V2 + DELTA doc_ids (late r14)
          val rpg = if (sid % 2 == 1) 3 else Int.MaxValue
          val pv = if ((sid / 2) % 2 == 1) 2 else 1
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.parquet"),
            ParquetWrite.build(cols, codec, dict = Set("lang"),
              rowsPerGroup = rpg, pageVersion = pv,
              delta = if (pv == 2) Set("doc_id") else Set.empty))
          sid
        }.count(): Unit
    }
    spark.read.parquet(root)
      .select(col("doc_id"), col("lang"),
        when(col("toks").isNull, lit(-1L))
          .otherwise(size(col("toks")).cast("long")).as("n_toks"),
        expr("aggregate(filter(toks, x -> x is not null), " +
          "0L, (a, x) -> a + x)").as("tok_sum"))
      .orderBy("doc_id")
  }

  /** Parquet RAW SOURCE, NESTED + PROJECTED (r14): the SAME
    * [[parquetWriteNested]] tree read back through
    * `sources/ParquetRawSource` with a PROJECTION (doc_id, toks) —
    * the from-scratch page walker surfacing a real ArrayType
    * column while the dictionary `lang` chunks are never decoded
    * (the decode-counter spec pins that). Three independent
    * readers again answer for these nested bytes. */
  private[graft] def parquetRawNested(s: SparkSession,
      dir: String): DataFrame = {
    parquetWriteNested(s, dir) // ensures the tree exists
    val root = formatFixtureDir(dir, "pqnested4", "documents")(_ =>
      sys.error("pqnested4 fixture must already exist"))
    graft.sources.ParquetRawSource
      .read(s, root, columns = Seq("doc_id", "toks"))
      .select(col("doc_id"),
        when(col("toks").isNull, lit(-1L))
          .otherwise(size(col("toks")).cast("long")).as("n_toks"),
        expr("aggregate(filter(toks, x -> x is not null), " +
          "0L, (a, x) -> a + x)").as("tok_sum"))
      .orderBy("doc_id")
  }

  private[graft] def parquetFooter(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "pqfooter", "lineitem") { out =>
      Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
        .repartition(4)
        .write.parquet(s"$out/t")
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(s"$root/t")
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val f = graft.operators.ParquetFooter.parse(bytes)
          .getOrElse(sys.error(s"footer rejected: $path"))
        require(f.rowGroups.map(_.numRows).sum == f.numRows,
          s"row-group rows disagree with numRows in $path")
        f.rowGroups.flatMap(_.columns).map { c =>
          (c.path,
            c.numValues,
            graft.operators.ParquetFooter.CodecNames(c.codecId),
            graft.operators.ParquetFooter.TypeNames(c.typeId))
        }
      }
      .toDF("col_name", "n_values", "codec", "ptype")
      .groupBy("col_name", "codec", "ptype")
      .agg(sum(col("n_values")).as("total_values"))
      .select(col("col_name"), col("total_values"), col("codec"),
        col("ptype"))
      .orderBy("col_name")
  }
  /** Parquet PAGE INDEX audit (r12) — the pruning surface a 100 TB
    * scan planner reads before touching any data page: OUR compact-
    * thrift readers walk the OffsetIndex (page locations, first-row
    * indexes) and ColumnIndex (per-page PLAIN min/max bounds, null
    * counts) of a file written with an exact 5000-row page limit,
    * and every fact is VALUE-transparent — page counts are
    * analytically ceil(rows/5000) (the row limit binds long before
    * the 1 MiB size limit on these narrow columns), the decoded
    * bound bytes must reproduce the table's true min/max, and the
    * offset-index row spans must tile the row group exactly. A slip
    * anywhere — field ids, zigzag, bool-list elements, PLAIN bound
    * decode — flips the hash. */
  private[graft] def parquetPageIndex(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "pqpageidx", "lineitem") { out =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity")
        .coalesce(1)
        .write.option("parquet.page.row.count.limit", 5000)
        .parquet(s"$out/t")
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(s"$root/t")
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        import graft.operators.ParquetFooter
        val f = ParquetFooter.parse(bytes)
          .getOrElse(sys.error(s"footer rejected: $path"))
        f.rowGroups.flatMap { rg =>
          rg.columns.map { c =>
            val pages = ParquetFooter.parseOffsetIndex(bytes,
              c.offsetIndex.getOrElse(sys.error(
                s"no offset index for ${c.path}"))).getOrElse(
              sys.error(s"offset index rejected for ${c.path}"))
            // page row spans must tile the row group
            val spans = pages.map(_.firstRow) :+ rg.numRows
            val rows = spans.sliding(2).map {
              case Seq(a, b) => b - a
              case _ => 0L
            }.sum
            val ci = ParquetFooter.parseColumnIndex(bytes,
              c.columnIndex.getOrElse(sys.error(
                s"no column index for ${c.path}"))).getOrElse(
              sys.error(s"column index rejected for ${c.path}"))
            require(ci.nullPages.length == pages.length,
              s"page count disagreement for ${c.path}")
            val (vmin, vmax) =
              if (ParquetFooter.TypeNames(c.typeId) == "INT64")
                (ci.minValues.flatMap(ParquetFooter.boundI64)
                  .min.toDouble,
                  ci.maxValues.flatMap(ParquetFooter.boundI64)
                    .max.toDouble)
              else
                (ci.minValues.flatMap(ParquetFooter.boundF64).min,
                  ci.maxValues.flatMap(ParquetFooter.boundF64).max)
            (c.path, pages.length.toLong, rows, vmin, vmax,
              ci.nullCounts.map(_.sum).getOrElse(-1L))
          }
        }
      }
      .toDF("col_name", "n_pages", "total_rows", "vmin", "vmax",
        "null_sum")
      .groupBy("col_name")
      .agg(sum("n_pages").as("n_pages"),
        sum("total_rows").as("total_rows"),
        min("vmin").as("vmin"), max("vmax").as("vmax"),
        sum("null_sum").as("null_sum"))
      .orderBy("col_name")
  }
  /** Parquet SPLIT-BLOCK BLOOM probe (r12) — the skip-scan gate a
    * point-lookup join uses at 100 TB: OUR reader locates the
    * filter via ColumnMetaData.bloom_filter_offset, parses the
    * header with the same compact walker, and probes the 256-bit
    * block bitset with the spec's eight salted lanes over xxHash64
    * of the PLAIN value encoding (shared with the zstd frame
    * checksum kernel). Every supplier key and name probed MUST hit
    * — the oracle counts them — so a wrong salt, lane, block pick
    * or hash flips the result; the false-positive differential
    * lives in ParquetFooterSpec, bit-exact vs parquet-mr's own
    * BlockSplitBloomFilter. The filter bytes broadcast to the
    * probe side as a plan-visible literal, never a shuffle. */
  private[graft] def parquetBloomProbe(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.ParquetFooter
    val root = formatFixtureDir(dir, "pqbloom", "supplier") { out =>
      Tables.supplier(s, dir)
        .select("s_suppkey", "s_name")
        .coalesce(1)
        .write
        .option("parquet.bloom.filter.enabled#s_suppkey", "true")
        .option("parquet.bloom.filter.enabled#s_name", "true")
        .parquet(s"$out/t")
    }
    // one part file by construction: its blooms are dimension-sized
    // driver state, broadcast into the distributed probe below
    val file = new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    val footer = ParquetFooter.parse(bytes)
      .getOrElse(sys.error("footer rejected"))
    def bloomFor(col: String): ParquetFooter.BloomBits = {
      val c = footer.rowGroups.head.columns.find(_.path == col)
        .getOrElse(sys.error(s"no column $col"))
      ParquetFooter.parseBloom(bytes, c.bloomOffset.getOrElse(
        sys.error(s"no bloom for $col"))).getOrElse(
        sys.error(s"bloom rejected for $col"))
    }
    val keyBloom = s.sparkContext.broadcast(bloomFor("s_suppkey"))
    val nameBloom = s.sparkContext.broadcast(bloomFor("s_name"))
    Tables.supplier(s, dir)
      .select("s_suppkey", "s_name").as[(Long, String)]
      .map { case (k, n) =>
        (k % 8,
          if (keyBloom.value.mightContain(
            ParquetFooter.bloomHashLong(k))) 1L else 0L,
          if (nameBloom.value.mightContain(
            ParquetFooter.bloomHashBinary(
              n.getBytes("UTF-8")))) 1L else 0L)
      }
      .toDF("bucket", "key_hit", "name_hit")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_probed"),
        sum("key_hit").as("n_key_found"),
        sum("name_hit").as("n_name_found"))
      .orderBy("bucket")
  }
  /** ORC tail audit (r12) — [[graft.operators.OrcTail]]'s
    * from-scratch PostScript→Footer walk over a REAL Spark-written
    * ORC file (zstd chunked streams decoded by OUR codec), every
    * fact value-level: per-column non-null counts, hasNull flags,
    * and the typed min/max/sum statistics must reproduce the
    * table's true aggregates. One row per audited column with the
    * stat family matching its ORC type (int/double/string). */
  private[graft] def orcFooter(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "orcfooter", "lineitem") { out =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .coalesce(1)
        .write.option("compression", "zstd").orc(s"$out/t")
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.orc").load(s"$root/t")
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        import graft.operators.OrcTail
        val t = OrcTail.parseTail(bytes)
          .getOrElse(sys.error(s"orc tail rejected: $path"))
        require(t.compressionName == "ZSTD", "fixture codec")
        require(t.stripes.map(_.numRows).sum == t.numRows,
          "stripe rows disagree with numRows")
        val root = t.types.head
        root.fieldNames.zip(root.subtypes).map { case (nm, ix) =>
          val st = t.fileStats(ix)
          (nm, st.numValues, st.hasNull.getOrElse(true),
            st.ints.flatMap(_.min), st.ints.flatMap(_.max),
            st.ints.flatMap(_.sum),
            st.dbls.flatMap(_.min), st.dbls.flatMap(_.max),
            st.strs.flatMap(_.min), st.strs.flatMap(_.max))
        }
      }
      .toDF("col_name", "n_values", "has_null", "imin", "imax",
        "isum", "dmin", "dmax", "smin", "smax")
      .orderBy("col_name")
  }
  /** ORC row-index audit (r12) — the sub-stripe pruning grain: OUR
    * reader walks stripe footer stream directories to the
    * ROW_INDEX stream and decodes one RowIndexEntry per 1000-row
    * group. The fixture sorts a UNIQUE key so every group's
    * min/max/count is analytic — the oracle recomputes them from
    * row_number arithmetic, making the whole chain (chunked-stream
    * decode, stream-offset walk, packed-position parse, zigzag
    * stats) value-transparent. */
  private[graft] def orcRowIndex(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "orcrowidx", "lineitem") { out =>
      Tables.lineitem(s, dir)
        .selectExpr("l_orderkey * 10 + l_linenumber AS sk")
        .coalesce(1)
        .sortWithinPartitions("sk")
        .write.option("compression", "zstd")
        .option("orc.row.index.stride", "1000")
        .orc(s"$out/t")
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.orc").load(s"$root/t")
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        import graft.operators.OrcTail
        val t = OrcTail.parseTail(bytes)
          .getOrElse(sys.error(s"orc tail rejected: $path"))
        require(t.rowIndexStride == 1000, "stride option lost")
        require(t.stripes.length == 1,
          s"row-group oracle needs one stripe, got ${t.stripes.length}")
        val stripe = t.stripes.head
        val sf = OrcTail.parseStripeFooter(bytes, stripe,
          t.compression, t.blockSize)
          .getOrElse(sys.error("stripe footer rejected"))
        val skCol = t.types.head.subtypes(
          t.types.head.fieldNames.indexOf("sk"))
        val entries = OrcTail.readRowIndex(bytes, stripe, sf, skCol,
          t.compression, t.blockSize)
          .getOrElse(sys.error("row index rejected"))
        entries.zipWithIndex.map { case (e, g) =>
          require(e.positions.nonEmpty, "row-group positions missing")
          val st = e.stats.getOrElse(
            sys.error(s"row group $g has no stats"))
          val is = st.ints.getOrElse(
            sys.error(s"row group $g has no int stats"))
          (g.toLong, st.numValues,
            is.min.getOrElse(sys.error("no min")),
            is.max.getOrElse(sys.error("no max")))
        }
      }
      .toDF("grp", "n", "vmin", "vmax")
      .orderBy("grp")
  }
  /** Parquet DATA-PAGE decode from raw bytes (r12): the driver's
    * own parquet-cpp-written lineitem file read end to end by OUR
    * page walker — footer → dictionary pages → RLE/bit-packed
    * hybrid → PLAIN/dictionary values, snappy inflated in place —
    * with COLUMN PRUNING in our own reader (only the four needed
    * column chunks are touched). The oracle aggregates the same
    * table through DuckDB's reader, so any framing, codec, level or
    * value bug flips the hash. Scale: a per-file flatMap like every
    * container walk here; per-column-chunk decode is the unit a
    * 1000-executor audit would parallelize on. */
  private[graft] def parquetDataDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/lineitem.parquet")
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        import graft.operators.{ParquetData => PD,
          ParquetFooter => PF}
        val footer = PF.parse(bytes).getOrElse(
          sys.error("parquet footer unparseable"))
        val leaves = PD.flatLeaves(footer).getOrElse(
          sys.error("nested schema"))
        def colVals(name: String): IndexedSeq[Option[Any]] = {
          val li = leaves.indexWhere(_.name == name)
          require(li >= 0, s"missing column $name")
          footer.rowGroups.flatMap { rg =>
            val cm = rg.columns.find(_.path == name).getOrElse(
              sys.error(s"row group without $name"))
            PD.decodeColumn(bytes, cm, leaves(li)).getOrElse(
              sys.error(s"data pages of $name do not decode"))
          }.toIndexedSeq
        }
        def asLong(v: Any): Long = v match {
          case i: Int => i.toLong
          case l: Long => l
          case other => sys.error(s"not an int column: $other")
        }
        val ok = colVals("l_orderkey")
        val qty = colVals("l_quantity")
        val rf = colVals("l_returnflag")
        val ln = colVals("l_linenumber")
        ok.indices.iterator.map { i =>
          (asLong(ok(i).get),
            qty(i).get.asInstanceOf[Double],
            new String(rf(i).get.asInstanceOf[Array[Byte]], "UTF-8"),
            asLong(ln(i).get))
        }
      }
      .toDF("okey", "qty", "rflag", "lnum")
      .groupBy("rflag")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("okey").as("nk"),
        max("lnum").as("max_ln"),
        sum(col("okey") * col("lnum")).as("wsum"))
      .orderBy("rflag")
  }
  /** Struct columns from raw bytes, BOTH columnar formats (r12):
    * one fixture (doc_id + a nullable struct<n_chars, lang> with a
    * nullable field) written as zstd parquet AND zstd ORC, decoded
    * by the two from-scratch struct readers — parquet's shared def
    * levels, ORC's present-gated children — and unioned under one
    * oracle with a format column. Either reader drifting flips the
    * hash. */
  private[graft] def columnarStructDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "colstruct", "documents") { out =>
      val df = Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 17 = 3 THEN NULL ELSE named_struct(" +
            "'n_chars', CAST(length(text) AS BIGINT), " +
            "'lang', CASE WHEN doc_id % 11 = 10 THEN NULL " +
            "ELSE lang END) END AS meta")
        .coalesce(2)
      df.write.option("compression", "zstd").parquet(s"$out/pq")
      df.write.option("compression", "zstd").orc(s"$out/orc")
    }
    def facts(fmt: String, glob: String, sub: String,
        decode: Array[Byte] => Seq[(Long, Option[(Long, Option[String])])])
        : DataFrame =
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob).load(s"$root/$sub")
        .select("content").as[Array[Byte]]
        .flatMap(b => decode(b).iterator.map { case (id, m) =>
          (fmt, id, m.map(_._1), m.flatMap(_._2))
        })
        .toDF("fmt", "doc_id", "m_chars", "lang")
    val pq = facts("parquet", "*.parquet", "pq", { bytes =>
      import graft.operators.{ParquetData => PD}
      val (shapes, cols) = PD.decodeFileNested(bytes).getOrElse(
        sys.error("parquet struct file does not decode"))
      require(shapes(1).isInstanceOf[PD.StructShape])
      cols(0).indices.map { r =>
        (cols(0)(r).get.asInstanceOf[Long],
          cols(1)(r).map { x =>
            val fs = x.asInstanceOf[Seq[Option[Any]]]
            (fs(0).get.asInstanceOf[Long],
              fs(1).map(v => new String(
                v.asInstanceOf[Array[Byte]], "UTF-8")))
          })
      }
    })
    val orc = facts("orc", "*.orc", "orc", { bytes =>
      import graft.operators.{OrcData => OD}
      val (shapes, cols) = OD.decodeFileNested(bytes).getOrElse(
        sys.error("orc struct file does not decode"))
      require(shapes(1).isStruct)
      cols(0).indices.map { r =>
        (cols(0)(r).get.asInstanceOf[Long],
          cols(1)(r).map { x =>
            val fs = x.asInstanceOf[Seq[Option[Any]]]
            (fs(0).get.asInstanceOf[Long],
              fs(1).map(_.asInstanceOf[String]))
          })
      }
    })
    pq.unionByName(orc).orderBy("fmt", "doc_id")
  }
  /** Recursively nested columns from raw bytes, BOTH columnar
    * formats (r13): one fixture with a `list<struct<n, lang>>`
    * column (the annotation-span shape — null lists, empty lists,
    * null elements, null fields) and a `struct<struct>` column,
    * written as zstd parquet AND zstd ORC and decoded by the two
    * from-scratch DEEP readers — parquet's full Dremel record
    * assembly over (rep, def) level streams, ORC's type-tree
    * recursion over present/length streams — then reduced to per-doc
    * facts under one oracle with a format column. Any level-
    * arithmetic, record-assembly or slicing bug in either reader
    * flips the hash. */
  private[graft] def columnarNestedDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "colnested", "documents") { out =>
      val df = Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE " +
            "transform(slice(sequence(0L, 3L), 1, " +
            "CAST(doc_id % 4 AS INT)), k -> " +
            "CASE WHEN (doc_id + k) % 7 = 6 THEN NULL ELSE " +
            "named_struct('n', (doc_id * 10 + k) % 1000, " +
            "'lang', CASE WHEN (doc_id + k) % 5 = 4 THEN NULL " +
            "ELSE lang END) END) END AS spans",
          "CASE WHEN doc_id % 11 = 7 THEN NULL ELSE named_struct(" +
            "'a', doc_id * 3, " +
            "'inner', CASE WHEN doc_id % 6 = 2 THEN NULL ELSE " +
            "named_struct('lang', lang, " +
            "'b', CASE WHEN doc_id % 4 = 1 THEN NULL " +
            "ELSE doc_id * 7 END) END) END AS meta2")
        .coalesce(2)
      df.write.option("compression", "zstd").parquet(s"$out/pq")
      df.write.option("compression", "zstd").orc(s"$out/orc")
    }
    // (doc_id, spans facts, meta2 facts) from DECODED rows; both
    // readers share the Seq[Option[Any]] value conventions, only
    // the string representation differs (parquet: utf8 bytes)
    type Facts = (Long, Option[Long], Option[Long], Option[Long],
      Option[Long], Option[Long], Option[String], Option[Long])
    def reduce(ids: IndexedSeq[Option[Any]],
        spans: IndexedSeq[Option[Any]],
        metas: IndexedSeq[Option[Any]],
        str: Any => String): Seq[Facts] =
      ids.indices.map { r =>
        val id = ids(r).get.asInstanceOf[Long]
        val sp = spans(r).map(_.asInstanceOf[Seq[Option[Any]]])
        val nSpans = sp.map(_.length.toLong)
        val nSum = sp.map(_.flatten.map(e =>
          e.asInstanceOf[Seq[Option[Any]]].head.get
            .asInstanceOf[Long]).sum)
        val nNull = sp.map(_.count(_.isEmpty).toLong)
        val nLang = sp.map(_.flatten.count(e =>
          e.asInstanceOf[Seq[Option[Any]]](1).isDefined).toLong)
        val mt = metas(r).map(_.asInstanceOf[Seq[Option[Any]]])
        val a = mt.map(_.head.get.asInstanceOf[Long])
        val inner = mt.flatMap(_(1))
          .map(_.asInstanceOf[Seq[Option[Any]]])
        val iLang = inner.map(i => str(i.head.get))
        val iB = inner.flatMap(_(1)).map(_.asInstanceOf[Long])
        (id, nSpans, nSum, nNull, nLang, a, iLang, iB)
      }
    def facts(fmt: String, glob: String, sub: String,
        decode: Array[Byte] => Seq[Facts]): DataFrame =
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob).load(s"$root/$sub")
        .select("content").as[Array[Byte]]
        .flatMap(b => decode(b).iterator.map { f =>
          (fmt, f._1, f._2, f._3, f._4, f._5, f._6, f._7, f._8)
        })
        .toDF("fmt", "doc_id", "n_spans", "span_n_sum",
          "n_null_spans", "n_lang", "a", "inner_lang", "inner_b")
    val pq = facts("parquet", "*.parquet", "pq", { bytes =>
      import graft.operators.{ParquetData => PD}
      val (nodes, cols) = PD.decodeFileDeep(bytes).getOrElse(
        sys.error("parquet nested file does not deep-decode"))
      require(nodes(1).isInstanceOf[PD.DeepList] &&
        nodes(1).asInstanceOf[PD.DeepList].elem
          .isInstanceOf[PD.DeepStruct],
        "fixture shape drifted: spans is not list<struct>")
      reduce(cols(0), cols(1), cols(2),
        v => new String(v.asInstanceOf[Array[Byte]], "UTF-8"))
    })
    val orc = facts("orc", "*.orc", "orc", { bytes =>
      import graft.operators.{OrcData => OD}
      val (nodes, cols) = OD.decodeFileDeep(bytes).getOrElse(
        sys.error("orc nested file does not deep-decode"))
      require(nodes(1).isInstanceOf[OD.OrcListNode] &&
        nodes(1).asInstanceOf[OD.OrcListNode].elem
          .isInstanceOf[OD.OrcStructNode],
        "fixture shape drifted: spans is not list<struct>")
      reduce(cols(0), cols(1), cols(2), _.asInstanceOf[String])
    })
    pq.unionByName(orc).orderBy("fmt", "doc_id")
  }
  /** Parquet LIST columns from raw bytes (r12): the
    * HuggingFace-token-column shape — a Spark-written parquet
    * fixture with a nullable list<int64> column (null lists, null
    * elements) decoded by OUR repetition-level walker
    * (decodeFileNested: 3-level list schema, rep/def streams,
    * record assembly across page boundaries). Facts from DECODED
    * rows only; the oracle recomputes them from documents. */
  private[graft] def parquetListDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "pqlist", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE " +
            "transform(filter(split(text, ' '), w -> w <> ''), " +
            "w -> CASE WHEN length(w) % 5 = 0 THEN NULL " +
            "ELSE CAST(length(w) AS BIGINT) END) END AS toks")
        .coalesce(2)
        .write.option("compression", "zstd").parquet(s"$out/docs")
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(s"$root/docs")
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        import graft.operators.{ParquetData => PD}
        val (shapes, cols) = PD.decodeFileNested(bytes).getOrElse(
          sys.error("parquet list file does not decode"))
        require(shapes.map(_.name) == Seq("doc_id", "toks") &&
          shapes(1).asInstanceOf[PD.ColShape].isList)
        cols(0).indices.iterator.map { r =>
          val id = cols(0)(r).get.asInstanceOf[Long]
          val toks = cols(1)(r)
            .map(_.asInstanceOf[Seq[Option[Any]]])
          (id,
            toks.map(_.length.toLong),
            toks.map(_.flatten.map(_.asInstanceOf[Long]).sum),
            toks.map(_.count(_.isEmpty).toLong))
        }
      }
      .toDF("doc_id", "n_tokens", "token_sum", "null_tokens")
      .orderBy("doc_id")
  }
  /** ORC LIST columns from raw bytes (r12): the SAME token-column
    * fixture story as `parquet_list_decode`, re-materialized as
    * zstd ORC — length runs on the list column, child column decode
    * and per-row slicing. One oracle, both columnar formats' nested
    * read paths. */
  private[graft] def orcListDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "orclist", "documents") { out =>
      Tables.documents(s, dir)
        .filter(expr(
          "length(text) = octet_length(text) AND length(text) > 0"))
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE " +
            "transform(filter(split(text, ' '), w -> w <> ''), " +
            "w -> CASE WHEN length(w) % 5 = 0 THEN NULL " +
            "ELSE CAST(length(w) AS BIGINT) END) END AS toks")
        .coalesce(2)
        .write.option("compression", "zstd").orc(s"$out/docs")
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.orc")
      .load(s"$root/docs")
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        import graft.operators.{OrcData => OD}
        val (shapes, cols) = OD.decodeFileNested(bytes).getOrElse(
          sys.error("orc list file does not decode"))
        require(shapes.map(_.name) == Seq("doc_id", "toks") &&
          shapes(1).isList)
        cols(0).indices.iterator.map { r =>
          val id = cols(0)(r).get.asInstanceOf[Long]
          val toks = cols(1)(r)
            .map(_.asInstanceOf[Seq[Option[Any]]])
          (id,
            toks.map(_.length.toLong),
            toks.map(_.flatten.map(_.asInstanceOf[Long]).sum),
            toks.map(_.count(_.isEmpty).toLong))
        }
      }
      .toDF("doc_id", "n_tokens", "token_sum", "null_tokens")
      .orderBy("doc_id")
  }
  /** ORC stripe-data decode from raw bytes (r12): lineitem
    * re-materialized as zstd ORC by Spark's writer (fixture, built
    * once), then read end to end by OUR walker — tail → stripe
    * footers → byte-RLE present bits → RLEv2 integer runs →
    * dictionary/direct strings — and aggregated to the SAME oracle
    * as `parquet_data_decode`: one truth, both columnar formats,
    * two independent from-scratch value decoders. Scale: stripes
    * decode independently; per-file flatMap. */
  private[graft] def orcDataDecode(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "orcdata", "lineitem") { out =>
      Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_quantity", "l_returnflag",
          "l_linenumber")
        .coalesce(2)
        .write.option("compression", "zstd").orc(s"$out/li")
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.orc")
      .load(s"$root/li")
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        import graft.operators.{OrcData => OD}
        val (leaves, cols) = OD.decodeFile(bytes).getOrElse(
          sys.error("orc data pages do not decode"))
        def idxOf(n: String) = {
          val i = leaves.indexWhere(_.name == n)
          require(i >= 0, s"missing column $n")
          i
        }
        val ok = cols(idxOf("l_orderkey"))
        val qty = cols(idxOf("l_quantity"))
        val rf = cols(idxOf("l_returnflag"))
        val ln = cols(idxOf("l_linenumber"))
        ok.indices.iterator.map { i =>
          (ok(i).get.asInstanceOf[Long],
            qty(i).get.asInstanceOf[Double],
            rf(i).get.asInstanceOf[String],
            ln(i).get.asInstanceOf[Long])
        }
      }
      .toDF("okey", "qty", "rflag", "lnum")
      .groupBy("rflag")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("okey").as("nk"),
        max("lnum").as("max_ln"),
        sum(col("okey") * col("lnum")).as("wsum"))
      .orderBy("rflag")
  }
  /** ORC round trip — the OTHER columnar warehouse format Spark ships
    * natively: documents (minus text) write once as ORC, and a
    * filtered aggregate reads back through the ORC scan, whose
    * predicate pushdown the plan audit pins (PushedFilters reach the
    * ORC reader exactly as they do parquet). Oracle answers off the
    * parquet table — format transparency proven by value equality. */
  private[graft] def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val p = formatFixtureDir(dir, "orc", "documents") { root =>
      Tables.documents(s, dir)
        .selectExpr("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").orc(root)
    }
    s.read.orc(p)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** This part's oracle SQL entries (the `oracleSql` slice). */
  private[graft] def columnarOracleSql: Map[String, String] = Map(
    // ...and the same tree AGAIN through the from-scratch reader
    // surfaced as a typed DataFrame (sources/ParquetRawSource)
    "parquet_raw_source" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END
        |    AS lang,
        |  CAST(strlen(text) AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |    ELSE CAST(doc_id % 3 = 0 AS BIGINT) END AS flag,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin,
    // the same facts through OUR ORC writer read back by orc-core
    "orc_write_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END
        |    AS lang,
        |  CAST(strlen(text) AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |    ELSE CAST(doc_id % 3 = 0 AS BIGINT) END AS flag,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin,
    // OUR ORC writer's timestamp/date/decimal shards read back by
    // orc-core; every value recomputed analytically
    "orc_write_rich" -> RichOracleSql,
    // OUR parquet writer's ts/date/decimal files read back by
    // parquet-mr — the IDENTICAL analytic truth as orc_write_rich
    "parquet_write_rich" -> RichOracleSql,
    // OUR parquet writer's STRUCT + MAP files read back by
    // parquet-mr — the IDENTICAL analytic truth as orc_write_struct
    "parquet_write_struct" -> StructOracleSql,
    // OUR writers' LIST<STRUCT> files (both formats, one truth):
    // size / pos-sum / null-tag probes recomputed analytically
    // over the j=0..2 annotation residues
    "parquet_write_deep" -> DeepOracleSql,
    "orc_write_deep" -> DeepOracleSql,
    // the ORC twin plus map<string,i64> element_at probes (null
    // map / empty map / null value all collapse to NULL, and the
    // oracle mirrors the Scala residue order: %13 before %5)
    "orc_write_struct" -> StructOracleSql,
    // OUR writer's BYTE_STREAM_SPLIT float planes +
    // DELTA_BYTE_ARRAY urls read back by the from-scratch raw
    // source; n/4 and n*1.5 are exact in binary on both sides
    "parquet_write_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 5 THEN NULL
        |    ELSE CAST(strlen(text) / 4.0 AS FLOAT) END AS score,
        |  strlen(text) * 1.5 AS measure,
        |  CASE WHEN doc_id % 13 = 7 THEN NULL
        |    ELSE 'https://corpus.example/' || lang || '/doc-'
        |      || doc_id END AS url
        |FROM d ORDER BY doc_id""".stripMargin,
    // OUR writer's DICTIONARY + 3-level-list files read back by
    // parquet-mr; list size / element sum recomputed analytically
    "parquet_write_nested" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END
        |    AS lang,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN -1
        |    WHEN doc_id % 5 = 4 THEN 0 ELSE 3 END AS BIGINT)
        |    AS n_toks,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN NULL
        |    WHEN doc_id % 5 = 4 THEN 0
        |    ELSE doc_id
        |      + (CASE WHEN doc_id % 3 = 1 THEN 0
        |         ELSE strlen(text) END)
        |      + (doc_id % 10) END AS BIGINT) AS tok_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // the ORC twin of parquet_write_nested: one truth, both
    // formats' nested write paths
    "orc_write_nested" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END
        |    AS lang,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN -1
        |    WHEN doc_id % 5 = 4 THEN 0 ELSE 3 END AS BIGINT)
        |    AS n_toks,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN NULL
        |    WHEN doc_id % 5 = 4 THEN 0
        |    ELSE doc_id
        |      + (CASE WHEN doc_id % 3 = 1 THEN 0
        |         ELSE strlen(text) END)
        |      + (doc_id % 10) END AS BIGINT) AS tok_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // ...the same nested tree through the from-scratch reader with
    // a projection (lang chunks never decoded)
    "parquet_raw_nested" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN -1
        |    WHEN doc_id % 5 = 4 THEN 0 ELSE 3 END AS BIGINT)
        |    AS n_toks,
        |  CAST(CASE WHEN doc_id % 7 = 3 THEN NULL
        |    WHEN doc_id % 5 = 4 THEN 0
        |    ELSE doc_id
        |      + (CASE WHEN doc_id % 3 = 1 THEN 0
        |         ELSE strlen(text) END)
        |      + (doc_id % 10) END AS BIGINT) AS tok_sum
        |FROM d ORDER BY doc_id""".stripMargin,
    // OUR writer's files read back by parquet-mr; facts recomputed
    // from documents
    "parquet_write_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END
        |    AS lang,
        |  CAST(strlen(text) AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |    ELSE CAST(doc_id % 3 = 0 AS BIGINT) END AS flag,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin,
    "orc_roundtrip" -> {
      // format transparency: the ORC-side answer must equal the flat
      // parquet answer
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin
    },
    // OUR Thrift-compact footer reader audits Spark-written parquet
    // (live differential against parquet-mr's serializer): summed
    // per-column value counts must equal the table's row count
    "parquet_footer" ->
      """WITH c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
        |cols(col_name, ptype) AS (VALUES
        |  ('l_orderkey', 'INT64'), ('l_partkey', 'INT64'),
        |  ('l_quantity', 'DOUBLE'), ('l_returnflag', 'BYTE_ARRAY'))
        |SELECT col_name, n AS total_values,
        |  'SNAPPY' AS codec, ptype
        |FROM cols, c ORDER BY col_name""".stripMargin,
    // OUR data-page decoder reads the driver's own parquet-cpp
    // lineitem file from raw bytes (footer -> dict pages -> RLE
    // hybrid -> values, snappy inflated in place); the oracle runs
    // DuckDB's own reader over the same table
    "parquet_data_decode" ->
      """SELECT l_returnflag AS rflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 4) AS qsum,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nk,
        |  CAST(max(l_linenumber) AS BIGINT) AS max_ln,
        |  CAST(sum(l_orderkey * l_linenumber) AS BIGINT) AS wsum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the SAME struct fixture through BOTH from-scratch columnar
    // struct readers (parquet shared-def-levels, ORC present-gated
    // children), unioned under one oracle with a format column
    "columnar_struct_decode" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |f(fmt) AS (VALUES ('orc'), ('parquet'))
        |SELECT fmt, doc_id,
        |  CASE WHEN doc_id % 17 = 3 THEN NULL
        |    ELSE CAST(strlen(text) AS BIGINT) END AS m_chars,
        |  CASE WHEN doc_id % 17 = 3 OR doc_id % 11 = 10 THEN NULL
        |    ELSE lang END AS lang
        |FROM d, f ORDER BY fmt, doc_id""".stripMargin,
    // the SAME recursively-nested fixture (list<struct> spans +
    // struct<struct> metadata) through BOTH from-scratch DEEP
    // readers (parquet Dremel assembly, ORC type-tree recursion),
    // reduced to per-doc facts under one oracle
    "columnar_nested_decode" ->
      """WITH d AS (
        |  SELECT doc_id, lang FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |sp AS (
        |  SELECT d.doc_id AS sid, g.k,
        |    CASE WHEN (d.doc_id + g.k) % 7 = 6 THEN NULL
        |      ELSE (d.doc_id * 10 + g.k) % 1000 END AS n,
        |    CASE WHEN (d.doc_id + g.k) % 7 = 6
        |        OR (d.doc_id + g.k) % 5 = 4
        |      THEN NULL ELSE d.lang END AS slang
        |  FROM d, generate_series(0, 3) g(k)
        |  WHERE g.k < d.doc_id % 4 AND d.doc_id % 13 <> 9),
        |agg AS (
        |  SELECT sid,
        |    CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS span_n_sum,
        |    CAST(SUM(CASE WHEN n IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_spans,
        |    CAST(SUM(CASE WHEN slang IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_lang
        |  FROM sp GROUP BY 1),
        |f(fmt) AS (VALUES ('orc'), ('parquet'))
        |SELECT f.fmt, d.doc_id,
        |  CASE WHEN d.doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(COALESCE(a.n_spans, 0) AS BIGINT)
        |    END AS n_spans,
        |  CASE WHEN d.doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(COALESCE(a.span_n_sum, 0) AS BIGINT)
        |    END AS span_n_sum,
        |  CASE WHEN d.doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(COALESCE(a.n_null_spans, 0) AS BIGINT)
        |    END AS n_null_spans,
        |  CASE WHEN d.doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(COALESCE(a.n_lang, 0) AS BIGINT)
        |    END AS n_lang,
        |  CASE WHEN d.doc_id % 11 = 7 THEN NULL
        |    ELSE d.doc_id * 3 END AS a,
        |  CASE WHEN d.doc_id % 11 = 7 OR d.doc_id % 6 = 2 THEN NULL
        |    ELSE d.lang END AS inner_lang,
        |  CASE WHEN d.doc_id % 11 = 7 OR d.doc_id % 6 = 2
        |      OR d.doc_id % 4 = 1
        |    THEN NULL ELSE d.doc_id * 7 END AS inner_b
        |FROM d CROSS JOIN f LEFT JOIN agg a ON a.sid = d.doc_id
        |ORDER BY fmt, doc_id""".stripMargin,
    // OUR repetition-level walker decodes a nullable list<int64>
    // column (null lists + null elements) from raw parquet bytes;
    // the oracle recomputes the token facts from documents
    "parquet_list_decode" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(ws) AS BIGINT) END AS n_tokens,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(list_sum(list_transform(
        |      list_filter(ws, w -> strlen(w) % 5 <> 0),
        |      w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT)
        |    END AS token_sum,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(list_filter(ws, w -> strlen(w) % 5 = 0))
        |      AS BIGINT) END AS null_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    // ...and the SAME list fixture through ORC length runs — one
    // oracle pins both columnar formats' nested read paths
    "orc_list_decode" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(ws) AS BIGINT) END AS n_tokens,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(list_sum(list_transform(
        |      list_filter(ws, w -> strlen(w) % 5 <> 0),
        |      w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT)
        |    END AS token_sum,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(list_filter(ws, w -> strlen(w) % 5 = 0))
        |      AS BIGINT) END AS null_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    // OUR ORC stripe-data decoder over a Spark-written zstd ORC
    // copy of lineitem — the SAME truth as parquet_data_decode,
    // through the other columnar format's from-scratch read path
    "orc_data_decode" ->
      """SELECT l_returnflag AS rflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 4) AS qsum,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nk,
        |  CAST(max(l_linenumber) AS BIGINT) AS max_ln,
        |  CAST(sum(l_orderkey * l_linenumber) AS BIGINT) AS wsum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // OUR OffsetIndex/ColumnIndex readers: page counts are the
    // exact 5000-row writer limit, decoded PLAIN bounds reproduce
    // the true min/max, spans tile the row count
    "parquet_page_index" ->
      """WITH c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    min(l_orderkey) AS ko, max(l_orderkey) AS kx,
        |    min(l_quantity) AS qo, max(l_quantity) AS qx
        |  FROM lineitem)
        |SELECT col_name,
        |  CAST(ceil(n / 5000.0) AS BIGINT) AS n_pages,
        |  n AS total_rows, vmin, vmax,
        |  CAST(0 AS BIGINT) AS null_sum
        |FROM c, (
        |  SELECT 'l_orderkey' AS col_name,
        |    CAST((SELECT ko FROM c) AS DOUBLE) AS vmin,
        |    CAST((SELECT kx FROM c) AS DOUBLE) AS vmax
        |  UNION ALL
        |  SELECT 'l_quantity',
        |    CAST((SELECT qo FROM c) AS DOUBLE),
        |    CAST((SELECT qx FROM c) AS DOUBLE))
        |ORDER BY col_name""".stripMargin,
    // OUR split-block bloom probe: every present supplier key and
    // name must hit through footer offset -> header -> salted lanes
    "parquet_bloom_probe" ->
      """SELECT s_suppkey % 8 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_probed,
        |  CAST(COUNT(*) AS BIGINT) AS n_key_found,
        |  CAST(COUNT(*) AS BIGINT) AS n_name_found
        |FROM supplier GROUP BY 1 ORDER BY bucket""".stripMargin,
    // OUR ORC PostScript->Footer walk: typed column statistics must
    // reproduce the table's true aggregates per stat family
    "orc_footer" ->
      """SELECT 'l_orderkey' AS col_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_values, false AS has_null,
        |  min(l_orderkey) AS imin, max(l_orderkey) AS imax,
        |  CAST(sum(l_orderkey) AS BIGINT) AS isum,
        |  CAST(NULL AS DOUBLE) AS dmin, CAST(NULL AS DOUBLE) AS dmax,
        |  CAST(NULL AS VARCHAR) AS smin, CAST(NULL AS VARCHAR) AS smax
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT), false,
        |  NULL, NULL, NULL,
        |  min(l_quantity), max(l_quantity), NULL, NULL
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT), false,
        |  NULL, NULL, NULL, NULL, NULL,
        |  min(l_returnflag), max(l_returnflag)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin,
    // OUR ROW_INDEX stream decode: per-1000-row-group min/max/count
    // on a sorted unique key, recomputed from row_number arithmetic
    "orc_row_index" ->
      """WITH s AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS sk FROM lineitem),
        |r AS (
        |  SELECT sk, row_number() OVER (ORDER BY sk) - 1 AS rn FROM s)
        |SELECT rn // 1000 AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  min(sk) AS vmin, max(sk) AS vmax
        |FROM r GROUP BY 1 ORDER BY grp""".stripMargin
  )
}
