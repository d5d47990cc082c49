package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** document containers, row formats and office/doc text extract — the Doc slice of the [[Pipeline]]
  * catalog (round-13 split: pure moves out of the former
  * single-file Pipeline.scala; composed back via
  * `object Pipeline extends ...`). */
private[graft] trait PipelineDocPart extends Serializable { this: Pipeline.type =>
  /** THE EXPORT COMPOSITION — curated corpus to training shards as
    * one query: the four-stage funnel's survivors shard by id range
    * (doc_id div 64 — writer-local assignment, no global rank; real
    * exporters shard per writer partition the same way), each sample
    * becomes the `{id}.txt` + `{id}.cls` WebDataset pair inside a
    * real ustar archive, and the emitted facts come from PARSING the
    * archive back (checksum-verified walk) — so a funnel bug, a
    * framing bug, or a walk-order bug each flips the per-shard md5
    * chain the oracle replays analytically.
    *
    * Shape: the funnel's shuffles + ONE shard-keyed assembly shuffle;
    * survivors are ScanCached (dedup_funnel branches off the same
    * chain). */
  private[graft] def webdatasetExport(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val survivors = funnelStages(s, dir)._5 // ScanCached inside
    survivors.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        (id / 64, id,
          graft.operators.Tar.buildEntry(s"$id.txt", t.getBytes("UTF-8")),
          graft.operators.Tar.buildEntry(s"$id.cls",
            s"label${id % 10}".getBytes("UTF-8")))
      }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Byte], Array[Byte])]) =>
        val samples = it.toSeq.sortBy(_._2)
        val arch = graft.operators.Tar.buildArchive(
          samples.flatMap(x => Seq(x._3, x._4)))
        val entries = graft.operators.Tar.parse(arch)
        val md5s = entries.map(_.md5).mkString(" ")
        (sid, samples.length.toLong, entries.length.toLong,
          entries.map(_.size).sum,
          java.security.MessageDigest.getInstance("MD5")
            .digest(md5s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }
      .toDF("shard_id", "n_docs", "n_entries", "total_bytes",
        "entries_md5")
      .orderBy("shard_id")
  }
  /** WebDataset-style tar shards (operators/Tar): 8 documents per
    * shard, each sample a basename-keyed file group — `{id}.txt` (the
    * text), `{id}.cls` (the label) and `{id}.json` (metadata) as
    * adjacent ustar entries; every 11th document OMITS its `.cls`
    * (the incomplete sample a loader must drop). The parse walk
    * verifies every header checksum and emits per-entry facts the
    * oracle predicts entirely from `documents` — names, octal-coded
    * sizes, payload md5s and entry positions (which SHIFT at each
    * missing file, so a walk bug flips rows corpus-wide).
    *
    * 100 TB shape: the build side pays the one shard-keyed shuffle
    * archive assembly inherently needs; the parse side is a flatMap
    * over shard rows — in production the shards are the INPUT (the
    * warc_parse_files pattern applies verbatim). */
  private[graft] def tarShardEntries(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val files = Seq(
          Some(s"$id.txt" -> t.getBytes("UTF-8")),
          if (id % 11 == 10) None
          else Some(s"$id.cls" -> s"label${id % 10}".getBytes("UTF-8")),
          Some(s"$id.json" -> s"""{"id":$id}""".getBytes("UTF-8"))
        ).flatten
        (id / 8, id,
          files.map { case (n, d) => graft.operators.Tar.buildEntry(n, d) })
      }
      .groupByKey(_._1)
      .flatMapGroups {
        (sid: Long, it: Iterator[(Long, Long, Seq[Array[Byte]])]) =>
          val entries = it.toSeq.sortBy(_._2).flatMap(_._3)
          graft.operators.Tar.parse(
              graft.operators.Tar.buildArchive(entries))
            .zipWithIndex.map { case (e, i) =>
              (e.name.takeWhile(_ != '.').toLong, sid, i.toLong,
                e.name, e.size, e.md5)
            }
      }
      .toDF("doc_id", "shard_id", "pos", "name", "size", "md5")
  }
  private[graft] def tarParse(s: SparkSession, dir: String): DataFrame =
    tarShardEntries(s, dir).orderBy("doc_id", "name")
  /** The `.tgz` twin of [[tarParse]]: the same 8-document shards
    * gzip-wrapped whole (the `.tar.gz` convention) and walked back
    * through the sniffing [[graft.operators.Tar.parseAuto]] — the
    * compression layer must be transparent to every entry fact, so
    * the oracle is IDENTICAL to tar_parse. */
  private[graft] def tarParseGz(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir, graft.operators.Tar.gzipArchive)
  /** The `.tar.lz4` twin: the same shards wrapped in our own
    * LZ4 FRAME (operators/Lz4 — 64 KiB independent blocks, content
    * checksum) and walked back through the sniffing parseAuto. The
    * oracle is IDENTICAL to tar_parse: the lz4 layer — compressor,
    * frame writer, frame reader, block decoder, xxh32 — must be
    * jointly invisible to every entry fact. */
  private[graft] def tarParseLz4(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir, graft.operators.Tar.lz4Archive)
  /** The `.tar.sz` twin: the same shards through our Snappy FRAMING
    * wrap (operators/SnappyCodec — 64 KiB chunks, masked CRC-32C per
    * chunk). Identical oracle, same transparency contract. */
  private[graft] def tarParseSnappy(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir, graft.operators.Tar.snappyArchive)
  /** The `.tar.bz2` twin: the same shards through our bzip2 codec
    * (operators/Bzip2 — BWT + MTF + Huffman, block and stream CRCs
    * verified on the way back). Identical oracle, same transparency
    * contract: every byte of the tar must survive the round trip. */
  private[graft] def tarParseBz2(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir, graft.operators.Tar.bzip2Archive)
  /** The `.tar.zst` twin, and a live differential in the gate: the
    * wrap side is zstd-jni (the C zstd Spark itself loads, level 9 —
    * REAL entropy-coded frames: FSE tables, 4-stream Huffman,
    * repeated offsets), the decode side is OUR pure-JVM RFC 8878
    * walk (operators/Zstd). Identical oracle: the whole codec must
    * be byte-transparent or every downstream fact shifts. */
  private[graft] def tarParseZst(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir,
      tar => com.github.luben.zstd.Zstd.compress(tar, 9))
  /** The `.tar.xz` twin, and the second live in-gate differential:
    * the wrap side is the tukaani xz library Spark bundles (preset 6
    * — REAL LZMA2 range-coded chunks, CRC64 block checks), the
    * decode side is OUR pure-JVM LZMA/XZ walk (operators/Xz).
    * Identical oracle: the codec must be byte-transparent. */
  private[graft] def tarParseXz(s: SparkSession, dir: String): DataFrame =
    tarParseWrapped(s, dir, { tar =>
      val buf = new java.io.ByteArrayOutputStream()
      // preset 6 coding with a SHARD-SIZED dictionary: the default
      // 8 MiB dict allocates a ~40 MB match finder PER SHARD (measured
      // 58 ms/shard of pure allocation — 8× the whole compress at
      // 64 KiB; XzPerfProbe pins the split). Matches still span the
      // entire archive, so the coded stream our decoder reads is as
      // real as the default's.
      val opt = new org.tukaani.xz.LZMA2Options(6)
      opt.setDictSize(math.max(1 << 16,
        java.lang.Integer.highestOneBit(math.max(tar.length - 1, 1)) * 2))
      val z = new org.tukaani.xz.XZOutputStream(buf, opt)
      z.write(tar); z.finish(); z.close()
      buf.toByteArray
    })
  /** Shared walk for the compressed-tar twins: build the tar_parse
    * shards, wrap each whole archive with `wrap`, parse back through
    * [[graft.operators.Tar.parseAuto]]'s magic-byte sniff. */
  private[graft] def tarParseWrapped(s: SparkSession, dir: String,
      wrap: Array[Byte] => Array[Byte]): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val files = Seq(
          Some(s"$id.txt" -> t.getBytes("UTF-8")),
          if (id % 11 == 10) None
          else Some(s"$id.cls" -> s"label${id % 10}".getBytes("UTF-8")),
          Some(s"$id.json" -> s"""{"id":$id}""".getBytes("UTF-8"))
        ).flatten
        (id / 8, id,
          files.map { case (n, d) => graft.operators.Tar.buildEntry(n, d) })
      }
      .groupByKey(_._1)
      .flatMapGroups {
        (sid: Long, it: Iterator[(Long, Long, Seq[Array[Byte]])]) =>
          val entries = it.toSeq.sortBy(_._2).flatMap(_._3)
          graft.operators.Tar.parseAuto(
              wrap(graft.operators.Tar.buildArchive(entries)))
            .zipWithIndex.map { case (e, i) =>
              (e.name.takeWhile(_ != '.').toLong, sid, i.toLong,
                e.name, e.size, e.md5)
            }
      }
      .toDF("doc_id", "shard_id", "pos", "name", "size", "md5")
      .orderBy("doc_id", "name")
  }
  /** The WebDataset deployment shape made real: the same 8-document
    * tar shards as [[tarShardEntries]], materialized as `.tar` FILES
    * (executor-written, signature-keyed) and read back through
    * `binaryFile` → the checksum-verifying parse flatMap. Identical
    * oracle to tar_parse — the file layer must be transparent. Spread
    * by path (binaryFile packs small files into one split; real
    * WebDataset shards are ~1 GB and split-sized). */
  private[graft] def tarParseFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "tarshard", "documents") { out =>
      asciiDocs(s, dir)
        .map { case (id, t) =>
          val files = Seq(
            Some(s"$id.txt" -> t.getBytes("UTF-8")),
            if (id % 11 == 10) None
            else Some(s"$id.cls" -> s"label${id % 10}".getBytes("UTF-8")),
            Some(s"$id.json" -> s"""{"id":$id}""".getBytes("UTF-8"))
          ).flatten
          (id / 8, id,
            files.map { case (n, d) =>
              graft.operators.Tar.buildEntry(n, d) })
        }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, Seq[Array[Byte]])]) =>
          val arch = graft.operators.Tar.buildArchive(
            it.toSeq.sortBy(_._2).flatMap(_._3))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.tar"), arch)
          sid
        }
        .count(): Unit
    }
    parseTarFileRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.tar").load(root)
        .repartition(col("path")))
      .orderBy("doc_id", "name")
  }
  /** `.jsonl.zst` corpus ingest — the EXACT shape public text
    * corpora ship in (one JSON object per line, zstd frames): 8-doc
    * JSONL shards are compressed by zstd-jni (level 3) and read back
    * through OUR RFC 8878 decoder, line-split, and strictly parsed
    * (the fields are rendered in a fixed order, so the parse is a
    * byte-exact walk, not a lenient JSON guess — any codec or
    * framing bug corrupts a line and fails the oracle hash). All
    * distributed: one shard-keyed shuffle, flatMap decode. */
  private[graft] def jsonlZstIngest(s: SparkSession, dir: String): DataFrame =
    jsonlZstRows(jsonlZstShards(s, dir)).orderBy("doc_id")
  /** The per-shard `.jsonl.zst` blobs: (shard_id, zstd bytes) —
    * compressed by zstd-jni (the jsonl_zst_ingest write side), or
    * with `own = true` by OUR entropy-coded encoder
    * ([[graft.operators.ZstdEncode]], the jsonl_zst_write side;
    * compression asserted to actually engage). */
  private[graft] def jsonlZstShards(s: SparkSession, dir: String,
      own: Boolean = false)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)]
      .map { case (id, lang, n) =>
        val line =
          if (id % 7 == 0) s"""{"doc_id":$id,"n_chars":$n}"""
          else s"""{"doc_id":$id,"lang":"$lang","n_chars":$n}"""
        (id / 8, id, line)
      }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val jsonl = it.toSeq.sortBy(_._2).map(_._3)
          .mkString("", "\n", "\n")
        val bytes = jsonl.getBytes("UTF-8")
        if (own && bytes.length <= (1 << 26)) {
          val enc = graft.operators.ZstdEncode.encode(bytes)
          // closed-form store-frame length (magic + header + fcs
          // + 3-byte block headers + content + checksum) — no
          // need to BUILD a store frame just to compare sizes
          val n = bytes.length
          val fcsLen = if (n < 256) 1 else if (n < 65792) 2 else 4
          val storeLen = 5 + fcsLen +
            math.max(1, (n + (1 << 17) - 1) / (1 << 17)) * 3 + n + 4
          require(n < 64 || enc.length < storeLen,
            s"entropy coding did not engage on shard $sid")
          (sid, enc)
        } else
          // the jni path — also the defensive fallback for a shard
          // past our encoder's 64 MiB bomb guard (unreachable with
          // these ~400-byte metadata shards, but a lane must not
          // crash where its twin succeeds)
          (sid, com.github.luben.zstd.Zstd.compress(bytes, 3))
      }
  }
  /** Shared decode+parse stage: OUR RFC 8878 walk, line split, strict
    * fixed-order field parse — reused by batch, file and streaming. */
  /** The one strict parse of a jsonl metadata line (fixed field
    * order; lang optional) — shared by every decode lane so the
    * parsers cannot drift apart: (doc_id, lang-or-null, n_chars).
    * Serializable so executor closures can carry it. */
  private[graft] def parseJsonlDocLine(line: String)
      : (Long, String, Long) = {
    def grab(key: String): Option[String] = {
      val k = "\"" + key + "\":"
      val i = line.indexOf(k)
      if (i < 0) None
      else {
        val v0 = i + k.length
        val raw =
          if (line.charAt(v0) == '"') {
            val e = line.indexOf('"', v0 + 1)
            line.substring(v0 + 1, e)
          } else line.substring(v0).takeWhile(c =>
            c != ',' && c != '}')
        Some(raw)
      }
    }
    (grab("doc_id").get.toLong, grab("lang").orNull,
      grab("n_chars").get.toLong)
  }

  private[graft] def jsonlZstRows(
      shards: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .flatMap { case (sid, zst) =>
        val back = graft.operators.Zstd.decode(zst)
          .getOrElse(sys.error(s"zstd rejected shard $sid"))
        new String(back, "UTF-8").split("\n").filter(_.nonEmpty)
          .map { line =>
            val (id, lang, n) = parseJsonlDocLine(line)
            (id, sid, lang, n)
          }
      }
      .toDF("doc_id", "shard_id", "lang", "n_chars")
  }
  /** `.jsonl.zst` corpus WRITE (r14): the REVERSE differential of
    * [[jsonlZstIngest]] — the same shards compressed by OUR
    * entropy-coded encoder ([[graft.operators.ZstdEncode]]: greedy
    * LZ77 + predefined-FSE sequence streams + canonical Huffman
    * literals, real compression rather than r13's store mode) and
    * decompressed by ZSTD-JNI, the C library, on the read side. A
    * bitstream, FSE-state or Huffman-table slip in our writer makes
    * the foreign decoder reject or corrupt a line and the oracle
    * hash flips. The writer also asserts real compression engaged
    * (output strictly smaller than a store-mode frame). */
  private[graft] def jsonlZstWrite(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    jsonlZstRowsJni(jsonlZstShards(s, dir, own = true))
      .orderBy("doc_id")
  }
  /** `.jsonl.xz` corpus shards written by OUR REAL LZMA2
    * compressor (late r14, [[graft.operators.XzEncode]] — range
    * coder, 12-state machine, LZMA2 chunking) and decoded back by
    * TUKAANI XZ, the bundled reference implementation — the
    * write-direction differential running live under the oracle.
    * A per-shard ratio guard proves the entropy coder engaged
    * (store-shape xz would be LARGER than the input). Same facts
    * and oracle as jsonl_zst_write. */
  private[graft] def jsonlXzWrite(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)]
      .map { case (id, lang, n) =>
        val line =
          if (id % 7 == 0) s"""{"doc_id":$id,"n_chars":$n}"""
          else s"""{"doc_id":$id,"lang":"$lang","n_chars":$n}"""
        (id / 8, id, line)
      }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val jsonl = it.toSeq.sortBy(_._2).map(_._3)
          .mkString("", "\n", "\n")
        val bytes = jsonl.getBytes("UTF-8")
        val enc = graft.operators.XzEncode.encode(bytes)
        require(bytes.length < 256 || enc.length < bytes.length,
          s"lzma did not engage on shard $sid " +
            s"(${enc.length} of ${bytes.length})")
        (sid, enc)
      }
      .flatMap { case (sid, xz) =>
        val in = new org.tukaani.xz.XZInputStream(
          new java.io.ByteArrayInputStream(xz))
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        in.close()
        new String(buf.toByteArray, "UTF-8").split("\n")
          .filter(_.nonEmpty)
          .map { line =>
            val (id, lang, n) = parseJsonlDocLine(line)
            (id, sid, lang, n)
          }
      }
      .toDF("doc_id", "shard_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** The jsonlZstRows twin with ZSTD-JNI on the decode side. */
  private[graft] def jsonlZstRowsJni(
      shards: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .flatMap { case (sid, zst) =>
        val size = com.github.luben.zstd.Zstd
          .getFrameContentSize(zst)
        require(size >= 0 && size <= (1 << 26),
          s"jni rejected shard $sid frame header")
        val back = com.github.luben.zstd.Zstd
          .decompress(zst, size.toInt)
        new String(back, "UTF-8").split("\n").filter(_.nonEmpty)
          .map { line =>
            val (id, lang, n) = parseJsonlDocLine(line)
            (id, sid, lang, n)
          }
      }
      .toDF("doc_id", "shard_id", "lang", "n_chars")
  }

  /** Builds (idempotently) and returns the `.jsonl.zst` fixture
    * directory — shared with the streaming parity spec. */
  private[graft] def jsonlZstFixtureRoot(s: SparkSession, dir: String)
      : String = {
    val spark = s
    import spark.implicits._
    formatFixtureDir(dir, "jsonlzst", "documents") { out =>
      jsonlZstShards(s, dir)
        .map { case (sid, bytes) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.jsonl.zst"), bytes)
          sid
        }
        .count(): Unit
    }
  }
  /** [[jsonlZstIngest]] through REAL `.jsonl.zst` FILES — the exact
    * layout public corpora publish — read back through binaryFile.
    * Identical oracle: the file layer must be transparent. */
  private[graft] def jsonlZstFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = jsonlZstFixtureRoot(s, dir)
    jsonlZstRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.zst").load(root)
        .repartition(col("path"))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          (name.stripPrefix("shard-").stripSuffix(".jsonl.zst").toLong,
            bytes)
        })
      .orderBy("doc_id")
  }
  /** MessagePack record round trip (operators/Msgpack): each doc
    * renders to the map {"id": int, "text": str, "tags": [int, int],
    * "note": nil | str, "score": float64}, encodes minimal-size,
    * decodes back, and every fact is re-derived from the DECODED
    * value tree — int-width selection, UTF-8 strings, nested arrays
    * and the nil branch must all be value-transparent. Pure map
    * pass; no shuffle beyond the presentation sort. */
  private[graft] def msgpackParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Msgpack._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val v = MpMap(Seq(
          MpStr("id") -> MpInt(id * 1000003L),
          MpStr("text") -> MpStr(t),
          MpStr("tags") -> MpArr(Seq(MpInt(id % 7), MpInt(t.length.toLong))),
          MpStr("note") -> (if (id % 7 == 0) MpNil
            else MpStr(s"n${id % 5}")),
          MpStr("score") -> MpDouble(t.length * 0.25)))
        val MpMap(kvs) = decode(encode(v)).getOrElse(
          sys.error(s"msgpack rejected doc $id")): @unchecked
        val m = kvs.map { case (MpStr(k), x) => (k, x) }.toMap
        val MpInt(bigId) = m("id"): @unchecked
        val MpStr(text) = m("text"): @unchecked
        val MpArr(tags) = m("tags"): @unchecked
        val tagSum = tags.map { case MpInt(x) => x
          case _ => sys.error("tag type") }.sum
        val note = m("note") match {
          case MpNil => null
          case MpStr(x) => x
          case _ => sys.error("note type")
        }
        val MpDouble(score) = m("score"): @unchecked
        val d = java.security.MessageDigest.getInstance("MD5")
        (bigId / 1000003L, kvs.length, text.length.toLong,
          d.digest(text.getBytes("UTF-8")).map("%02x".format(_))
            .mkString,
          tagSum, note, score)
      }
      .toDF("doc_id", "n_fields", "text_len", "text_md5", "tag_sum",
        "note", "score")
      .orderBy("doc_id")
  }
  /** CBOR record round trip (operators/Cbor, RFC 8949): each doc
    * renders to the map {"id": int, "text": str, "tags": [int,
    * int], "note": null | str, "ts": tag1(int), "score": float64},
    * encodes in the deterministic core encoding, decodes back, and
    * every fact is re-derived from the DECODED value tree — the
    * shortest-form integer heads, UTF-8 strings, nested arrays, the
    * null branch and the epoch tag must all be value-transparent.
    * Pure map pass; no shuffle beyond the presentation sort. */
  private[graft] def cborParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Cbor._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val v = CbMap(Seq(
          CbStr("id") -> CbInt(id * 1000003L),
          CbStr("text") -> CbStr(t),
          CbStr("tags") -> CbArr(Seq(CbInt(id % 7),
            CbInt(t.length.toLong))),
          CbStr("note") -> (if (id % 7 == 0) CbNull
            else CbStr(s"n${id % 5}")),
          CbStr("ts") -> CbTag(1, CbInt(1363896240L + id)),
          CbStr("score") -> CbDouble(t.length * 0.25)))
        val CbMap(kvs) = decode(encode(v)).getOrElse(
          sys.error(s"cbor rejected doc $id")): @unchecked
        val m = kvs.map { case (CbStr(k), x) => (k, x)
          case _ => sys.error("non-string key") }.toMap
        val CbInt(bigId) = m("id"): @unchecked
        val CbStr(text) = m("text"): @unchecked
        val CbArr(tags) = m("tags"): @unchecked
        val tagSum = tags.map { case CbInt(x) => x
          case _ => sys.error("tag type") }.sum
        val note = m("note") match {
          case CbNull => null
          case CbStr(x) => x
          case _ => sys.error("note type")
        }
        val CbTag(tagNo, CbInt(epoch)) = m("ts"): @unchecked
        require(tagNo == 1L)
        val CbDouble(score) = m("score"): @unchecked
        val d = java.security.MessageDigest.getInstance("MD5")
        (bigId / 1000003L, kvs.length, text.length.toLong,
          d.digest(text.getBytes("UTF-8")).map("%02x".format(_))
            .mkString,
          tagSum, note, epoch - 1363896240L, score)
      }
      .toDF("doc_id", "n_fields", "text_len", "text_md5", "tag_sum",
        "note", "ts_off", "score")
      .orderBy("doc_id")
  }
  /** BSON mongodump walk (operators/Bson, bsonspec.org): docs render
    * to {"_id": int64, "text": str, "tags": ["0": int32, "1":
    * int32], "note": null | str, "dt": utc-datetime, "score":
    * double}, 4 docs concatenate into one `.bson` stream chunk (the
    * mongodump file shape), [[graft.operators.Bson.decodeStream]]
    * walks it back and every fact is re-derived from the DECODED
    * documents — length prefixes, canonical array keys, the null
    * branch and the ms datetime must all be value-transparent. */
  private[graft] def bsonParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Bson._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 4, id, t) }
      .groupByKey(_._1)
      .mapGroups { (cid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val stream = docs.map { case (_, id, t) =>
          encode(BsDoc(Seq(
            "_id" -> BsInt64(id * 1000003L),
            "text" -> BsStr(t),
            "tags" -> BsArr(Seq(BsInt32((id % 7).toInt),
              BsInt32(t.length))),
            "note" -> (if (id % 7 == 0) BsNull
              else BsStr(s"n${id % 5}")),
            "dt" -> BsDateTime(1363896240000L + id),
            "score" -> BsDouble(t.length * 0.25))))
        }.reduce(_ ++ _)
        (cid, stream)
      }
      .flatMap { case (cid, stream) =>
        decodeStream(stream).getOrElse(
          sys.error(s"bson rejected chunk $cid")).map { d =>
          val m = d.kvs.toMap
          val BsInt64(bigId) = m("_id"): @unchecked
          val BsStr(text) = m("text"): @unchecked
          val BsArr(tags) = m("tags"): @unchecked
          val tagSum = tags.map { case BsInt32(x) => x.toLong
            case _ => sys.error("tag type") }.sum
          val note = m("note") match {
            case BsNull => null
            case BsStr(x) => x
            case _ => sys.error("note type")
          }
          val BsDateTime(ms) = m("dt"): @unchecked
          val BsDouble(score) = m("score"): @unchecked
          val dg = java.security.MessageDigest.getInstance("MD5")
          (bigId / 1000003L, d.kvs.length, text.length.toLong,
            dg.digest(text.getBytes("UTF-8")).map("%02x".format(_))
              .mkString,
            tagSum, note, ms - 1363896240000L, score)
        }
      }
      .toDF("doc_id", "n_fields", "text_len", "text_md5", "tag_sum",
        "note", "dt_off", "score")
      .orderBy("doc_id")
  }
  /** SQLite database walk (operators/Sqlite): per 16-doc chunk one
    * real `.sqlite` database is BUILT (512-byte pages, so longer
    * texts spill to overflow chains and the table b-tree grows an
    * interior level) with table docs(id INTEGER PRIMARY KEY, text,
    * tag, score, note) — id stored as NULL per the rowid-alias
    * rule — then read back through the header → sqlite_schema →
    * b-tree → record walk, every fact from DECODED values. The
    * oracle recomputes the same facts from `documents` directly, so
    * a wrong varint, serial type, overflow stitch or rowid-alias
    * fill flips a value. */
  private[graft] def sqliteParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Sqlite
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 16, id, t) }
      .groupByKey(_._1)
      .mapGroups { (cid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val rows = docs.map { case (_, id, t) =>
          // rowid = doc_id + 1 (sqlite rowids start at 1)
          (id + 1L, Seq[Any](id, t, id % 7,
            t.length * 0.25,
            if (id % 7 == 0) null else s"n${id % 5}"))
        }
        (cid, Sqlite.build("docs",
          Seq("id", "text", "tag", "score", "note"), rows,
          pageSize = 512, ipkColumn = 0))
      }
      .flatMap { case (cid, db) =>
        val t = Sqlite.tables(db).getOrElse(
          sys.error(s"sqlite rejected chunk $cid")).head
        require(t.name == "docs" && t.ipkColumn == 0 &&
          t.columns == Seq("id", "text", "tag", "score", "note"))
        Sqlite.rows(db, "docs").getOrElse(
          sys.error(s"sqlite rows rejected chunk $cid")).map { r =>
          // the ipk column IS the rowid (stored NULL, filled on
          // read); rowid = doc_id + 1
          require(r.values(0) == r.rowid, "alias fill broken")
          val id = r.rowid - 1L
          val text = r.values(1).asInstanceOf[String]
          val d = java.security.MessageDigest.getInstance("MD5")
          (id, r.values.length, text.length.toLong,
            d.digest(text.getBytes("UTF-8")).map("%02x".format(_))
              .mkString,
            r.values(2).asInstanceOf[Long],
            r.values(4).asInstanceOf[String],
            r.values(3).asInstanceOf[Double])
        }
      }
      .toDF("doc_id", "n_cols", "text_len", "text_md5", "tag",
        "note", "score")
      .orderBy("doc_id")
  }
  /** SQLite WITHOUT ROWID walk (r12, operators/Sqlite): the same
    * per-16-doc databases but written WITHOUT ROWID with a
    * COMPOSITE primary key (tag, id) — primary storage is an INDEX
    * b-tree whose records are PK-first permuted and whose interior
    * cells are rows too (each key lives exactly once), so the read
    * is an in-order traversal, not a leaf scan. The surfaced `pos`
    * column is each row's 1-based position in key order within its
    * database; the oracle recomputes it with a window function —
    * a wrong traversal order, permutation or separator handling
    * flips it. 512-byte pages force multi-level trees and INDEX-
    * formula overflow chains (X = (U-12)·64/255-23, not U-35). */
  private[graft] def sqliteParseWr(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Sqlite
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 16, id, t) }
      .groupByKey(_._1)
      .mapGroups { (cid: Long, it: Iterator[(Long, Long, String)]) =>
        // rows pre-sorted by the composite PK (tag, id)
        val docs = it.toSeq.sortBy { case (_, id, _) => (id % 7, id) }
        val rows = docs.map { case (_, id, t) =>
          (0L, Seq[Any](id, t, id % 7,
            if (id % 7 == 0) null else s"n${id % 5}"))
        }
        (cid, Sqlite.build("docs", Seq("id", "text", "tag", "note"),
          rows, pageSize = 512, pkColumns = Seq(2, 0)))
      }
      .flatMap { case (cid, db) =>
        val t = Sqlite.tables(db).getOrElse(
          sys.error(s"sqlite rejected chunk $cid")).head
        require(t.withoutRowid && t.pkColumns == Seq(2, 0) &&
          t.ipkColumn == -1 &&
          t.columns == Seq("id", "text", "tag", "note"))
        Sqlite.rows(db, "docs").getOrElse(
          sys.error(s"sqlite rows rejected chunk $cid")).map { r =>
          // values are back in DECLARED order; rowid = key-order pos
          val id = r.values(0).asInstanceOf[Long]
          val text = r.values(1).asInstanceOf[String]
          val d = java.security.MessageDigest.getInstance("MD5")
          (id, r.rowid, text.length.toLong,
            d.digest(text.getBytes("UTF-8")).map("%02x".format(_))
              .mkString,
            r.values(2).asInstanceOf[Long],
            r.values(3).asInstanceOf[String])
        }
      }
      .toDF("doc_id", "pos", "text_len", "text_md5", "tag", "note")
      .orderBy("doc_id")
  }
  /** EPUB text extraction (operators/Zip.parseWithData + HtmlText) —
    * ebooks are a standard corpus source and an EPUB is exactly a ZIP
    * with a STORED `mimetype`, `META-INF/container.xml`, and XHTML
    * chapters: the composition runs the verified central-directory
    * walk, checks the mimetype contract, extracts every chapter
    * through the real HTML state machine and re-joins the book text.
    * Chapter i reduces to `Ch {i} {slice}` under extraction, so the
    * oracle rebuilds the full book string analytically. */
  private[graft] def epubTextExtract(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val nch = 1 + (t.length % 3)
        val chapters = (0 until nch).map { i =>
          val st = (i * 7) % t.length
          val slice = t.substring(st, math.min(st + 10, t.length))
          (f"OEBPS/ch$i%03d.xhtml",
            ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
              s"<html><body><h1>Ch $i</h1><p>$slice</p></body></html>")
              .getBytes("UTF-8"), true)
        }
        val files = Seq(
          ("mimetype", "application/epub+zip".getBytes("UTF-8"), false),
          ("META-INF/container.xml",
            ("<?xml version=\"1.0\"?><container version=\"1.0\">" +
              "<rootfiles><rootfile full-path=\"OEBPS/content.opf\"/>" +
              "</rootfiles></container>").getBytes("UTF-8"), true)
        ) ++ chapters
        val entries = graft.operators.Zip.parseWithData(
          graft.operators.Zip.buildArchive(files))
        val mimeOk = entries.headOption.exists { case (e, c) =>
          e.name == "mimetype" && e.method == 0 &&
            new String(c, "UTF-8") == "application/epub+zip"
        }
        val chaps = entries.filter(_._1.name.endsWith(".xhtml"))
          .sortBy(_._1.name)
        val book = chaps.map { case (_, c) =>
          graft.operators.HtmlText.extractText(new String(c, "UTF-8"))
        }.mkString(" ")
        (id, entries.length, mimeOk, chaps.length.toLong, book,
          book.length)
      }
      .toDF("doc_id", "n_entries", "mimetype_ok", "n_chapters",
        "book_text", "n_chars")
      .orderBy("doc_id")
  }
  /** DOCX text extraction — the other office container corpora carry:
    * a ZIP whose `word/document.xml` holds the text in `<w:t>` runs.
    * The composition walks the verified ZIP, counts paragraphs in the
    * raw XML, and extracts the text through the same tag-stripping
    * state machine (the XML declaration and every `w:` element drop
    * as tags). */
  private[graft] def docxTextExtract(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val np = 1 + (t.length % 4)
        val paras = (0 until np).map { j =>
          val st = (j * 11) % t.length
          val slice = t.substring(st, math.min(st + 8, t.length))
          s"<w:p><w:r><w:t>$slice</w:t></w:r></w:p>"
        }
        val docXml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<w:document><w:body>" + paras.mkString + "</w:body></w:document>"
        val files = Seq(
          ("[Content_Types].xml",
            ("<?xml version=\"1.0\"?><Types><Default Extension=\"xml\"" +
              " ContentType=\"application/xml\"/></Types>")
              .getBytes("UTF-8"), true),
          ("word/document.xml", docXml.getBytes("UTF-8"), true))
        val entries = graft.operators.Zip.parseWithData(
          graft.operators.Zip.buildArchive(files))
        val doc = entries.collectFirst {
          case (e, c) if e.name == "word/document.xml" =>
            new String(c, "UTF-8")
        }.getOrElse(sys.error(s"docx walk lost document.xml for $id"))
        val nParas = "<w:p>".r.findAllIn(doc).length.toLong
        val text = graft.operators.HtmlText.extractText(doc)
        (id, entries.length, nParas, text, text.length)
      }
      .toDF("doc_id", "n_entries", "n_paras", "doc_text", "n_chars")
      .orderBy("doc_id")
  }
  /** XLSX extraction (r12, operators/Xlsx) — the office container
    * tabular corpora arrive in: per doc a two-sheet workbook (text
    * slices + numbers + a boolean) is BUILT through the shared-
    * string-pooling writer and read back through the REAL parser
    * (ZIP walk, workbook→rels→worksheet resolution, shared-string
    * pool, typed cells); every fact comes from the PARSED cells —
    * the string md5 crosses the entity-escape/pool layers, the
    * numeric sum the `<v>` number grammar, the boolean the `t="b"`
    * lane. Pure map pass; the oracle rebuilds each workbook's
    * content analytically. */
  private[graft] def xlsxExtract(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Xlsx
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val len = t.length
        val nr = 1 + (len % 3)
        val rows1: Seq[Seq[Xlsx.CellVal]] = (0 until nr).map { j =>
          val st = (j * 7) % len
          Seq(Xlsx.StrVal(t.substring(st, math.min(st + 6, len))),
            Xlsx.NumVal((st + j).toDouble))
        }
        val rows2: Seq[Seq[Xlsx.CellVal]] = Seq(Seq(
          Xlsx.NumVal(len.toDouble), Xlsx.NumVal(len * 0.25),
          Xlsx.BoolVal(len % 2 == 0)))
        val wb = Xlsx.parse(
          Xlsx.build(Seq(("text", rows1), ("stats", rows2))))
          .getOrElse(sys.error(s"xlsx rejected for doc $id"))
        val sh1 = wb.sheets.find(_.name == "text").getOrElse(
          sys.error(s"sheet lost for doc $id"))
        val strs = sh1.cells.collect {
          case Xlsx.Cell(_, 1, Xlsx.StrVal(v)) => v }
        val numSum = sh1.cells.collect {
          case Xlsx.Cell(_, 2, Xlsx.NumVal(v)) => v }.sum
        val sh2 = wb.sheets.find(_.name == "stats").getOrElse(
          sys.error(s"stats sheet lost for doc $id"))
        val quarter = sh2.cells.collectFirst {
          case Xlsx.Cell(1, 2, Xlsx.NumVal(v)) => v }.getOrElse(
          sys.error(s"quarter cell lost for doc $id"))
        val isEven = sh2.cells.collectFirst {
          case Xlsx.Cell(1, 3, Xlsx.BoolVal(b)) => b }.getOrElse(
          sys.error(s"bool cell lost for doc $id"))
        (id, wb.sheets.length, sh1.cells.length.toLong,
          md5utf(strs.mkString("|")), math.round(numSum),
          quarter, isEven)
      }
      .toDF("doc_id", "n_sheets", "n_cells", "s_md5", "nsum",
        "quarter", "is_even")
      .orderBy("doc_id")
  }
  /** PDF text extraction (operators/Pdf): per doc a multi-page PDF —
    * page j shows `Pg {j}` via `Tj` and a 12-char slice via a
    * kerned `TJ` array; the content-stream encoding rotates by doc
    * id over the whole closed-form filter set — plain, Flate,
    * modern (ObjStm + xref stream), LZW, and the two /Filter ARRAY
    * chains [/ASCIIHexDecode /FlateDecode] and [/ASCII85Decode
    * /RunLengthDecode] — built, then extracted through the REAL
    * parser (xref walk, object resolution, page tree, stream
    * decode, content tokenizer). The oracle rebuilds the extracted text EXACTLY
    * (PDF literal strings round-trip byte-exact; no whitespace
    * collapse), so the full writer→parser stack must be value-
    * transparent. Pure map pass. */
  private[graft] def pdfTextExtract(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val np = 1 + (t.length % 3)
        val pages = (0 until np).map { j =>
          val st = (j * 13) % t.length
          (s"Pg $j", t.substring(st, math.min(st + 12, t.length)))
        }
        val pdf = (id % 6) match {
          case 0 => graft.operators.Pdf.build(pages, "none")
          case 1 => graft.operators.Pdf.build(pages, "flate")
          case 2 => // PDF 1.5: ObjStm + xref stream, predictor rotating
            graft.operators.Pdf.buildModern(pages,
              xrefPredictor = id % 4 == 2)
          // the rest of the closed-form filter set (late r14):
          // LZW content streams, and the two declaration-order
          // /Filter ARRAY chains
          case 3 => graft.operators.Pdf.build(pages, "lzw")
          case 4 => graft.operators.Pdf.build(pages, "ahx-flate")
          case _ => graft.operators.Pdf.build(pages, "a85-rl")
        }
        val text = graft.operators.Pdf.extractText(pdf)
          .getOrElse(sys.error(s"pdf extract rejected doc $id"))
        (id, np.toLong, text, text.length)
      }
      .toDF("doc_id", "n_pages", "doc_text", "n_chars")
      .orderBy("doc_id")
  }
  /** 7z archive walk (operators/SevenZ): 8-document archives — a
    * `{id}.txt` per doc plus one `{shard}.meta` — with the content
    * method rotating LZMA2/COPY by shard parity and the WRITER
    * rotating by (shard/2) parity (late r14): half the shards are
    * written by commons-compress and read by OUR pure-JVM header
    * walk + LZMA core (every per-substream CRC verified), half by
    * OUR builder (+ our own LZMA2 compressor) and read back by
    * commons-compress — every shard a true cross-implementation
    * round trip in both directions. Facts are codec-independent
    * (true size, md5 of the EXTRACTED content), so the oracle
    * predicts them from `documents` without touching a compressed
    * byte. Same shuffle shape as tar_parse. */
  private[graft] def sevenzParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t) }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        import org.apache.commons.compress.archivers.sevenz._
        val docs = it.toSeq.sortBy(_._2)
        val members = docs.map { case (_, id, t) =>
          (s"$id.txt", t.getBytes("UTF-8"))
        } :+ (f"$sid%06d.meta",
          s"""{"shard":$sid,"n":${docs.length}}""".getBytes("UTF-8"))
        val method = if (sid % 2 == 0) "lzma2" else "copy"
        // writer rotates by (sid/2) parity so EVERY shard is a true
        // cross-implementation round trip: commons-compress writes →
        // OUR parser reads, or (late r14) OUR builder writes →
        // commons-compress reads
        val oursWrite = (sid / 2) % 2 == 1
        val entries: Seq[(String, Long, String)] =
          if (oursWrite) {
            val arch = graft.operators.SevenZ.build(members, method)
            val chan = new org.apache.commons.compress.utils
              .SeekableInMemoryByteChannel(arch)
            val z = new SevenZFile(chan)
            val out = Seq.newBuilder[(String, Long, String)]
            var e = z.getNextEntry
            while (e != null) {
              val buf = new Array[Byte](e.getSize.toInt)
              var got = 0
              while (got < buf.length) {
                val n = z.read(buf, got, buf.length - got)
                require(n > 0, s"short 7z read in shard $sid")
                got += n
              }
              out += ((e.getName, e.getSize,
                java.security.MessageDigest.getInstance("MD5")
                  .digest(buf).map("%02x".format(_)).mkString))
              e = z.getNextEntry
            }
            z.close()
            out.result()
          } else {
            // in-memory channel (no temp files) + a SHARD-SIZED
            // LZMA2 dictionary: the default preset allocates a
            // ~40 MB match finder PER SHARD (the tarParseXz lesson
            // — 183 s vs ~3 s)
            val chan = new org.apache.commons.compress.utils
              .SeekableInMemoryByteChannel()
            val w = new SevenZOutputFile(chan)
            if (method == "lzma2") {
              val opt = new org.tukaani.xz.LZMA2Options(3)
              opt.setDictSize(1 << 16)
              w.setContentMethods(java.util.Collections.singletonList(
                new SevenZMethodConfiguration(SevenZMethod.LZMA2, opt)))
            } else w.setContentCompression(SevenZMethod.COPY)
            members.foreach { case (name, content) =>
              val e = new SevenZArchiveEntry()
              e.setName(name)
              e.setSize(content.length.toLong)
              w.putArchiveEntry(e)
              w.write(content)
              w.closeArchiveEntry()
            }
            w.finish(); w.close()
            val arch = java.util.Arrays.copyOf(
              chan.array(), chan.size().toInt)
            graft.operators.SevenZ.parseWithData(arch)
              .getOrElse(sys.error(s"7z walk rejected shard $sid"))
              .map { case (e, _) => (e.name, e.size, e.md5) }
          }
        entries.collect { case (name, size, md5)
            if name.endsWith(".txt") =>
          (name.stripSuffix(".txt").toLong, sid, method, size, md5)
        }
      }
      .toDF("doc_id", "shard_id", "method", "size", "md5")
      .orderBy("doc_id")
  }
  /** MIME email round trip (operators/Mime): each doc becomes a
    * multipart/mixed message — the WHOLE text as a quoted-printable
    * text/plain part, a 10-char slice wrapped in HTML as a base64
    * text/html part, an attachment on every 3rd doc — built, parsed
    * back through the real header/multipart/transfer-decoding walk,
    * and the html part additionally runs the HtmlText extractor. The
    * oracle reconstructs every fact analytically, so QP escaping,
    * base64 wrapping, boundary framing and header folding must all
    * be value-transparent. Pure map pass. */
  private[graft] def emlParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val st = (id * 3 % t.length).toInt
        val slice = t.substring(st, math.min(st + 10, t.length))
        val att =
          if (id % 3 == 0) Seq(("a.bin",
            t.substring(0, math.min(16, t.length)).getBytes("UTF-8")))
          else Seq.empty
        val raw = graft.operators.Mime.buildMessage(
          s"doc$id@corpus", s"Doc $id", t, s"<p>$slice</p>", att,
          s"B$id")
        val m = graft.operators.Mime.parseMessage(raw)
        val plain = m.parts.find(_.mediaType == "text/plain")
          .getOrElse(sys.error(s"no plain part for $id"))
        val html = m.parts.find(_.mediaType == "text/html")
          .getOrElse(sys.error(s"no html part for $id"))
        val attBytes = m.parts
          .filter(_.mediaType == "application/octet-stream")
          .map(_.data.length.toLong).sum
        val d = java.security.MessageDigest.getInstance("MD5")
        (id, m.header("Subject").contains(s"Doc $id"),
          m.parts.length,
          plain.text.length.toLong,
          d.digest(plain.text.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString,
          graft.operators.HtmlText.extractText(html.text),
          attBytes)
      }
      .toDF("doc_id", "subject_ok", "n_parts", "plain_len",
        "plain_md5", "html_text", "att_bytes")
      .orderBy("doc_id")
  }
  /** The composed DOCUMENT-ingest DAG — the document twin of
    * media_ingest_dag and the capstone of the round-11 document
    * wave: every doc becomes a REAL FILE in one of FIVE formats
    * (PDF rotating classic/modern forms, EPUB, DOCX, MIME email,
    * HTML — by doc_id mod 5), written once per corpus to a fixture
    * tree, read back through the distributed binaryFile source,
    * MAGIC-SNIFFED (PDF and the two ZIP-based formats verify their
    * magic; eml/html route by extension, as real pipelines do), and
    * extracted through the matching REAL extractor chain (Pdf walk,
    * Zip+HtmlText, Mime+QP/base64, the HTML state machine). The
    * oracle rebuilds every format's extracted text analytically with
    * one CASE, so all five writer→parser→extractor stacks must be
    * value-transparent at once. Per-file map work after the scan. */
  private[graft] def docIngestDag(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = docFixtureRoot(s, dir)
    // NO repartition here: unlike the 8-doc shard fixtures, this tree
    // is per-document (12 500 tiny files at sf0.1) and binaryFile's
    // partition packing already spreads them; a path repartition would
    // shuffle every byte for nothing (measured: it was most of the
    // query's 10 s)
    docFileRows(
      s.read.format("binaryFile").option("pathGlobFilter", "doc-*").load(root)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])])
      .orderBy("doc_id")
  }
  /** Builds (idempotently) and returns the mixed-document fixture
    * tree — shared with the streaming parity spec. */
  private[graft] def docFixtureRoot(s: SparkSession, dir: String)
      : String = {
    val spark = s
    import spark.implicits._
    formatFixtureDir(dir, "docshard", "documents") { out =>
      asciiDocs(s, dir)
        .map { case (id, t) =>
          val (ext, bytes) = buildDocFile(id, t)
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"doc-$id%08d.$ext"), bytes)
          id
        }
        .count(): Unit
    }
  }
  /** Shared sniff+dispatch+extract stage over (path, bytes) rows —
    * reused verbatim by the batch and streaming paths. */
  private[graft] def docFileRows(
      files: org.apache.spark.sql.Dataset[(String, Array[Byte])])
      : DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .map { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val id = name.stripPrefix("doc-").takeWhile(_.isDigit).toLong
        val ext = name.substring(name.lastIndexOf('.') + 1)
        val M = graft.operators.Multimodal
        val extracted = ext match {
          case "pdf" =>
            require(M.sniffKind(bytes) == "application/pdf")
            graft.operators.Pdf.extractText(bytes)
              .getOrElse(sys.error(s"pdf rejected $id"))
          case "epub" =>
            require(M.sniffKind(bytes) == "application/zip")
            graft.operators.Zip.parseWithData(bytes)
              .filter(_._1.name.endsWith(".xhtml"))
              .sortBy(_._1.name)
              .map { case (_, c) => graft.operators.HtmlText
                .extractText(new String(c, "UTF-8")) }
              .mkString(" ")
          case "docx" =>
            require(M.sniffKind(bytes) == "application/zip")
            graft.operators.Zip.parseWithData(bytes)
              .collectFirst { case (e, c)
                  if e.name == "word/document.xml" =>
                graft.operators.HtmlText.extractText(
                  new String(c, "UTF-8"))
              }.getOrElse(sys.error(s"docx lost document.xml for $id"))
          case "eml" =>
            graft.operators.Mime
              .parseMessage(new String(bytes, "ISO-8859-1"))
              .parts.find(_.mediaType == "text/plain")
              .map(_.text)
              .getOrElse(sys.error(s"eml lost plain part for $id"))
          case _ => // html
            graft.operators.HtmlText.extractText(
              new String(bytes, "UTF-8"))
        }
        (id, ext, extracted, extracted.length)
      }
      .toDF("doc_id", "fmt", "extracted", "n_chars")
  }
  /** One document file for [[docIngestDag]]: (extension, bytes),
    * format by doc_id mod 5, each format reusing ITS standalone
    * gate's fixture arithmetic so the oracle stays one CASE. */
  private[graft] def buildDocFile(id: Long, t: String): (String, Array[Byte]) =
    (id % 5) match {
      case 0 => // PDF — the pdf_text_extract construction
        val np = 1 + (t.length % 3)
        val pages = (0 until np).map { j =>
          val st = (j * 13) % t.length
          (s"Pg $j", t.substring(st, math.min(st + 12, t.length)))
        }
        ("pdf",
          if (id % 2 == 0) graft.operators.Pdf.build(pages, flate = true)
          else graft.operators.Pdf.buildModern(pages,
            xrefPredictor = id % 3 == 0))
      case 1 => // EPUB — the epub_text_extract construction
        val nch = 1 + (t.length % 3)
        val chapters = (0 until nch).map { i =>
          val st = (i * 7) % t.length
          val slice = t.substring(st, math.min(st + 10, t.length))
          (f"OEBPS/ch$i%03d.xhtml",
            ("<?xml version=\"1.0\"?><html><body><h1>Ch " + i +
              s"</h1><p>$slice</p></body></html>").getBytes("UTF-8"),
            true)
        }
        ("epub", graft.operators.Zip.buildArchive(Seq(
          ("mimetype", "application/epub+zip".getBytes("UTF-8"), false))
          ++ chapters))
      case 2 => // DOCX — the docx_text_extract construction
        val np = 1 + (t.length % 4)
        val paras = (0 until np).map { j =>
          val st = (j * 11) % t.length
          val slice = t.substring(st, math.min(st + 8, t.length))
          s"<w:p><w:r><w:t>$slice</w:t></w:r></w:p>"
        }
        ("docx", graft.operators.Zip.buildArchive(Seq(
          ("word/document.xml",
            ("<?xml version=\"1.0\"?><w:document><w:body>" +
              paras.mkString + "</w:body></w:document>")
              .getBytes("UTF-8"), true))))
      case 3 => // MIME email — plain part carries the WHOLE text
        ("eml", graft.operators.Mime.buildMessage(
          s"doc$id@corpus", s"Doc $id", t, "<p>x</p>", Seq.empty,
          s"B$id").getBytes("ISO-8859-1"))
      case _ => // HTML — the html_extract page construction
        ("html",
          (s"<html><body><h1>Doc $id</h1><h2>Header ${id % 10}</h2>" +
            s"<p>$t</p></body></html>").getBytes("UTF-8"))
    }
  /** zstd-jni compresses 8-doc JSONL shards, OUR decoder reads; lang
    * is omitted from every 7th line (NULL on both sides). */
  private[graft] def jsonlZstOracleSql: String =
    """SELECT doc_id, doc_id // 8 AS shard_id,
      |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin
  private[graft] def avroParseOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0)
      |SELECT doc_id, doc_id // 8 AS shard_id,
      |  CASE WHEN (doc_id // 8) % 2 = 0 THEN 'deflate' ELSE 'null' END
      |    AS codec,
      |  strlen(text) AS len, md5(text) AS md5,
      |  CASE WHEN doc_id % 11 = 10 THEN NULL
      |    ELSE 'label' || (doc_id % 4) END AS label,
      |  strlen(text) * 0.25 AS score
      |FROM d ORDER BY doc_id""".stripMargin
  /** tar_parse / tar_parse_files shared oracle: names/sizes/md5s
    * predicted per file class; positions are the shard-local rank
    * over EXISTING files (they shift at every omitted .cls, so the
    * walk order is fully pinned). */
  private[graft] def tarParseOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0),
      |e AS (
      |  SELECT doc_id, doc_id || '.txt' AS name,
      |    strlen(text) AS size, md5(text) AS md5, 0 AS rk FROM d
      |  UNION ALL
      |  SELECT doc_id, doc_id || '.cls', 6,
      |    md5('label' || (doc_id % 10)), 1 FROM d
      |  WHERE doc_id % 11 <> 10
      |  UNION ALL
      |  SELECT doc_id, doc_id || '.json',
      |    length('{"id":' || doc_id || '}'),
      |    md5('{"id":' || doc_id || '}'), 2 FROM d)
      |SELECT doc_id, doc_id // 8 AS shard_id,
      |  row_number() OVER (PARTITION BY doc_id // 8
      |    ORDER BY doc_id, rk) - 1 AS pos,
      |  name, CAST(size AS BIGINT) AS size, md5
      |FROM e ORDER BY doc_id, name""".stripMargin
  /** zip_parse / zip_parse_files shared oracle: compressor-independent
    * facts (method, true size, md5 of the INFLATED content — the
    * deflated byte stream is Deflater-specific; the CRC verify happens
    * engine-side). */
  private[graft] def zipParseOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0),
      |e AS (
      |  SELECT doc_id, doc_id || '.txt' AS name, 0 AS method,
      |    strlen(text) AS size, md5(text) AS md5 FROM d
      |  UNION ALL
      |  SELECT doc_id, doc_id || '.meta', 8, length(j), md5(j)
      |  FROM (SELECT doc_id,
      |    '{"id":' || doc_id || ',"n":' || strlen(text) || '}' AS j
      |    FROM d))
      |SELECT doc_id, doc_id // 8 AS shard_id, name,
      |  CAST(method AS INT) AS method, CAST(size AS BIGINT) AS size,
      |  md5
      |FROM e ORDER BY doc_id, name""".stripMargin
  /** Test access (TarFileStreamSpec): the shard-file fixture root the
    * batch query materializes — building it if absent. */
  private[graft] def tarFixtureRoot(s: SparkSession, dir: String): String = {
    tarParseFiles(s, dir) // constructing the query builds the fixture
    formatFixtureDir(dir, "tarshard", "documents")(_ => ())
  }
  /** The shard-file parse stage shared by the batch query and its
    * file-streaming twin (TarFileStreamSpec): (path, content) binary
    * rows → per-entry facts, one flatMap. */
  private[graft] def parseTarFileRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val sid = name.stripPrefix("shard-").stripSuffix(".tar").toLong
        graft.operators.Tar.parse(bytes).zipWithIndex.map {
          case (e, i) =>
            (e.name.takeWhile(_ != '.').toLong, sid, i.toLong,
              e.name, e.size, e.md5)
        }
      }
      .toDF("doc_id", "shard_id", "pos", "name", "size", "md5")
  }
  /** Encoding-repair curation pass (r12, functions/FixEncoding): the
    * ftfy core case — UTF-8 text that was decoded as CP1252 (and
    * sometimes re-damaged a second time) is detected and inverted;
    * clean ASCII and legitimate Latin-1 pass through untouched. The
    * fixture corrupts analytically (suffix with é/ï, mojibake every
    * 2nd doc, DOUBLE mojibake every 10th), so the oracle predicts the
    * repaired text, the round count and the changed flag exactly.
    * Pure map — no shuffle at all. */
  private[graft] def textFixEncoding(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.functions.FixEncoding
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val suffix =
          if (id % 3 == 0) " café"
          else if (id % 3 == 1) " naïve"
          else ""
        val orig = t + suffix
        val corruptRounds =
          if (id % 2 != 0) 0 else if (id % 10 == 4) 2 else 1
        // every 7th corrupted doc takes the LATIN-1 damage family
        // (C1 controls) instead of CP1252 — repair inverts both, so
        // the oracle is unchanged
        val corrupted = FixEncoding.mojibake(orig, corruptRounds,
          latin1 = id % 7 == 1)
        val (repaired, rounds) = FixEncoding.repair(corrupted)
        val d = java.security.MessageDigest.getInstance("MD5")
        (id, rounds, repaired != corrupted,
          d.digest(repaired.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }
      .toDF("doc_id", "fixed_rounds", "changed", "text_md5")
      .orderBy("doc_id")
  }
  /** ZIP archive walk (operators/Zip): 8-document archives, each doc
    * a STORED `{id}.txt` plus a DEFLATED `{id}.meta` — the parse
    * must locate the end-of-central-directory record, walk the
    * central directory, inflate the deflated payloads and verify
    * every CRC-32. Facts are compressor-independent (method, true
    * size, md5 of the INFLATED content), so the oracle predicts them
    * from `documents` even though the deflated byte stream itself is
    * Deflater-version-specific. Same shuffle shape as tar_parse. */
  private[graft] def zipParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val meta = s"""{"id":$id,"n":${t.length}}"""
        (id / 8, id, Seq(
          (s"$id.txt", t.getBytes("UTF-8"), false),
          (s"$id.meta", meta.getBytes("UTF-8"), true)))
      }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long,
          it: Iterator[(Long, Long, Seq[(String, Array[Byte], Boolean)])]) =>
        val files = it.toSeq.sortBy(_._2).flatMap(_._3)
        graft.operators.Zip.parse(
            graft.operators.Zip.buildArchive(files))
          .map { e =>
            (e.name.takeWhile(_ != '.').toLong, sid, e.name,
              e.method, e.size, e.md5)
          }
      }
      .toDF("doc_id", "shard_id", "name", "method", "size", "md5")
      .orderBy("doc_id", "name")
  }
  /** ZIP shards through REAL FILES — [[zipParse]]'s build+parse walk
    * upgraded to the tar_parse_files shape: 8-document `.zip` archives
    * are written once per corpus to a fixture tree, read back through
    * the distributed binaryFile source, and walked per file on
    * executors ([[parseZipFileRows]], shared verbatim with the
    * streaming twin in ZipFileStreamSpec). Facts are compressor-
    * independent (method, true size, md5 of INFLATED content), so the
    * oracle predicts them from `documents` without touching a byte of
    * the Deflater-specific stream. */
  private[graft] def zipParseFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "zipshard", "documents") { out =>
      asciiDocs(s, dir)
        .map { case (id, t) =>
          val meta = s"""{"id":$id,"n":${t.length}}"""
          (id / 8, id, Seq(
            (s"$id.txt", t.getBytes("UTF-8"), false),
            (s"$id.meta", meta.getBytes("UTF-8"), true)))
        }
        .groupByKey(_._1)
        .mapGroups { (sid: Long,
            it: Iterator[(Long, Long, Seq[(String, Array[Byte], Boolean)])]) =>
          val arch = graft.operators.Zip.buildArchive(
            it.toSeq.sortBy(_._2).flatMap(_._3))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.zip"), arch)
          sid
        }
        .count(): Unit
    }
    parseZipFileRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.zip").load(root)
        .repartition(col("path")))
      .orderBy("doc_id", "name")
  }
  /** Avro Object Container walk (operators/Avro): 8-document
    * containers — fields `id` long / `text` string / `label` nullable
    * string (every 11th doc takes the null union branch) / `score`
    * double — 4-row blocks so every shard crosses a sync boundary,
    * codec rotating deflate/null by shard. The walk builds, parses
    * back (sync markers verified, schema re-interpreted from the
    * embedded JSON) and emits facts computed from the PARSED values,
    * so the whole encode→decode stack must be value-transparent; the
    * oracle predicts every fact from `documents`. Same shuffle shape
    * as tar_parse: build pays the one shard-keyed shuffle archive
    * assembly needs, parse is flatMap work. */
  private[graft] def avroParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    avroShardRows(avroShards(s, dir)).orderBy("doc_id")
  }
  /** The per-shard Avro containers: (shard_id, bytes). */
  private[graft] def avroShards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val fields = Seq(
          graft.operators.Avro.Field("id", "long", nullable = false),
          graft.operators.Avro.Field("text", "string", nullable = false),
          graft.operators.Avro.Field("label", "string", nullable = true),
          graft.operators.Avro.Field("score", "double", nullable = false))
        val rows = docs.map { case (_, id, t) =>
          Seq[Option[Any]](Some(id), Some(t),
            if (id % 11 == 10) None else Some(s"label${id % 4}"),
            Some(t.length * 0.25))
        }
        val codec = if (sid % 2 == 0) "deflate" else "null"
        (sid, graft.operators.Avro.build("doc", fields, rows, codec,
          blockRows = 4))
      }
  }
  /** avro_parse through the FULL spec codec set (r12): the same
    * 8-doc shards and facts as avro_parse, but the codec rotates
    * through all six — null, deflate, bzip2, snappy (+CRC32 verify),
    * xz, zstandard — so every compressed path decodes through OUR
    * pure-JVM codec stack inside the same shard walk. */
  private[graft] def avroParseCodecs(s: SparkSession, dir: String): DataFrame =
    avroShardRows(avroCodecShards(s, dir)).orderBy("doc_id")
  private[graft] def avroCodecShards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val fields = Seq(
          graft.operators.Avro.Field("id", "long", nullable = false),
          graft.operators.Avro.Field("text", "string", nullable = false),
          graft.operators.Avro.Field("label", "string", nullable = true),
          graft.operators.Avro.Field("score", "double", nullable = false))
        val rows = docs.map { case (_, id, t) =>
          Seq[Option[Any]](Some(id), Some(t),
            if (id % 11 == 10) None else Some(s"label${id % 4}"),
            Some(t.length * 0.25))
        }
        val codec = Seq("null", "deflate", "bzip2", "snappy", "xz",
          "zstandard")((sid % 6).toInt)
        (sid, graft.operators.Avro.build("doc", fields, rows, codec,
          blockRows = 4))
      }
  }
  /** Avro COMPLEX types (r12) — the shapes Hadoop-lineage corpora use
    * freely: a nullable `array<long?>` token column, a `map<string,
    * long>`, an enum class label, and a nested record. Build side is
    * OUR nested writer (avro-java reads it back in AvroSpec); parse
    * side is OUR recursive decoder; every fact re-derived from
    * DECODED values with the oracle predicting them from documents.
    * Same shard shuffle + flatMap shape as avro_parse. */
  private[graft] def avroParseNested(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Avro
    Tables.documents(s, dir)
      .filter(expr("length(text) = octet_length(text) AND length(text) > 0"))
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, t, lang) => (id / 8, id, t, lang) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val nf = Seq(
          Avro.NField("id", Avro.NPrim("long"), nullable = false),
          Avro.NField("toks",
            Avro.NArr(Avro.NPrim("long"), itemsNullable = true),
            nullable = true),
          Avro.NField("props",
            Avro.NMap(Avro.NPrim("long"), valuesNullable = false),
            nullable = false),
          Avro.NField("cls", Avro.NEnum("cls",
            Seq("alpha", "beta", "gamma", "delta")), nullable = false),
          Avro.NField("meta", Avro.NRec("meta", Seq(
            Avro.NField("lang", Avro.NPrim("string"), nullable = true),
            Avro.NField("n", Avro.NPrim("long"), nullable = false))),
            nullable = false))
        val rows = docs.map { case (_, id, t, lang) =>
          val ws = t.split(" ").filter(_.nonEmpty)
          Seq[Option[Any]](
            Some(id),
            if (id % 13 == 9) None
            else Some(ws.toSeq.map(w =>
              if (w.length % 5 == 0) None
              else Some(w.length.toLong)): Seq[Option[Any]]),
            Some(Seq("n" -> Some(t.length.toLong),
              "w" -> Some(ws.length.toLong)): Seq[(String, Option[Any])]),
            Some(Seq("alpha", "beta", "gamma", "delta")((id % 4).toInt)),
            Some(Seq(
              if (id % 11 == 10) None else Some(lang),
              Some(t.length.toLong)): Avro.Row))
        }
        val codec = if (sid % 2 == 0) "deflate" else "null"
        (sid, Avro.buildNested("docn", nf, rows, codec, blockRows = 4))
      }
      .flatMap { case (sid, bytes) =>
        val f = graft.operators.Avro.parse(bytes)
          .getOrElse(sys.error(s"avro nested parse rejected shard $sid"))
        require(f.fields.map(_.tpe) ==
          Seq("long", "array", "map", "enum", "record"))
        f.rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val toks = r(1).map(_.asInstanceOf[Seq[Option[Any]]])
          val props = r(2).get.asInstanceOf[Seq[(String, Option[Any])]]
            .map { case (k, v) => k -> v.get.asInstanceOf[Long] }.toMap
          val meta = r(4).get.asInstanceOf[Seq[Option[Any]]]
          (id, sid, f.codec,
            toks.map(_.length.toLong),
            toks.map(_.flatten.map(_.asInstanceOf[Long]).sum),
            toks.map(ts => ts.count(_.isEmpty).toLong),
            props("n"), props("w"),
            r(3).get.asInstanceOf[String],
            meta(0).map(_.asInstanceOf[String]),
            meta(1).get.asInstanceOf[Long])
        }
      }
      .toDF("doc_id", "shard_id", "codec", "n_toks", "tok_sum",
        "null_toks", "map_n", "map_w", "cls", "lang", "meta_n")
      .orderBy("doc_id")
  }
  /** The per-container parse shared by the batch query, the file
    * query and the binaryFile STREAM twin: parse, re-derive every
    * fact from the decoded values. */
  private[graft] def avroShardRows(
      shards: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .flatMap { case (sid, bytes) =>
        graft.operators.Avro.parse(bytes).toSeq.flatMap { f =>
          f.rows.map { r =>
            val id = r(0).get.asInstanceOf[Long]
            val text = r(1).get.asInstanceOf[String]
            val d = java.security.MessageDigest.getInstance("MD5")
            (id, sid, f.codec, text.length.toLong,
              d.digest(text.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString,
              r(2).map(_.asInstanceOf[String]),
              r(3).get.asInstanceOf[Double])
          }
        }
      }
      .toDF("doc_id", "shard_id", "codec", "len", "md5", "label", "score")
  }
  /** [[avroParse]] through REAL `.avro` FILES: the containers written
    * once per corpus to a fixture tree (executor-side), read back
    * through the distributed binaryFile source and parsed per file.
    * Identical oracle — the file layer must be transparent. */
  private[graft] def avroParseFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "avroshard3", "documents") { out =>
      avroShards(s, dir)
        .map { case (sid, bytes) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.avro"), bytes)
          sid
        }
        .count(): Unit
    }
    avroShardRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(root)
        .repartition(col("path"))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          (name.stripPrefix("shard-").stripSuffix(".avro").toLong, bytes)
        })
      .orderBy("doc_id")
  }
  /** [[arrowSourceRead]]'s Avro sibling (sources/AvroSource) over the
    * codec-rotating `.avro` fixture tree — arrays/maps/enums/records
    * would surface as ArrayType/MapType/StringType/StructType; this
    * tree is the flat tabular shape, and the codec rotation is
    * invisible through the API by design. */
  private[graft] def avroSourceRead(s: SparkSession, dir: String): DataFrame = {
    val root = avroFixtureRoot(s, dir)
    graft.sources.AvroSource.read(s, root)
      .selectExpr("id AS doc_id", "id DIV 8 AS shard_id",
        "CAST(length(text) AS BIGINT) AS len",
        "md5(CAST(text AS BINARY)) AS md5", "label", "score")
      .orderBy("doc_id")
  }
  /** [[arrowSinkRoundtrip]]'s Avro sibling: our pure-JVM container
    * writer under zstandard, read back through AvroSource. */
  private[graft] def avroSinkRoundtrip(s: SparkSession, dir: String)
      : DataFrame =
    sinkRoundtripFacts(s,
      formatFixtureDir(dir, "avrosink3", "documents") { out =>
        graft.sources.AvroSink.write(
          sinkRoundtripInput(s, dir).repartition(8), out,
          codec = "zstandard", blockRows = 64)
      }, arrow = false)
  private[graft] def avroFixtureRoot(s: SparkSession, dir: String): String = {
    avroParseFiles(s, dir) // constructing the query builds the fixture
    formatFixtureDir(dir, "avroshard3", "documents")(_ => ())
  }
  private[graft] def zipFixtureRoot(s: SparkSession, dir: String): String = {
    zipParseFiles(s, dir) // constructing the query builds the fixture
    formatFixtureDir(dir, "zipshard", "documents")(_ => ())
  }
  /** The per-file ZIP walk shared by the batch query and the
    * binaryFile STREAM twin (ZipFileStreamSpec): central-directory
    * walk + inflate + CRC verify per archive row. */
  private[graft] def parseZipFileRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val sid = name.stripPrefix("shard-").stripSuffix(".zip").toLong
        graft.operators.Zip.parse(bytes).map { e =>
          (e.name.takeWhile(_ != '.').toLong, sid, e.name,
            e.method, e.size, e.md5)
        }
      }
      .toDF("doc_id", "shard_id", "name", "method", "size", "md5")
  }
  /** WebDataset SAMPLE assembly over the parsed shard entries: group
    * by the basename key, count modalities and bytes, and emit the
    * completeness verdict (the drop-incomplete gate every WebDataset
    * loader runs). One map-combinable aggregate on the sample key. */
  private[graft] def webdatasetPairs(s: SparkSession, dir: String): DataFrame =
    tarShardEntries(s, dir)
      .withColumn("ext", expr("substring_index(name, '.', -1)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_files"), sum("size").as("total_bytes"),
        max(when(col("ext") === "cls", 1L).otherwise(0L)).as("has_cls"))
      .selectExpr("doc_id", "n_files", "total_bytes",
        "n_files = 3 AS complete")
      .orderBy("doc_id")
  /** S6/A8 through REAL FILES — the reference's `.hist` text format
    * (`<bin> <count>` lines, one snapshot directory per period,
    * aggregation.cpp's recursive walk) materialized as an actual
    * partitioned text-file tree (two snapshot generations per
    * station, day-parity split) and ROLLED UP through the csv scan +
    * grouped sum, gate-checked against the oracle recomputing the
    * same histogram from `events` directly. Upgrades the
    * spec-pinned histogram file ops to an oracle-green row: any
    * formatting, scan, partition-discovery or summing bug flips
    * counts. */
  private[graft] def histFileRollup(s: SparkSession, dir: String): DataFrame = {
    // file-count discipline: partition dirs are station BUCKETS (×2
    // snapshot generations = 32 dirs), one file per dir via the
    // pre-write repartition on the partition keys, with the station
    // in the line — per-station dirs measured 6 849 tiny files and a
    // 70 s listing+read at sf0.1 (1 500 stations), the small-files
    // anti-pattern this library's own SCALE.md warns about
    val root = formatFixtureDir(dir, "histv2", "events") { out =>
      Tables.events(s, dir)
        .selectExpr("user_id AS station",
          "CAST(floor(value) AS INT) AS bin",
          "CAST((ts div 86400000000000) % 2 AS INT) AS snap")
        .groupBy("station", "snap", "bin")
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("CAST(station % 16 AS INT) AS bucket", "snap",
          "concat(station, ' ', bin, ' ', cnt) AS value")
        .repartition(col("bucket"), col("snap"))
        .write.partitionBy("bucket", "snap").mode("overwrite").text(out)
    }
    s.read.option("delimiter", " ")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "station LONG, bin INT, cnt LONG"))
      .csv(root)
      .groupBy("station", "bin")
      .agg(sum("cnt").as("cnt"))
      .orderBy("station", "bin")
  }
  /** CSV ingest with PERMISSIVE malformed-row handling — the messy-
    * delivery reality of ad-hoc corpora: every 13th row carries a
    * non-numeric n_chars (a type violation the schema rejects), and
    * the reader must route it to the corrupt-record column instead of
    * failing the job or silently nulling. Facts: row/corrupt/good
    * counts and the good-row n_chars sum; the oracle predicts all
    * four from `documents`. The fixture writes REAL .csv text files
    * through Spark's text writer (executor-side). */
  private[graft] def csvIngest(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val p = formatFixtureDir(dir, "csv", "documents") { root =>
      Tables.documents(s, dir)
        .selectExpr("doc_id", "lang", "n_chars")
        .as[(Long, String, Long)]
        .map { case (id, lang, n) =>
          if (id % 13 == 0) s"$id,$lang,NOTANUMBER" else s"$id,$lang,$n"
        }
        .write.mode("overwrite").text(root)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, lang STRING, n_chars LONG, _bad STRING")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(p)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_bad").isNull, col("n_chars")).otherwise(0L))
          .as("sum_chars"))
  }
  /** Test access (CsvStreamIngestSpec): the csv fixture root the
    * batch query materializes — building it if absent. */
  private[graft] def csvFixtureRoot(s: SparkSession, dir: String): String = {
    csvIngest(s, dir) // constructing the query builds the fixture
    formatFixtureDir(dir, "csv", "documents")(_ => ())
  }
  /** JSONL ingest with schema-on-read — the interchange format most
    * corpora actually arrive in: every 7th row omits the `lang` field
    * (schema evolution in the wild), and the explicit-schema read
    * must surface it as a null, not an error. The fixture writes REAL
    * .jsonl text files; the oracle predicts the counts and the
    * per-language sums from `documents`. */
  private[graft] def jsonlIngest(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val p = formatFixtureDir(dir, "jsonl", "documents") { root =>
      Tables.documents(s, dir)
        .selectExpr("doc_id", "lang", "n_chars")
        .as[(Long, String, Long)]
        .map { case (id, lang, n) =>
          if (id % 7 == 0) s"""{"doc_id":$id,"n_chars":$n}"""
          else s"""{"doc_id":$id,"lang":"$lang","n_chars":$n}"""
        }
        .write.mode("overwrite").text(root)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, lang STRING, n_chars LONG")
    s.read.schema(schema).json(p)
      .groupBy(coalesce(col("lang"), lit("<missing>")).as("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** This part's oracle SQL entries (the `oracleSql` slice). */
  private[graft] def docOracleSql: Map[String, String] = Map(
    "tar_parse" -> tarParseOracleSql,
    // .tgz transparency: identical facts through the gzip wrap
    "tar_parse_gz" -> tarParseOracleSql,
    // .tar.lz4 / .tar.sz transparency: identical facts through our
    // own LZ4 frame and Snappy framing codecs (operators/Lz4,
    // operators/SnappyCodec) — compressor, checksums and decoder
    // must be jointly invisible
    "tar_parse_lz4" -> tarParseOracleSql,
    "tar_parse_snappy" -> tarParseOracleSql,
    // the .tar.bz2 twin: BWT/MTF/Huffman must be byte-transparent
    "tar_parse_bz2" -> tarParseOracleSql,
    // the .tar.zst twin: zstd-jni compresses, OUR RFC 8878 decoder
    // reads — a full-codec differential inside the gate
    "tar_parse_zst" -> tarParseOracleSql,
    // the .tar.xz twin: tukaani compresses (real LZMA2), OUR decoder
    // reads — the second in-gate codec differential
    "tar_parse_xz" -> tarParseOracleSql,
    // the file layer must be transparent: identical facts through
    // real .tar shard files + the binaryFile scan
    "tar_parse_files" -> tarParseOracleSql,
    "hist_file_rollup" -> {
      // the same histogram recomputed straight off events — the file
      // tree, partition discovery and snapshot summing must be
      // transparent
      """SELECT user_id AS station,
        |  CAST(floor(value) AS INT) AS bin,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY station, bin""".stripMargin
    },
    "csv_ingest" -> {
      // every 13th row's n_chars is the type-violating token → routed
      // to the corrupt-record column, excluded from the good sums
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_corrupt,
        |  CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_chars END)
        |    AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin
    },
    "jsonl_ingest" -> {
      // every 7th row omits lang → the schema-on-read null bucket
      """SELECT CASE WHEN doc_id % 7 = 0 THEN '<missing>' ELSE lang END
        |    AS lang,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin
    },
    "text_fix_encoding" -> {
      // the repaired text must equal the analytically-built original
      // byte-for-byte (md5 over UTF-8), the round count must match
      // the injected damage depth, and untouched docs must not change
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |s AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' caf' || chr(233)
        |         WHEN doc_id % 3 = 1 THEN ' na' || chr(239) || 've'
        |         ELSE '' END AS orig
        |  FROM d)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 2 OR doc_id % 2 = 1 THEN 0
        |       WHEN doc_id % 10 = 4 THEN 2 ELSE 1 END AS INT)
        |    AS fixed_rounds,
        |  (doc_id % 2 = 0 AND doc_id % 3 <> 2) AS changed,
        |  md5(orig) AS text_md5
        |FROM s ORDER BY doc_id""".stripMargin
    },
    "zip_parse" -> zipParseOracleSql,
    "doc_ingest_dag" -> {
      // one CASE rebuilds every format's extracted text: pdf pages
      // join with \n (byte-exact literal strings, no collapse), the
      // html-derived formats collapse whitespace, eml is the raw text
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |e AS (SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'pdf' WHEN 1 THEN 'epub' WHEN 2 THEN 'docx'
        |    WHEN 3 THEN 'eml' ELSE 'html' END AS fmt,
        |  CASE doc_id % 5
        |    WHEN 0 THEN array_to_string(
        |      list_transform(range(0, CAST(1 + len % 3 AS BIGINT)),
        |        j -> 'Pg ' || j || ' ' ||
        |          substr(text, CAST((j * 13) % len AS INT) + 1, 12)),
        |      chr(10))
        |    WHEN 1 THEN trim(regexp_replace(array_to_string(
        |      list_transform(range(0, CAST(1 + len % 3 AS BIGINT)),
        |        i -> 'Ch ' || i || ' ' ||
        |          substr(text, CAST((i * 7) % len AS INT) + 1, 10)),
        |      ' '), '\s+', ' ', 'g'))
        |    WHEN 2 THEN trim(regexp_replace(array_to_string(
        |      list_transform(range(0, CAST(1 + len % 4 AS BIGINT)),
        |        j -> substr(text, CAST((j * 11) % len AS INT) + 1, 8)),
        |      ' '), '\s+', ' ', 'g'))
        |    WHEN 3 THEN text
        |    ELSE trim(regexp_replace(
        |      'Doc ' || doc_id || ' Header ' || (doc_id % 10) || ' '
        |        || text, '\s+', ' ', 'g')) END AS extracted
        |  FROM d)
        |SELECT doc_id, fmt, extracted,
        |  CAST(length(extracted) AS INT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin
    },
    "eml_parse" -> {
      // QP/base64/multipart must be value-transparent: plain part ==
      // the whole text; html slice at 3·id mod len; attachment on
      // every 3rd doc carries min(16, len) bytes
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, TRUE AS subject_ok,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS INT)
        |    AS n_parts,
        |  CAST(len AS BIGINT) AS plain_len, md5(text) AS plain_md5,
        |  trim(regexp_replace(
        |    substr(text, CAST((doc_id * 3) % len AS INT) + 1, 10),
        |    '\s+', ' ', 'g')) AS html_text,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN least(16, len) ELSE 0 END
        |    AS BIGINT) AS att_bytes
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "sevenz_parse" -> {
      // commons-compress writes (LZMA2/COPY by shard parity), OUR
      // header walk + LZMA core reads; facts are codec-independent
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN (doc_id // 8) % 2 = 0 THEN 'lzma2' ELSE 'copy' END
        |    AS method,
        |  strlen(text) AS size, md5(text) AS md5
        |FROM d ORDER BY doc_id""".stripMargin
    },
    // same facts through the written .zip fixture tree + binaryFile
    "zip_parse_files" -> zipParseOracleSql,
    // Avro container: every fact re-derived from PARSED values, so
    // the zigzag/union/sync/deflate stack must be value-transparent
    "avro_parse" -> avroParseOracleSql,
    // full codec rotation: same facts as avro_parse, codec by sid%6
    "avro_parse_codecs" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE (doc_id // 8) % 6 WHEN 0 THEN 'null'
        |    WHEN 1 THEN 'deflate' WHEN 2 THEN 'bzip2'
        |    WHEN 3 THEN 'snappy' WHEN 4 THEN 'xz'
        |    ELSE 'zstandard' END AS codec,
        |  strlen(text) AS len, md5(text) AS md5,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL
        |    ELSE 'label' || (doc_id % 4) END AS label,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin,
    // complex types (array/map/enum/nested record): our nested writer
    // → our recursive decoder, every fact predicted from documents
    "avro_parse_nested" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id, lang, strlen(text) AS n_chars,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN (doc_id // 8) % 2 = 0 THEN 'deflate'
        |    ELSE 'null' END AS codec,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(ws) AS BIGINT) END AS n_toks,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(list_sum(list_transform(
        |      list_filter(ws, w -> strlen(w) % 5 <> 0),
        |      w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT)
        |    END AS tok_sum,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(list_filter(ws, w -> strlen(w) % 5 = 0))
        |      AS BIGINT) END AS null_toks,
        |  CAST(n_chars AS BIGINT) AS map_n,
        |  CAST(len(ws) AS BIGINT) AS map_w,
        |  CASE doc_id % 4 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
        |    WHEN 2 THEN 'gamma' ELSE 'delta' END AS cls,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END AS lang,
        |  CAST(n_chars AS BIGINT) AS meta_n
        |FROM t ORDER BY doc_id""".stripMargin,
    "jsonl_zst_ingest" -> jsonlZstOracleSql,
    // same facts through real .jsonl.zst files + binaryFile
    "jsonl_zst_files" -> jsonlZstOracleSql,
    // same facts AGAIN: our entropy-coded writer, jni's reader
    "jsonl_zst_write" -> jsonlZstOracleSql,
    // OUR LZMA2 compressor -> tukaani reader, same facts
    "jsonl_xz_write" -> jsonlZstOracleSql,
    "pdf_text_extract" -> {
      // page j reduces to 'Pg {j} {slice_j}'; pages join with \n;
      // literal strings round-trip byte-exact so NO collapse is
      // applied — the reconstruction is exact string arithmetic
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + length(text) % 3 AS np FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |e AS (SELECT doc_id, np,
        |  array_to_string(
        |    list_transform(range(0, CAST(np AS BIGINT)), j ->
        |      'Pg ' || j || ' ' ||
        |      substr(text, CAST((j * 13) % len AS INT) + 1, 12)),
        |    chr(10)) AS doc
        |  FROM d)
        |SELECT doc_id, CAST(np AS BIGINT) AS n_pages,
        |  doc AS doc_text, CAST(length(doc) AS INT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin
    },
    "epub_text_extract" -> {
      // chapter i reduces to 'Ch {i} {slice_i}' under extraction;
      // array_to_string rebuilds the book, one \s+ collapse + trim
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + length(text) % 3 AS nch FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |e AS (SELECT doc_id, nch,
        |  trim(regexp_replace(array_to_string(
        |    list_transform(range(0, CAST(nch AS BIGINT)), i ->
        |      'Ch ' || i || ' ' ||
        |      substr(text, CAST((i * 7) % len AS INT) + 1, 10)),
        |    ' '), '\s+', ' ', 'g')) AS book
        |  FROM d)
        |SELECT doc_id, CAST(nch + 2 AS INT) AS n_entries,
        |  TRUE AS mimetype_ok, CAST(nch AS BIGINT) AS n_chapters,
        |  book AS book_text, CAST(length(book) AS INT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin
    },
    "docx_text_extract" -> {
      // paragraph j reduces to 'slice_j'; the XML declaration and all
      // w: elements drop as tags
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + length(text) % 4 AS np FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |e AS (SELECT doc_id, np,
        |  trim(regexp_replace(array_to_string(
        |    list_transform(range(0, CAST(np AS BIGINT)), j ->
        |      substr(text, CAST((j * 11) % len AS INT) + 1, 8)),
        |    ' '), '\s+', ' ', 'g')) AS doc
        |  FROM d)
        |SELECT doc_id, CAST(2 AS INT) AS n_entries,
        |  CAST(np AS BIGINT) AS n_paras,
        |  doc AS doc_text, CAST(length(doc) AS INT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin
    },
    "xlsx_extract" -> {
      // every fact from the PARSED typed cells: the string md5
      // crosses entity escapes + shared-string pooling, the sums
      // the number grammar, the boolean the t="b" lane
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + length(text) % 3 AS nr FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, CAST(2 AS INT) AS n_sheets,
        |  CAST(nr * 2 AS BIGINT) AS n_cells,
        |  md5(array_to_string(
        |    list_transform(range(0, CAST(nr AS BIGINT)), j ->
        |      substr(text, CAST((j * 7) % len AS INT) + 1, 6)),
        |    '|')) AS s_md5,
        |  CAST(list_sum(
        |    list_transform(range(0, CAST(nr AS BIGINT)), j ->
        |      (j * 7) % len + j)) AS BIGINT) AS nsum,
        |  len * 0.25 AS quarter,
        |  len % 2 = 0 AS is_even
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "msgpack_parse" -> {
      // every fact from the DECODED value tree; note nil on every 7th
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, CAST(5 AS INT) AS n_fields,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id % 7 + strlen(text) AS tag_sum,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE 'n' || (doc_id % 5) END AS note,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "cbor_parse" -> {
      // every fact from the DECODED value tree; note null on every
      // 7th; the tag-1 epoch surfaces as its doc_id offset
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, CAST(6 AS INT) AS n_fields,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id % 7 + strlen(text) AS tag_sum,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE 'n' || (doc_id % 5) END AS note,
        |  doc_id AS ts_off,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "sqlite_parse" -> {
      // 16-doc sqlite databases at 512-byte pages; every fact from
      // the decoded b-tree records; note null on every 7th
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, CAST(5 AS INT) AS n_cols,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id % 7 AS tag,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE 'n' || (doc_id % 5) END AS note,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "sqlite_parse_wr" -> {
      // WITHOUT ROWID: composite PK (tag, id); pos = in-order
      // traversal position within each 16-doc database — pins the
      // index b-tree walk order and the PK-first permutation
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id // 16
        |    ORDER BY doc_id % 7, doc_id) AS pos,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id % 7 AS tag,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE 'n' || (doc_id % 5) END AS note
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "bson_parse" -> {
      // 4-doc mongodump stream chunks; every fact from the DECODED
      // documents; note null on every 7th; datetime as doc offset
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, CAST(6 AS INT) AS n_fields,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id % 7 + strlen(text) AS tag_sum,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE 'n' || (doc_id % 5) END AS note,
        |  doc_id AS dt_off,
        |  strlen(text) * 0.25 AS score
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "avro_source_read" -> arrowIpcOracleSql,
    "avro_sink_roundtrip" -> sinkRoundtripOracleSql,
    // same facts through the written .avro fixture tree + binaryFile
    "avro_parse_files" -> avroParseOracleSql,
    "webdataset_pairs" -> {
      // completeness = the .cls file exists; byte totals fold the
      // three file classes
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 11 = 10 THEN 2 ELSE 3 END AS BIGINT)
        |    AS n_files,
        |  CAST(strlen(text) + length('{"id":' || doc_id || '}')
        |    + CASE WHEN doc_id % 11 = 10 THEN 0 ELSE 6 END AS BIGINT)
        |    AS total_bytes,
        |  doc_id % 11 <> 10 AS complete
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY doc_id""".stripMargin
    },
    "webdataset_export" ->
      // the funnel survivors re-derived, then the per-shard facts:
      // entries walk txt-then-cls per doc in ascending id order, so
      // the md5 chain is string_agg over that exact order
      s"""$funnelCtesSql,
        |ex AS (
        |  SELECT doc_id, strlen(text) AS tlen, md5(text) AS m1,
        |    md5('label' || (doc_id % 10)) AS m2
        |  FROM k4)
        |SELECT doc_id // 64 AS shard_id,
        |  count(*) AS n_docs,
        |  CAST(2 * count(*) AS BIGINT) AS n_entries,
        |  CAST(sum(tlen + 6) AS BIGINT) AS total_bytes,
        |  md5(string_agg(m1 || ' ' || m2, ' ' ORDER BY doc_id))
        |    AS entries_md5
        |FROM ex GROUP BY 1 ORDER BY shard_id""".stripMargin
  )
}
