package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta Lake transaction log (the PUBLIC protocol spec,
  * delta.io/sharing / delta-io/delta PROTOCOL.md) — the lakehouse
  * table format large curated corpora actually live in. This reads
  * and writes the LOG, not the delta-spark library: a `_delta_log/`
  * directory of `%020d.json` commits (one JSON action per line —
  * `protocol`, `metaData`, `add`, `remove`, `commitInfo`), optional
  * classic `%020d.checkpoint.parquet` files and the
  * `_last_checkpoint` pointer.
  *
  * Reading ([[snapshot]] / [[read]]):
  *  - picks the newest checkpoint at-or-below the requested version
  *    (by listing the log dir — `_last_checkpoint` is written for
  *    ecosystem compatibility but the listing is authoritative,
  *    which also survives a stale pointer), loads its
  *    add/remove/metaData rows through a plain parquet scan, then
  *    replays the subsequent JSON commits in version order:
  *    `add` upserts by path, `remove` deletes by path, latest
  *    `metaData`/`protocol` win. Missing intermediate versions are
  *    an error (a torn log must not silently read as an older
  *    table).
  *  - [[read]] materializes the live-file list, groups files by
  *    their `partitionValues` and unions one pruned parquet scan
  *    per partition-value combination with the partition columns
  *    injected as typed literals (Delta stores partition values
  *    ONLY in the log — the data files don't carry the columns).
  *    `schemaString` is Spark schema JSON by protocol definition,
  *    so the scan schema is exact, not inferred.
  *  - protocol gate: `minReaderVersion` ≤ 2 read; ≥ 3 (reader
  *    features — deletion vectors, column mapping, v2 checkpoints)
  *    rejects honestly rather than mis-reading rows that a feature
  *    would have masked.
  *
  * Writing ([[create]] / [[commit]] / [[writeCheckpoint]]): commits
  * render one action per line in the protocol's field order;
  * checkpoints are the classic single-file parquet with
  * protocol/metaData/add rows and a `_last_checkpoint` pointer.
  *
  * Scale notes (100 TB): the log dir listing is O(#commits) and
  * checkpoints cap replay length; the reconstructed file LIST is
  * O(#live files) on the driver — the same contract as
  * delta-standalone — while the DATA is only ever touched by
  * executor-side parquet scans with pushdown intact (the per-
  * partition-group union keeps `PushedFilters` live per branch).
  * Validation: DeltaLogSpec (multi-version replay, checkpoint
  * equivalence, partition typing, torn-log/protocol rejections)
  * plus two oracle-gated queries over a lineitem-derived fixture
  * table. */
object DeltaLog {

  final case class AddFile(path: String,
      partitionValues: Map[String, String], size: Long,
      modificationTime: Long, dataChange: Boolean)
  final case class Meta(id: String, schemaString: String,
      partitionColumns: Seq[String])
  final case class Protocol(minReader: Int, minWriter: Int)
  final case class Snapshot(version: Long, meta: Meta,
      protocol: Protocol, files: Seq[AddFile])

  private def logDir(table: String) = s"$table/_delta_log"
  private def commitFile(v: Long) = f"$v%020d.json"
  private def checkpointFile(v: Long) = f"$v%020d.checkpoint.parquet"

  // ---------------------------------------------------------------
  // Hadoop FS helpers (work on any Spark-visible filesystem)
  // ---------------------------------------------------------------

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readText(spark: SparkSession, path: String): String = {
    val (f, p) = fs(spark, path)
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def writeText(spark: SparkSession, path: String,
      text: String): Unit = {
    val (f, p) = fs(spark, path)
    val out = f.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  // ---------------------------------------------------------------
  // Action JSON (render + parse via JsonMini)
  // ---------------------------------------------------------------

  private def q(s: String) = JsonMini.quote(s)

  private def mapJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")

  def addJson(a: AddFile): String =
    s"""{"add":{"path":${q(a.path)},"partitionValues":${
      mapJson(a.partitionValues)},"size":${a.size},""" +
      s""""modificationTime":${a.modificationTime},""" +
      s""""dataChange":${a.dataChange}}}"""

  def removeJson(path: String, deletionTimestamp: Long): String =
    s"""{"remove":{"path":${q(path)},"deletionTimestamp":${
      deletionTimestamp},"dataChange":true}}"""

  def metaJson(m: Meta): String =
    s"""{"metaData":{"id":${q(m.id)},"format":{"provider":"parquet",""" +
      s""""options":{}},"schemaString":${q(m.schemaString)},""" +
      s""""partitionColumns":[${m.partitionColumns.map(q).mkString(",")}],""" +
      s""""configuration":{},"createdTime":0}}"""

  def protocolJson(p: Protocol): String =
    s"""{"protocol":{"minReaderVersion":${p.minReader},""" +
      s""""minWriterVersion":${p.minWriter}}}"""

  /** Write one commit: actions, one JSON per line. */
  def commit(spark: SparkSession, table: String, version: Long,
      actions: Seq[String]): Unit =
    writeText(spark, s"${logDir(table)}/${commitFile(version)}",
      actions.mkString("", "\n", "\n"))

  /** One parsed commit's actions (the log-tail unit of work). */
  final case class CommitActions(adds: Seq[AddFile],
      removes: Seq[String], meta: Option[Meta],
      protocol: Option[Protocol])

  /** Parse one commit file's text (JSON action per line). None on
    * any malformed line — a torn commit must fail, not drop. */
  def parseCommit(text: String): Option[CommitActions] = {
    val actions = JsonMini.parseLines(text).getOrElse(return None)
    val adds = Seq.newBuilder[AddFile]
    val removes = Seq.newBuilder[String]
    var meta: Option[Meta] = None
    var protocol: Option[Protocol] = None
    actions.foreach { a =>
      val m = JsonMini.obj(a).getOrElse(return None)
      m.get("add").flatMap(JsonMini.obj).foreach { ad =>
        adds += AddFile(
          JsonMini.str(ad.getOrElse("path", return None))
            .getOrElse(return None),
          JsonMini.obj(ad.getOrElse("partitionValues", Map.empty))
            .getOrElse(Map.empty).map { case (k, v2) =>
              (k, JsonMini.str(v2).orNull) },
          JsonMini.long(ad.getOrElse("size", 0.0)).getOrElse(0L),
          JsonMini.long(ad.getOrElse("modificationTime", 0.0))
            .getOrElse(0L),
          ad.get("dataChange").contains(true))
      }
      m.get("remove").flatMap(JsonMini.obj).foreach { rm =>
        removes += JsonMini.str(rm.getOrElse("path", return None))
          .getOrElse(return None)
      }
      m.get("metaData").flatMap(JsonMini.obj).foreach { md =>
        meta = Some(Meta(
          JsonMini.str(md.getOrElse("id", "")).getOrElse(""),
          JsonMini.str(md.getOrElse("schemaString", return None))
            .getOrElse(return None),
          JsonMini.arr(md.getOrElse("partitionColumns", Seq.empty))
            .getOrElse(Seq.empty)
            .map(x => JsonMini.str(x).getOrElse(return None))))
      }
      m.get("protocol").flatMap(JsonMini.obj).foreach { pr =>
        protocol = Some(Protocol(
          JsonMini.long(pr.getOrElse("minReaderVersion", return None))
            .getOrElse(return None).toInt,
          JsonMini.long(pr.getOrElse("minWriterVersion", return None))
            .getOrElse(return None).toInt))
      }
    }
    Some(CommitActions(adds.result(), removes.result(), meta,
      protocol))
  }

  // ---------------------------------------------------------------
  // Snapshot reconstruction
  // ---------------------------------------------------------------

  private def listLog(spark: SparkSession, table: String)
      : (Seq[Long], Seq[Long]) = {
    val (f, p) = fs(spark, logDir(table))
    if (!f.exists(p)) sys.error(s"not a delta table: $table")
    val names = f.listStatus(p).map(_.getPath.getName).toSeq
    val commits = names.collect {
      case n if n.length == 25 && n.endsWith(".json") &&
        n.take(20).forall(_.isDigit) => n.take(20).toLong
    }.sorted
    val checkpoints = names.collect {
      case n if n.endsWith(".checkpoint.parquet") &&
        n.take(20).forall(_.isDigit) => n.take(20).toLong
    }.sorted
    (commits, checkpoints)
  }

  /** State reconstruction at `versionOpt` (None = latest). */
  def snapshot(spark: SparkSession, table: String,
      versionOpt: Option[Long] = None): Snapshot = {
    val (commits, checkpoints) = listLog(spark, table)
    require(commits.nonEmpty || checkpoints.nonEmpty,
      s"empty delta log: $table")
    val latest = (commits ++ checkpoints).max
    val version = versionOpt.getOrElse(latest)
    require(version >= 0 && version <= latest,
      s"version $version out of range [0,$latest]")

    val cpv = checkpoints.filter(_ <= version) match {
      case Seq() => None
      case cs => Some(cs.max)
    }
    var meta: Option[Meta] = None
    var protocol: Option[Protocol] = None
    val files = scala.collection.mutable.LinkedHashMap[String, AddFile]()

    cpv.foreach { v =>
      val cp = spark.read.parquet(
        s"${logDir(table)}/${checkpointFile(v)}")
      val cols = cp.columns.toSet
      def takeStruct(name: String): Seq[Row] =
        if (cols(name))
          cp.filter(col(name).isNotNull).select(col(name + ".*"))
            .collect().toSeq
        else Seq.empty
      takeStruct("protocol").foreach { r =>
        protocol = Some(Protocol(r.getAs[Int]("minReaderVersion"),
          r.getAs[Int]("minWriterVersion")))
      }
      takeStruct("metaData").foreach { r =>
        meta = Some(Meta(r.getAs[String]("id"),
          r.getAs[String]("schemaString"),
          // Row arrays surface as mutable.ArraySeq in 2.13
          r.getAs[scala.collection.Seq[String]]("partitionColumns")
            .toSeq))
      }
      takeStruct("add").foreach { r =>
        val a = AddFile(r.getAs[String]("path"),
          Option(r.getAs[Map[String, String]]("partitionValues"))
            .getOrElse(Map.empty),
          r.getAs[Long]("size"),
          r.getAs[Long]("modificationTime"),
          r.getAs[Boolean]("dataChange"))
        files(a.path) = a
      }
      // remove rows in a checkpoint are expired tombstones — they
      // carry no live state; nothing to apply
    }

    val replayFrom = cpv.map(_ + 1).getOrElse(0L)
    val need = (replayFrom to version)
    val have = commits.filter(v => v >= replayFrom && v <= version)
    require(have == need,
      s"torn delta log: have versions $have, need $need")
    need.foreach { v =>
      val text = readText(spark,
        s"${logDir(table)}/${commitFile(v)}")
      val c = parseCommit(text).getOrElse(
        sys.error(s"malformed commit $v in $table"))
      c.adds.foreach(a => files(a.path) = a)
      c.removes.foreach(p => files.remove(p): Unit)
      c.meta.foreach(m => meta = Some(m))
      c.protocol.foreach(p => protocol = Some(p))
    }
    val p = protocol.getOrElse(sys.error(s"no protocol in $table"))
    require(p.minReader <= 2,
      s"unsupported delta reader version ${p.minReader} (reader " +
        "features such as deletion vectors are not supported — " +
        "refusing to mis-read)")
    Snapshot(version,
      meta.getOrElse(sys.error(s"no metaData in $table")), p,
      files.values.toSeq)
  }

  /** The table as a DataFrame at `versionOpt` (None = latest). */
  def read(spark: SparkSession, table: String,
      versionOpt: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, table, versionOpt)
    readFiles(spark, table, snap.meta, snap.files)
  }

  /** A file SUBSET of a table as a DataFrame — the scan-building
    * half of [[read]], shared with the log-tail streaming twin:
    * one pruned scan per partition-value combination, partition
    * columns injected as typed literals (protocol: values live in
    * the log, not the files). */
  def readFiles(spark: SparkSession, table: String, meta: Meta,
      files: Seq[AddFile]): DataFrame = {
    val schema = DataType.fromJson(meta.schemaString)
      .asInstanceOf[StructType]
    val partCols = meta.partitionColumns
    val dataSchema = StructType(
      schema.fields.filterNot(f => partCols.contains(f.name)))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val groups = files.groupBy(_.partitionValues).toSeq
    groups.map { case (pv, fs0) =>
      val base = spark.read.schema(dataSchema)
        .parquet(fs0.map(f => s"$table/${f.path}"): _*)
      partCols.foldLeft(base) { (df, c) =>
        val f = schema(c)
        val raw = pv.get(c).orNull
        df.withColumn(c,
          (if (raw == null) lit(null) else lit(raw))
            .cast(f.dataType))
      }.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }.reduce(_ union _)
  }

  // ---------------------------------------------------------------
  // Table creation + checkpointing (the write path)
  // ---------------------------------------------------------------

  /** Create a delta table at `table` from `df`, optionally
    * partitioned: writes the parquet data (one directory level per
    * partition column, hive-style) and commit 0. Returns the add
    * actions for callers composing further commits. */
  def create(spark: SparkSession, df: DataFrame, table: String,
      partitionBy: Seq[String] = Seq.empty): Seq[AddFile] = {
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(table)
    val adds = listDataFiles(spark, table, partitionBy)
    val meta = Meta(java.util.UUID.nameUUIDFromBytes(
      table.getBytes("UTF-8")).toString,
      df.schema.json, partitionBy)
    commit(spark, table, 0L,
      Seq(protocolJson(Protocol(1, 2)), metaJson(meta)) ++
        adds.map(addJson))
    adds
  }

  /** List hive-style data files under `table` (excluding the log)
    * as add actions with partitionValues parsed from dir names. */
  def listDataFiles(spark: SparkSession, table: String,
      partitionBy: Seq[String]): Seq[AddFile] = {
    val (f, root0) = fs(spark, table)
    val root = f.makeQualified(root0)
    val out = Seq.newBuilder[AddFile]
    def walk(p: org.apache.hadoop.fs.Path,
        pv: Map[String, String]): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          if (name != "_delta_log") {
            val kv = name.split("=", 2)
            walk(st.getPath,
              if (kv.length == 2) pv + (kv(0) ->
                java.net.URLDecoder.decode(kv(1), "UTF-8"))
              else pv)
          }
        } else if (name.endsWith(".parquet") && !name.startsWith("_")
          && !name.startsWith(".")) {
          val rel = root.toUri.relativize(
            f.makeQualified(st.getPath).toUri).getPath
          out += AddFile(rel, pv, st.getLen,
            st.getModificationTime, dataChange = true)
        }
      }
    walk(root, Map.empty)
    out.result().sortBy(_.path)
  }

  /** Classic single-file checkpoint at `version` + the
    * `_last_checkpoint` pointer. */
  def writeCheckpoint(spark: SparkSession, table: String,
      version: Long): Unit = {
    val snap = snapshot(spark, table, Some(version))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues",
        MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val cpType = StructType(Seq(
      StructField("protocol", protoType),
      StructField("metaData", metaType),
      StructField("add", addType)))
    val rows =
      Row(Row(snap.protocol.minReader, snap.protocol.minWriter),
        null, null) +:
      Row(null, Row(snap.meta.id, snap.meta.schemaString,
        snap.meta.partitionColumns), null) +:
      snap.files.map(a => Row(null, null,
        Row(a.path, a.partitionValues, a.size, a.modificationTime,
          a.dataChange)))
    val tmp = s"${logDir(table)}/.cp_$version.tmp"
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cpType)
      .write.mode("overwrite").parquet(tmp)
    // single part file → the protocol's one-file checkpoint name
    val (f, tmpP) = fs(spark, tmp)
    val part = f.listStatus(tmpP).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error("checkpoint write produced no parquet"))
    val dst = new org.apache.hadoop.fs.Path(
      s"${logDir(table)}/${checkpointFile(version)}")
    if (f.exists(dst)) f.delete(dst, false)
    f.rename(part, dst)
    f.delete(tmpP, true)
    writeText(spark, s"${logDir(table)}/_last_checkpoint",
      s"""{"version":$version,"size":${rows.length}}""")
  }
}
