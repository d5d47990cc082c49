package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Apache Hudi COPY-ON-WRITE tables (the PUBLIC table spec,
  * hudi.apache.org/tech-specs, classic table-version-6 layout) —
  * the third lakehouse format alongside [[DeltaLog]] and
  * [[Iceberg]], read and written from the spec, no hudi-spark.
  *
  * Layout: `.hoodie/hoodie.properties` (java properties; table
  * type gate), a flat timeline of instant files
  * `<instant>.<action>[.<state>]` where a COMPLETED instant has no
  * state suffix (`.requested`/`.inflight` are pending and their
  * data files MUST stay invisible), and base files named
  * `<fileId>_<writeToken>_<instant>.parquet` inside partition
  * directories (each holding a `.hoodie_partition_metadata`). A
  * FILE GROUP is (partitionPath, fileId); copy-on-write replaces a
  * group's base file wholesale at each commit, so a snapshot is
  * "the newest completed base file of every live file group".
  *
  * Reading ([[read]] / [[snapshotFiles]]):
  *  - parse `hoodie.properties`; only `COPY_ON_WRITE` reads
  *    (MERGE_ON_READ needs log-block merging — honest rejection).
  *  - list completed `commit` / `replacecommit` instants, replay in
  *    instant order: each `partitionToWriteStats` entry upserts its
  *    file group to the stat's `path`; a replacecommit's
  *    `partitionToReplaceFileIds` kills groups first (clustering /
  *    insert-overwrite), then its own writeStats add the
  *    replacement groups. `clean` instants are no-ops for
  *    selection (they only delete already-superseded files).
  *  - every selected path must parse back to its group's fileId and
  *    a completed instant — a data file on disk with no completed
  *    commit is ignored (pending-write invisibility), and a commit
  *    naming a missing file errors (a torn table must not shrink
  *    silently).
  *  - the snapshot is then ONE pruned parquet scan over the
  *    selected base files — Hudi base files carry full rows
  *    (including partition columns and the five `_hoodie_*` meta
  *    columns), so pushdown/pruning reach the scan untouched.
  *
  * Writing ([[create]] / [[upsert]] / [[insertOverwrite]] — the
  * fixture/migration path): deterministic file groups per
  * partition, meta columns stamped per spec (`_hoodie_commit_time`,
  * `_hoodie_commit_seqno`, `_hoodie_record_key`,
  * `_hoodie_partition_path`, `_hoodie_file_name`), instants as
  * zero-padded 14-digit strings, commit JSON with
  * partitionToWriteStats in the public HoodieCommitMetadata shape.
  *
  * Scale (100 TB): timeline listing is O(#instants) and group
  * replay O(#file groups) on the driver — the same contract as
  * Hudi's own FileSystemView — while data is only touched by
  * executor-side parquet scans. Validation: HudiSpec (round trips,
  * upsert/replace semantics, pending invisibility, MOR/torn-
  * timeline rejections) and the `hudi_snapshot` gate query whose
  * oracle recomputes a create→upsert→insert-overwrite→pending
  * history analytically. */
object Hudi {

  final case class WriteStat(partition: String, fileId: String,
      path: String, numWrites: Long)
  final case class Instant(time: String, action: String,
      writeStats: Seq[WriteStat],
      replacedFileIds: Map[String, Seq[String]])

  val MetaCols: Seq[String] = Seq("_hoodie_commit_time",
    "_hoodie_commit_seqno", "_hoodie_record_key",
    "_hoodie_partition_path", "_hoodie_file_name")

  // ---------------------------------------------------------------
  // Timeline + properties
  // ---------------------------------------------------------------

  /** `<fileId>_<writeToken>_<instant>.parquet` → (fileId, instant).
    * fileIds may themselves contain no '_'; reject otherwise. */
  def parseBaseFileName(name: String): Option[(String, String)] = {
    if (!name.endsWith(".parquet")) return None
    val stem = name.dropRight(".parquet".length)
    val parts = stem.split('_')
    if (parts.length != 3 || parts.exists(_.isEmpty)) None
    else if (!parts(2).forall(_.isDigit)) None
    else Some((parts(0), parts(2)))
  }

  private def readProps(f: java.io.File): Option[Map[String, String]] =
    if (!f.isFile) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8").linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val i = l.indexOf('=')
        if (i <= 0) None else Some((l.take(i), l.drop(i + 1)))
      }.toMap)

  private def statOf(v: Any): Option[WriteStat] = for {
    m <- JsonMini.obj(v)
    fid <- m.get("fileId").flatMap(JsonMini.str)
    path <- m.get("path").flatMap(JsonMini.str)
    part <- m.get("partitionPath").flatMap(JsonMini.str)
  } yield WriteStat(part, fid,
    path, m.get("numWrites").flatMap(JsonMini.long).getOrElse(0L))

  /** Parse one completed commit/replacecommit JSON. None on any
    * malformation — a torn timeline fails the read. */
  def parseCommit(time: String, action: String, text: String)
      : Option[Instant] = for {
    root <- JsonMini.parse(text).flatMap(JsonMini.obj)
    statsMap <- root.get("partitionToWriteStats")
      .flatMap(JsonMini.obj)
    stats <- statsMap.toSeq.sortBy(_._1).foldLeft(
      Option(Seq.empty[WriteStat])) { case (acc, (part, arr)) =>
      for {
        a <- acc
        vs <- JsonMini.arr(arr)
        ss <- vs.foldLeft(Option(Seq.empty[WriteStat])) { (a2, v) =>
          for { s2 <- a2; st <- statOf(v)
            if st.partition == part } yield s2 :+ st
        }
      } yield a ++ ss
    }
    replaced <- root.get("partitionToReplaceFileIds") match {
      case None => Some(Map.empty[String, Seq[String]])
      case Some(v) => JsonMini.obj(v).flatMap { m =>
        m.foldLeft(Option(Map.empty[String, Seq[String]])) {
          case (acc, (part, ids)) => for {
            a <- acc
            vs <- JsonMini.arr(ids)
            ss <- vs.foldLeft(Option(Seq.empty[String])) { (a2, x) =>
              for { s2 <- a2; s <- JsonMini.str(x) } yield s2 :+ s
            }
          } yield a + (part -> ss)
        }
      }
    }
  } yield Instant(time, action, stats, replaced)

  /** List completed commit/replacecommit instants, instant order.
    * sys.error on malformed commit JSON or a non-COW table. */
  def timeline(tablePath: String): Seq[Instant] = {
    val hoodie = new java.io.File(tablePath, ".hoodie")
    require(hoodie.isDirectory, s"not a hudi table: $tablePath")
    val props = readProps(new java.io.File(hoodie,
      "hoodie.properties")).getOrElse(
      sys.error("hoodie.properties missing or unreadable"))
    val tpe = props.getOrElse("hoodie.table.type",
      sys.error("hoodie.table.type missing"))
    require(tpe == "COPY_ON_WRITE",
      s"unsupported hudi table type $tpe (MERGE_ON_READ needs " +
        "log-block merging; honest rejection)")
    val completed = hoodie.listFiles().toSeq
      .filter(_.isFile)
      .flatMap { f =>
        f.getName.split('.') match {
          case Array(ts, action)
            if ts.nonEmpty && ts.forall(_.isDigit) &&
              (action == "commit" || action == "replacecommit") =>
            Some((ts, action, f))
          case _ => None // pending states, properties, other actions
        }
      }
      .sortBy { case (ts, _, _) => (ts.length, ts) }
    require(completed.map(_._1).distinct.length == completed.length,
      "duplicate instant time in timeline")
    completed.map { case (ts, action, f) =>
      parseCommit(ts, action, new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        .getOrElse(sys.error(s"malformed $action at instant $ts"))
    }
  }

  /** Replay the timeline to the live file-group map; returns the
    * selected base-file paths (absolute). */
  def snapshotFiles(tablePath: String): Seq[String] = {
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (String, String)] // group -> (instant, path)
    timeline(tablePath).foreach { ins =>
      ins.replacedFileIds.foreach { case (part, ids) =>
        ids.foreach(id => groups.remove((part, id)))
      }
      ins.writeStats.foreach { st =>
        val name = st.path.split('/').last
        val (fid, fInstant) = parseBaseFileName(name).getOrElse(
          sys.error(s"bad base file name in commit: ${st.path}"))
        require(fid == st.fileId,
          s"fileId ${st.fileId} disagrees with file name $name")
        require(fInstant == ins.time,
          s"file instant $fInstant disagrees with commit ${ins.time}")
        groups((st.partition, st.fileId)) = (ins.time, st.path)
      }
    }
    groups.values.toSeq.map { case (_, rel) =>
      val f = new java.io.File(tablePath, rel)
      require(f.isFile, s"committed base file missing: $rel")
      f.getAbsolutePath
    }
  }

  /** Snapshot read: one parquet scan over the live base files
    * (full rows live in the files — pushdown intact). Empty
    * snapshot of a valid table reads as an empty DataFrame only
    * when a schema source exists; we reject instead (no live
    * files means nothing to infer from — honest). */
  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val files = snapshotFiles(tablePath)
    require(files.nonEmpty, s"no live file groups in $tablePath")
    spark.read.parquet(files: _*)
  }

  // ---------------------------------------------------------------
  // Writer (fixtures + migration): deterministic file groups
  // ---------------------------------------------------------------

  private def fileIdFor(partition: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(partition.getBytes("UTF-8"))
    "fg-" + md.take(6).map("%02x".format(_)).mkString + "-0"
  }

  private def pad14(n: Long): String = "%014d".format(n)

  /** Write one partition's base file for `instant`; returns its
    * WriteStat. The row set is small per fixture partition —
    * the single-file write is the COW contract (one base file per
    * group per commit), not a scale compromise. */
  private def writeGroup(df: DataFrame, tablePath: String,
      partition: String, instant: String, keyExpr: String)
      : WriteStat = {
    val fid = fileIdFor(partition)
    val name = s"${fid}_0-0-0_$instant.parquet"
    val rel = if (partition.isEmpty) name else s"$partition/$name"
    val n = df.count()
    val stamped = df
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat(lit(s"${instant}_0_"),
          monotonically_increasing_id().cast("string")))
      .withColumn("_hoodie_record_key", expr(keyExpr).cast("string"))
      .withColumn("_hoodie_partition_path", lit(partition))
      .withColumn("_hoodie_file_name", lit(name))
      // meta columns lead, per the on-disk convention
      .select((MetaCols.map(col) ++
        df.columns.map(c => col(c))): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hudi_w")
    stamped.coalesce(1).write.mode("overwrite")
      .parquet(tmp.toAbsolutePath.toString)
    val part = tmp.toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(tablePath, rel)
    dst.getParentFile.mkdirs()
    val pm = new java.io.File(dst.getParentFile,
      ".hoodie_partition_metadata")
    if (!pm.exists()) java.nio.file.Files.write(pm.toPath,
      s"#partition metadata\ncommitTime=$instant\npartitionDepth=${
        if (partition.isEmpty) 0 else 1}\n".getBytes("UTF-8"))
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteRec(tmp.toFile)
    WriteStat(partition, fid, rel, n)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }

  private def renderCommit(ins: Instant): String = {
    val statsByPart = ins.writeStats.groupBy(_.partition).toSeq
      .sortBy(_._1)
    def statJson(s: WriteStat): String =
      s"""{"fileId":${JsonMini.quote(s.fileId)},""" +
        s""""path":${JsonMini.quote(s.path)},""" +
        s""""partitionPath":${JsonMini.quote(s.partition)},""" +
        s""""numWrites":${s.numWrites},"numDeletes":0,""" +
        s""""totalWriteErrors":0}"""
    val stats = statsByPart.map { case (p, ss) =>
      s"${JsonMini.quote(p)}:[${ss.map(statJson).mkString(",")}]"
    }.mkString("{", ",", "}")
    val replaced =
      if (ins.replacedFileIds.isEmpty) ""
      else {
        val m = ins.replacedFileIds.toSeq.sortBy(_._1)
          .map { case (p, ids) =>
            s"${JsonMini.quote(p)}:[${
              ids.map(JsonMini.quote).mkString(",")}]"
          }.mkString("{", ",", "}")
        s""","partitionToReplaceFileIds":$m"""
      }
    s"""{"partitionToWriteStats":$stats,"compacted":false,""" +
      s""""extraMetadata":{},"operationType":${
        JsonMini.quote(if (ins.action == "replacecommit")
          "INSERT_OVERWRITE" else "UPSERT")}$replaced}"""
  }

  private def writeInstant(tablePath: String, ins: Instant): Unit = {
    val hoodie = new java.io.File(tablePath, ".hoodie")
    val base = s"${ins.time}.${ins.action}"
    // the real writer's lifecycle: requested -> inflight -> complete
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$base.requested").toPath,
      Array.emptyByteArray)
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$base.inflight").toPath,
      Array.emptyByteArray)
    java.nio.file.Files.write(new java.io.File(hoodie, base).toPath,
      renderCommit(ins).getBytes("UTF-8"))
  }

  /** Create a COW table: one file group per partition value at
    * instant 1. `partitionExpr` must yield a string; `keyExpr` the
    * record key. */
  def create(spark: SparkSession, df: DataFrame, tablePath: String,
      keyExpr: String, partitionExpr: String,
      tableName: String = "graft_tbl"): Unit = {
    val hoodie = new java.io.File(tablePath, ".hoodie")
    require(!hoodie.exists(), s"table exists: $tablePath")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      (s"#graft hudi writer\nhoodie.table.name=$tableName\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n" +
        "hoodie.timeline.layout.version=1\n").getBytes("UTF-8"))
    commitGroups(spark, df, tablePath, keyExpr, partitionExpr,
      pad14(1L), "commit", Map.empty)
  }

  private def partitions(df: DataFrame, partitionExpr: String)
      : Seq[String] = {
    import df.sparkSession.implicits._
    // partition VALUES are dimension-sized by definition
    df.selectExpr(s"cast(($partitionExpr) as string)")
      .as[String].distinct().collect().toSeq.sorted
  }

  private def commitGroups(spark: SparkSession, df: DataFrame,
      tablePath: String, keyExpr: String, partitionExpr: String,
      instant: String, action: String,
      replaced: Map[String, Seq[String]]): Unit = {
    val parts = partitions(df, partitionExpr)
    val stats = parts.map { p =>
      writeGroup(
        df.where(expr(s"cast(($partitionExpr) as string) = '$p'")),
        tablePath, p, instant, keyExpr)
    }
    writeInstant(tablePath, Instant(instant, action, stats, replaced))
  }

  private def nextInstant(tablePath: String): String = {
    val last = timeline(tablePath).lastOption.map(_.time.toLong)
      .getOrElse(0L)
    pad14(last + 1)
  }

  /** COW upsert: rewrite every file group whose partition receives
    * rows, merging by key (new rows win). Data columns only in
    * `df` (meta columns are restamped). */
  def upsert(spark: SparkSession, df: DataFrame, tablePath: String,
      keyExpr: String, partitionExpr: String): Unit = {
    val instant = nextInstant(tablePath)
    val parts = partitions(df, partitionExpr)
    val current = read(spark, tablePath)
      .drop(MetaCols: _*)
    val dataCols = current.columns.toSeq
    require(df.columns.toSeq == dataCols,
      s"upsert schema ${df.columns.toSeq} != table $dataCols")
    val stats = parts.map { p =>
      val pFilter = expr(s"cast(($partitionExpr) as string) = '$p'")
      val incoming = df.where(pFilter)
      val existing = current.where(pFilter)
        .join(incoming.selectExpr(s"($keyExpr) as __k"),
          expr(s"($keyExpr) = __k"), "left_anti")
      writeGroup(existing.unionByName(incoming), tablePath, p,
        instant, keyExpr)
    }
    writeInstant(tablePath, Instant(instant, "commit", stats,
      Map.empty))
  }

  /** Insert-overwrite one partition through a replacecommit: the
    * old file group is listed in partitionToReplaceFileIds and a
    * fresh group (new fileId suffix) carries `df`'s rows. */
  def insertOverwrite(spark: SparkSession, df: DataFrame,
      tablePath: String, keyExpr: String, partition: String)
      : Unit = {
    val instant = nextInstant(tablePath)
    val oldId = fileIdFor(partition)
    // replacement group: a DIFFERENT deterministic fileId
    val fid = fileIdFor(partition + "#r")
    val name = s"${fid}_0-0-0_$instant.parquet"
    val rel = s"$partition/$name"
    val n = df.count()
    val stamped = df
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat(lit(s"${instant}_0_"),
          monotonically_increasing_id().cast("string")))
      .withColumn("_hoodie_record_key", expr(keyExpr).cast("string"))
      .withColumn("_hoodie_partition_path", lit(partition))
      .withColumn("_hoodie_file_name", lit(name))
      .select((MetaCols.map(col) ++
        df.columns.map(c => col(c))): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hudi_r")
    stamped.coalesce(1).write.mode("overwrite")
      .parquet(tmp.toAbsolutePath.toString)
    val part = tmp.toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(tablePath, rel)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteRec(tmp.toFile)
    writeInstant(tablePath, Instant(instant, "replacecommit",
      Seq(WriteStat(partition, fid, rel, n)),
      Map(partition -> Seq(oldId))))
  }

  /** Leave a PENDING commit behind: the base file exists on disk
    * but only requested/inflight markers are written — a snapshot
    * must not see its rows. */
  def pendingCommit(spark: SparkSession, df: DataFrame,
      tablePath: String, keyExpr: String, partition: String)
      : Unit = {
    val instant = nextInstant(tablePath)
    writeGroup(df, tablePath, partition, instant, keyExpr): Unit
    val hoodie = new java.io.File(tablePath, ".hoodie")
    java.nio.file.Files.write(new java.io.File(hoodie,
      s"$instant.commit.requested").toPath, Array.emptyByteArray)
    java.nio.file.Files.write(new java.io.File(hoodie,
      s"$instant.commit.inflight").toPath, Array.emptyByteArray)
  }
}
