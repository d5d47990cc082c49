package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delta, Iceberg, Hudi and the lakehouse ingest DAG — the Lakehouse slice of the [[Pipeline]]
  * catalog (round-13 split: pure moves out of the former
  * single-file Pipeline.scala; composed back via
  * `object Pipeline extends ...`). */
private[graft] trait PipelineLakehousePart extends Serializable { this: Pipeline.type =>
  /** Delta-table fixture (operators/DeltaLog): a 3-version
    * partitioned lakehouse table derived from lineitem, built ONCE
    * per sf dir —
    *   v0  create, partitioned by `bucket = l_orderkey % 4`
    *   v1  rewrite of bucket=1: rows with l_quantity ≤ 10 deleted
    *       (remove + filtered add — the standard DELETE shape)
    *   checkpoint at v1 (+ `_last_checkpoint`)
    *   v2  append duplicating bucket=2 rows with l_quantity > 40
    * so the LATEST snapshot must reconstruct through checkpoint +
    * tail replay and v0 through pure JSON replay. */
  private[graft] def deltaFixtureRoot(s: SparkSession, dir: String): String =
    formatFixtureDir(dir, "delta", "lineitem") { out =>
      import graft.operators.DeltaLog
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      DeltaLog.create(s, base, t, partitionBy = Seq("bucket"))
      // v1: DELETE FROM bucket=1 WHERE l_quantity <= 10, as a
      // remove-files + add-rewrite commit
      val snap0 = DeltaLog.snapshot(s, t)
      val victims = snap0.files.filter(
        _.partitionValues.get("bucket").contains("1"))
      base.filter("bucket = 1 AND l_quantity > 10")
        .drop("bucket")
        .write.parquet(s"$t/bucket=1/rw")
      val rewrite = DeltaLog.listDataFiles(s, t, Seq("bucket"))
        .filter(_.path.startsWith("bucket=1/rw/"))
      DeltaLog.commit(s, t, 1L,
        victims.map(f => DeltaLog.removeJson(f.path, 1L)) ++
          rewrite.map(DeltaLog.addJson))
      DeltaLog.writeCheckpoint(s, t, 1L)
      // v2: append a duplicate slice of bucket=2
      base.filter("bucket = 2 AND l_quantity > 40")
        .drop("bucket")
        .write.parquet(s"$t/bucket=2/app")
      val app = DeltaLog.listDataFiles(s, t, Seq("bucket"))
        .filter(_.path.startsWith("bucket=2/app/"))
      DeltaLog.commit(s, t, 2L, app.map(DeltaLog.addJson))
    }
  /** Delta Change Data Feed fixture: CDF-enabled table, v0 create
    * (inserts), v1 UPDATE carrying real `cdc` actions + a
    * `_change_data` parquet file (pre/postimage rows), v2 DELETE
    * with plain remove actions (no cdc — the reader must DERIVE
    * delete rows from the removed files' prior-version content). */
  private[graft] def deltaCdfFixtureRoot(s: SparkSession, dir: String)
      : String =
    formatFixtureDir(dir, "deltacdf3", "lineitem") { out =>
      import graft.operators.DeltaLog
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      // several data files per partition (repartition before the
      // partitioned write) so the v3 compaction below has real
      // bin-packing work at every scale factor
      DeltaLog.create(s, base.repartition(4), t,
        partitionBy = Seq("bucket"),
        configuration =
          Map("delta.enableChangeDataFeed" -> "true"))
      // v1: UPDATE bucket=3 rows with l_quantity > 45 (qty += 5),
      // rewriting the partition and recording pre/postimages as a
      // cdc file
      val snap0 = DeltaLog.snapshot(s, t)
      val victims = snap0.files.filter(
        _.partitionValues.get("bucket").contains("3"))
      val b3new = base.filter("bucket = 3").drop("bucket")
        .withColumn("l_quantity",
          expr("CASE WHEN l_quantity > 45 THEN l_quantity + 5 " +
            "ELSE l_quantity END"))
      b3new.write.parquet(s"$t/bucket=3/rw")
      val rewrite = DeltaLog.listDataFiles(s, t, Seq("bucket"))
        .filter(_.path.startsWith("bucket=3/rw/"))
      val touched = base.filter("bucket = 3 AND l_quantity > 45")
        .drop("bucket")
      val cdcDf = touched
        .withColumn("_change_type", lit("update_preimage"))
        .unionByName(touched
          .withColumn("l_quantity", expr("l_quantity + 5"))
          .withColumn("_change_type", lit("update_postimage")))
      cdcDf.coalesce(1).write.parquet(s"$t/_change_data/b3")
      val cdcFiles = Option(new java.io.File(s"$t/_change_data/b3")
        .listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
      require(cdcFiles.nonEmpty, "cdc fixture wrote no parquet")
      DeltaLog.commit(s, t, 1L,
        victims.map(f => DeltaLog.removeJson(f.path, 1L)) ++
          rewrite.map(DeltaLog.addJson) ++
          cdcFiles.map(f => DeltaLog.cdcJson(
            s"_change_data/b3/${f.getName}",
            Map("bucket" -> "3"), f.length())))
      // v2: DELETE the whole bucket=0 partition — remove actions
      // only, no cdc; CDF must derive the delete rows
      val snap1 = DeltaLog.snapshot(s, t)
      val victims0 = snap1.files.filter(
        _.partitionValues.get("bucket").contains("0"))
      DeltaLog.commit(s, t, 2L,
        victims0.map(f => DeltaLog.removeJson(f.path, 2L)))
      // v3: OPTIMIZE-style compaction — dataChange=false actions,
      // so the change feed across it must stay EMPTY
      val before = DeltaLog.snapshot(s, t).files.length
      val v = DeltaLog.compact(s, t)
      require(v == 3L, s"compaction committed $v, expected 3")
      require(DeltaLog.snapshot(s, t).files.length < before,
        "compaction did not shrink the file list")
    }
  /** Delta Change Data Feed read (r13): `table_changes(0, 3)` over
    * the CDF fixture — v0 inserts from add actions, v1
    * update pre/postimages from REAL `cdc` actions + `_change_data`
    * files, v2 deletes DERIVED from remove actions against the
    * prior snapshot, v3 an OPTIMIZE-style compaction whose
    * dataChange=false actions must contribute NOTHING to the feed
    * (the oracle does not know about v3 at all) — aggregated per
    * (change type, version, bucket). The oracle replays the same history analytically, so
    * a wrong change classification, a missed preimage, a cdc file
    * leaking into snapshots or a mis-derived delete flips the
    * hash. */
  private[graft] def deltaCdfScan(s: SparkSession, dir: String)
      : DataFrame = {
    val root = deltaCdfFixtureRoot(s, dir)
    graft.operators.DeltaLog.tableChanges(s, s"$root/tbl", 0L, 3L)
      .groupBy(col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"),
        col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 4).as("qsum"),
        sum("l_orderkey").as("oksum"))
      .orderBy("change_type", "commit_version", "bucket")
  }
  /** Delta lakehouse scan (r12) — the LATEST snapshot of the
    * fixture table read through OUR transaction-log reconstruction
    * (checkpoint at v1 + the v2 JSON tail; add/remove replay;
    * partition values injected from the log as typed columns) and
    * aggregated per return flag. The oracle recomputes the same
    * table state analytically from lineitem, so a wrong file list,
    * a missed remove, a mis-typed partition column or a torn replay
    * all flip counts. Scan + agg shape: pushdown survives per
    * partition-group branch; the log walk is O(#commits) driver
    * metadata, the DATA never leaves executor parquet scans. */
  private[graft] def deltaScan(s: SparkSession, dir: String): DataFrame = {
    val root = deltaFixtureRoot(s, dir)
    graft.operators.DeltaLog.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** Delta time travel (r12) — the SAME table at version 0, which
    * must reconstruct through pure JSON replay (ignoring the later
    * checkpoint) and equal plain lineitem. */
  private[graft] def deltaTimeTravel(s: SparkSession, dir: String)
      : DataFrame = {
    val root = deltaFixtureRoot(s, dir)
    graft.operators.DeltaLog.read(s, s"$root/tbl", Some(0L))
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** V2-checkpoint delta fixture (late r12): the SAME 3-step story
    * as [[deltaFixtureRoot]], but the v1 commit also upgrades the
    * protocol to reader v3 + `v2Checkpoint`, the checkpoint at v1
    * is a V2 one — a UUID-named parquet MANIFEST whose add actions
    * live in two `_sidecars/` parquet files — and commits 0..1 are
    * pruned away (log cleanup), so the read MUST reconstruct
    * through the manifest + sidecars + the v2 JSON tail. */
  private[graft] def deltaV2CpFixtureRoot(s: SparkSession, dir: String)
      : String =
    formatFixtureDir(dir, "delta_v2cp", "lineitem") { out =>
      import graft.operators.DeltaLog
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      DeltaLog.create(s, base, t, partitionBy = Seq("bucket"))
      val snap0 = DeltaLog.snapshot(s, t)
      val victims = snap0.files.filter(
        _.partitionValues.get("bucket").contains("1"))
      base.filter("bucket = 1 AND l_quantity > 10")
        .drop("bucket")
        .write.parquet(s"$t/bucket=1/rw")
      val rewrite = DeltaLog.listDataFiles(s, t, Seq("bucket"))
        .filter(_.path.startsWith("bucket=1/rw/"))
      DeltaLog.commit(s, t, 1L,
        DeltaLog.protocolJson(DeltaLog.Protocol(3, 7,
          Seq("v2Checkpoint"))) +:
          (victims.map(f => DeltaLog.removeJson(f.path, 1L)) ++
            rewrite.map(DeltaLog.addJson)))
      DeltaLog.writeCheckpointV2(s, t, 1L, sidecarParts = 2)
      // log cleanup: the pre-checkpoint commits go away, so only
      // the v2 manifest can supply the v1 state
      Seq(0L, 1L).foreach(v => new java.io.File(
        s"$t/_delta_log", f"$v%020d.json").delete())
      base.filter("bucket = 2 AND l_quantity > 40")
        .drop("bucket")
        .write.parquet(s"$t/bucket=2/app")
      val app = DeltaLog.listDataFiles(s, t, Seq("bucket"))
        .filter(_.path.startsWith("bucket=2/app/"))
      DeltaLog.commit(s, t, 2L, app.map(DeltaLog.addJson))
    }
  /** Delta V2-CHECKPOINT scan (late r12) — the latest snapshot can
    * ONLY be reconstructed through the v2 checkpoint (UUID-named
    * parquet manifest, self-identifying `checkpointMetadata`, adds
    * in `_sidecars/` files) because the fixture pruned the early
    * commits; the same aggregate + analytic oracle as
    * [[deltaScan]], so a missed sidecar, a manifest/version
    * mismatch or a mis-read add row flips counts. */
  private[graft] def deltaCheckpointV2(s: SparkSession, dir: String)
      : DataFrame = {
    val root = deltaV2CpFixtureRoot(s, dir)
    graft.operators.DeltaLog.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** Reader-version-3 delta fixture (late r12): lineitem written
    * ONCE, then one DV DELETE commit — every row with
    * l_quantity ≤ 5 masked through REAL deletion vectors (roaring
    * bitmaps over `_metadata.row_index`), half the files inline-Z85
    * descriptors, half UUID-named `.bin` blobs with CRC framing;
    * no data file is rewritten. */
  private[graft] def deltaDvFixtureRoot(s: SparkSession, dir: String)
      : String =
    formatFixtureDir(dir, "delta_dv", "lineitem") { out =>
      import graft.operators.DeltaLog
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
      DeltaLog.create(s, base.repartition(8), t)
      val snap0 = DeltaLog.snapshot(s, t)
      // row indices to delete, per file (executor scan, small
      // collect — only the deleted side comes back)
      val victims = s.read.parquet(t)
        .select(col("_metadata.file_path").as("fp"),
          col("_metadata.row_index").as("ri"))
        .filter(col("l_quantity") <= 5)
        .collect()
        .groupBy(r => {
          val fp = r.getString(0)
          fp.substring(fp.indexOf(t) + t.length + 1)
        })
        .map { case (rel, rows) =>
          rel -> rows.map(_.getLong(1)).sorted }
      val ordered = victims.toSeq.sortBy(_._1)
      val (fileSide, inlineSide) =
        (ordered.take(ordered.length / 2).toMap,
          ordered.drop(ordered.length / 2).toMap)
      DeltaLog.commit(s, t, 1L,
        Seq(DeltaLog.protocolJson(DeltaLog.Protocol(3, 7,
          Seq("deletionVectors")))) ++
          DeltaLog.dvDeleteActions(s, t, snap0.files, fileSide,
            inlineMax = 0) ++
          DeltaLog.dvDeleteActions(s, t, snap0.files, inlineSide,
            inlineMax = 1 << 20))
    }
  /** Delta DELETION-VECTOR scan (late r12) — the latest snapshot
    * reads through the v3 protocol gate, decodes every DV (both
    * storage forms live in the fixture), and masks rows via the
    * broadcast bitmaps + `_metadata.row_index`; the oracle
    * recomputes the surviving rows from raw lineitem, so a wrong
    * roaring container walk, Z85 slip, CRC miss or off-by-one row
    * index resurrects or loses rows and flips the hash. */
  private[graft] def deltaDvScan(s: SparkSession, dir: String): DataFrame = {
    val root = deltaDvFixtureRoot(s, dir)
    graft.operators.DeltaLog.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Column-mapped delta fixture + scan (late r12): the SAME
    * lineitem columns stored in parquet under opaque PHYSICAL
    * names (`col-<n>`), resolved back to logical names through the
    * schema's `delta.columnMapping.physicalName` metadata under
    * mode "name" — the layout modern writers produce after any
    * RENAME COLUMN. A wrong mapping mis-names every value; the
    * oracle is plain lineitem. */
  private[graft] def deltaColumnMapping(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.DeltaLog
    val root = formatFixtureDir(dir, "delta_cm", "lineitem") { out =>
      val t = s"$out/tbl"
      val logical = Seq("l_orderkey", "l_partkey", "l_quantity",
        "l_returnflag")
      val base = Tables.lineitem(s, dir).selectExpr(logical: _*)
      val physical = logical.zipWithIndex.map { case (_, i) =>
        s"col-${i + 1}" }
      base.toDF(physical: _*).write.parquet(t)
      val adds = DeltaLog.listDataFiles(s, t, Seq.empty)
      val fieldsJson = base.schema.fields.zip(physical).map {
        case (f, ph) =>
          s"""{"name":${graft.operators.JsonMini.quote(f.name)},""" +
            s""""type":"${f.dataType.typeName}","nullable":true,""" +
            s""""metadata":{"delta.columnMapping.id":1,""" +
            s""""delta.columnMapping.physicalName":"$ph"}}"""
      }.mkString(",")
      DeltaLog.commit(s, t, 0L,
        Seq(DeltaLog.protocolJson(DeltaLog.Protocol(3, 7,
          Seq("columnMapping"))),
          DeltaLog.metaJson(DeltaLog.Meta("cm",
            s"""{"type":"struct","fields":[$fieldsJson]}""",
            Seq.empty,
            Map("delta.columnMapping.mode" -> "name")))) ++
          adds.map(DeltaLog.addJson))
    }
    graft.operators.DeltaLog.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Column-mapping mode "id" (late r12): the same lineitem story
    * but the parquet files carry THROWAWAY physical names + field
    * IDs — id mode must resolve by ID alone (the post-rename state
    * where physical names have drifted). Same plain-lineitem
    * oracle as the "name"-mode query. */
  private[graft] def deltaColumnMappingId(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.DeltaLog
    import org.apache.spark.sql.types._
    val root = formatFixtureDir(dir, "delta_cmid", "lineitem") {
      out =>
      val t = s"$out/tbl"
      val logical = Seq(("l_orderkey", "long", 11L),
        ("l_partkey", "long", 22L), ("l_quantity", "double", 33L),
        ("l_returnflag", "string", 44L))
      val base = Tables.lineitem(s, dir)
        .selectExpr(logical.map(_._1): _*)
      val physSchema = StructType(base.schema.fields.zip(logical)
        .map { case (f, (_, _, id)) =>
          StructField(s"junk$id", f.dataType, nullable = true,
            new MetadataBuilder().putLong("parquet.field.id", id)
              .build())
        })
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      s.createDataFrame(base.rdd, physSchema).write.parquet(t)
      val adds = DeltaLog.listDataFiles(s, t, Seq.empty)
      val fieldsJson = logical.map { case (nm, tpe, id) =>
        s"""{"name":${graft.operators.JsonMini.quote(nm)},""" +
          s""""type":"$tpe","nullable":true,"metadata":{""" +
          s""""delta.columnMapping.id":$id,""" +
          s""""delta.columnMapping.physicalName":"col-$id"}}"""
      }.mkString(",")
      DeltaLog.commit(s, t, 0L,
        Seq(DeltaLog.protocolJson(DeltaLog.Protocol(3, 7,
          Seq("columnMapping"))),
          DeltaLog.metaJson(DeltaLog.Meta("cmid",
            s"""{"type":"struct","fields":[$fieldsJson]}""",
            Seq.empty,
            Map("delta.columnMapping.mode" -> "id")))) ++
          adds.map(DeltaLog.addJson))
    }
    graft.operators.DeltaLog.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Iceberg-table fixture (operators/Iceberg): the SAME 3-step
    * story as [[deltaFixtureRoot]] told in the other lakehouse
    * format — snapshot 1 create, snapshot 2 delete-rewrite of
    * bucket 1 (l_quantity ≤ 10 gone), snapshot 3 appending the
    * duplicate bucket-2 slice — so both formats answer to ONE
    * analytic oracle. Data files are written bucket-pure (Iceberg
    * files carry all columns; the manifests track file lists), the
    * manifest + manifest-list layer is OUR Avro codec. */
  private[graft] def icebergFixtureRoot(s: SparkSession, dir: String)
      : String =
    formatFixtureDir(dir, "iceberg", "lineitem") { out =>
      import graft.operators.Iceberg
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      val sch = base.schema
      val byBucket = (0 to 3).map { b =>
        base.filter(s"bucket = $b")
          .write.parquet(s"$t/data/s1/b$b")
        b -> Iceberg.countsByFile(s, sch, s"$t/data/s1/b$b")
      }.toMap
      val files1 = byBucket.values.flatten.toSeq.sortBy(_._1)
      Iceberg.commit(s, t, 1L, 1L, sch, files1, prior = Seq.empty)
      // snapshot 2: DELETE FROM bucket=1 WHERE l_quantity <= 10
      base.filter("bucket = 1 AND l_quantity > 10")
        .write.parquet(s"$t/data/s2")
      val files2 = (byBucket - 1).values.flatten.toSeq ++
        Iceberg.countsByFile(s, sch, s"$t/data/s2")
      Iceberg.commit(s, t, 2L, 2L, sch, files2.sortBy(_._1),
        prior = Seq((1L, s"$t/metadata/snap-1.avro")))
      // snapshot 3: append the duplicate bucket-2 slice
      base.filter("bucket = 2 AND l_quantity > 40")
        .write.parquet(s"$t/data/s3")
      val files3 = files2 ++
        Iceberg.countsByFile(s, sch, s"$t/data/s3")
      Iceberg.commit(s, t, 3L, 3L, sch, files3.sortBy(_._1),
        prior = Seq((1L, s"$t/metadata/snap-1.avro"),
          (2L, s"$t/metadata/snap-2.avro")))
    }
  /** Iceberg with an AVRO data file (r13): the spec's second
    * content format — snapshot 1 is plain parquet, snapshot 2
    * appends a data file whose `file_format` is AVRO, written by
    * OUR OCF codec and read back through OUR OCF reader inside the
    * manifest scan (the spec allows avro/orc/parquet data files;
    * a real table mixing engines hits this). The oracle recomputes
    * the union analytically, so a format dispatch, schema mapping
    * or datum decode bug flips the hash. */
  private[graft] def icebergAvroScan(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "iceavro", "lineitem") { out =>
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      val files1 = Iceberg.create(s, base, t) // snapshot 1: parquet
      // snapshot 2: append the duplicate bucket-2 slice as ONE
      // avro data file
      val app = base.filter("bucket = 2 AND l_quantity > 40")
      graft.sources.AvroSink.write(app.coalesce(1),
        s"$t/data/s2", codec = "deflate")
      val af = new java.io.File(s"$t/data/s2").listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val n = app.count()
      Iceberg.commit(s, t, 2L, 2L, base.schema,
        files1 ++ Seq((af.getAbsolutePath, n, af.length())),
        prior = Seq((1L, s"$t/metadata/snap-1.avro")),
        fileSeqs = files1.map(f => f._1 -> 1L).toMap,
        fileFormats = Map(af.getAbsolutePath -> "AVRO"))
    }
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** Iceberg lakehouse scan (r12) — the current snapshot through
    * the metadata-json → manifest-list → manifest chain (OUR Avro
    * decoder at both Avro layers), aggregated per return flag
    * against the same analytic oracle as [[deltaScan]]: one table
    * state, two formats, one truth. */
  /** Iceberg METADATA TABLES (r13): the `snapshots` and `files`
    * inspection surfaces every Iceberg engine exposes — snapshot
    * ids + operations from the metadata document, and per-snapshot
    * live-file rows (path/format/record_count/partition/seq) from
    * the manifest chain. The gate walks EVERY snapshot of the
    * 3-step fixture through filesMeta and pins each snapshot's
    * total record count and distinct formats against the analytic
    * history — a drifted manifest row, a wrong snapshot lookup or
    * a broken sequence stamp flips the hash. */
  private[graft] def icebergFilesMeta(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = icebergFixtureRoot(s, dir)
    val tbl = s"$root/tbl"
    val snapIds = Iceberg.snapshotsMeta(s, tbl)
      .select("snapshot_id").collect().map(_.getLong(0)).sorted
    require(snapIds.toSeq == Seq(1L, 2L, 3L),
      s"fixture drifted: snapshots ${snapIds.toSeq}")
    snapIds.map { id =>
      Iceberg.filesMeta(s, tbl, Some(id))
        .groupBy(lit(id).as("snapshot_id"))
        .agg(sum("record_count").as("n_rows"),
          countDistinct("file_format").as("n_formats"),
          max("sequence_number").as("max_seq"))
    }.reduce(_ unionByName _).orderBy("snapshot_id")
  }

  /** Iceberg MANIFEST-LEVEL pruning (r13): a snapshot written as
    * one manifest PER PARTITION TUPLE, each manifest-list row
    * carrying the spec's field summaries (lower/upper bounds in
    * the Appendix-D single-value binary form) — so the planner
    * skips whole manifests WITHOUT opening them. The query
    * requires in-flight that pruning actually happened (kept <
    * total), then aggregates the one surviving partition; the
    * oracle recomputes it from lineitem. At 100 TB this is the
    * step that keeps metadata planning proportional to the touched
    * partitions, not the table. */
  private[graft] def icebergManifestPrune(s: SparkSession,
      dir: String): DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "icemprune", "lineitem") {
      out =>
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_orderkey % 4 AS bucket")
      Iceberg.create(s, base, s"$out/tbl",
        partitionBy = Seq(("pb", "identity", "bucket")),
        splitManifests = true): Unit
    }
    val tbl = s"$root/tbl"
    val (_, prune) = Iceberg.snapshotWhere(s, tbl, "bucket", 2L)
    require(prune.total >= 4,
      s"fixture drifted: only ${prune.total} data manifests")
    require(prune.kept >= 1 && prune.kept < prune.total,
      s"manifest pruning did not happen: ${prune.kept}/" +
        s"${prune.total}")
    Iceberg.readWhere(s, tbl, "bucket", 2L)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }

  private[graft] def icebergScan(s: SparkSession, dir: String): DataFrame = {
    val root = icebergFixtureRoot(s, dir)
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** Iceberg MAP column type (late r12) — a table whose schema
    * carries `map<string,long>` through the full metadata-json →
    * manifest → parquet chain: the schema JSON renders Iceberg's
    * map grammar (key-id/value-id/value-required), [[Iceberg
    * .toSparkType]] maps it back, and the DATA flows through
    * Spark's native parquet map encoding. Facts read the map BY
    * KEY after the round trip, so a mis-mapped key/value type or a
    * lost value-required flag flips values. */
  private[graft] def icebergMapType(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "iceberg_map", "lineitem") {
      out =>
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_returnflag",
          "map('qty', CAST(l_quantity AS BIGINT), " +
            "'okmod', l_orderkey % 97) AS attrs")
      base.write.parquet(s"$t/data/s1")
      val files = Iceberg.countsByFile(s, base.schema,
        s"$t/data/s1")
      Iceberg.commit(s, t, 1L, 1L, base.schema, files,
        prior = Seq.empty)
    }
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("attrs").getItem("qty")).as("qty_sum"),
        sum(col("attrs").getItem("okmod")).as("okmod_sum"),
        sum(size(col("attrs")).cast("long")).as("nkeys"))
      .orderBy("rf")
  }
  /** Iceberg v2 POSITION-DELETE scan (late r12) — the same
    * row-level-delete story as [[deltaDvScan]] told in the other
    * lakehouse format: snapshot 1 creates the table, snapshot 2
    * commits a parquet delete file (file_path + pos rows gathered
    * via `_metadata.row_index`) through a content=1 delete
    * manifest; the read applies it as a LEFT ANTI join, and the
    * ORACLE is the identical survivor recomputation — one truth,
    * two formats, two delete mechanisms (roaring masks vs
    * anti-join). */
  private[graft] def icebergPosDelete(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "iceberg_pd", "lineitem") {
      out =>
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
      Iceberg.create(s, base.repartition(8), t)
      val snap1 = Iceberg.snapshot(s, t)
      s.read.parquet(s"$t/data/s1")
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("pos"),
          col("l_quantity"))
        .filter(col("l_quantity") <= 5)
        .drop("l_quantity")
        .coalesce(1).write.parquet(s"$t/data/del2")
      val delFiles = Iceberg.countsByFile(s,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file_path",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType))),
        s"$t/data/del2")
      Iceberg.commit(s, t, 2L, 2L, base.schema,
        snap1.files.map(f => (f.path, f.recordCount, f.fileSize)),
        prior = Seq((1L, s"$t/metadata/snap-1.avro")),
        deleteFiles = delFiles)
    }
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Iceberg v3 DELETION-VECTOR scan (r14): the deleted rows ride
    * in a PUFFIN file — one `deletion-vector-v1` blob per data
    * file (big-endian framing + magic + portable-64 roaring
    * bitmap + CRC-32, all verified on read) — referenced from the
    * delete manifest by (referenced_data_file, content_offset,
    * content_size_in_bytes) with file_format PUFFIN. Same
    * analytic truth as the v2 position-delete lane, through the
    * v3 row-delete machinery. */
  private[graft] def icebergDvScan(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "iceberg_dv", "lineitem") {
      out =>
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
      Iceberg.create(s, base.repartition(8), t)
      val snap1 = Iceberg.snapshot(s, t)
      val spark = s
      import spark.implicits._
      val victims = s.read.parquet(s"$t/data/s1")
        .select(col("_metadata.file_path").as("fp"),
          col("_metadata.row_index").as("pos"),
          col("l_quantity"))
        .filter(col("l_quantity") <= 5)
        .select(col("fp"), col("pos")).as[(String, Long)]
        .collect()
        .groupBy(_._1).map { case (f, ps) =>
          f -> ps.map(_._2).sorted }
      val dvs = Iceberg.writeDvPuffin(s, t, 2L, 2L, victims)
      Iceberg.commit(s, t, 2L, 2L, base.schema,
        snap1.files.map(f => (f.path, f.recordCount, f.fileSize)),
        prior = Seq((1L, s"$t/metadata/snap-1.avro")),
        dvDeletes = dvs)
    }
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Iceberg v2 EQUALITY-DELETE scan (late r12): the delete file
    * carries (l_orderkey, l_partkey) VALUE pairs taken from rows
    * with l_quantity ≤ 3 — and per the spec a row dies when its
    * values match, so rows with qty > 3 sharing a deleted pair die
    * TOO (value-wide deletion, the semantic that distinguishes
    * equality from position deletes). Data files keep their v1
    * sequence number through `fileSeqs` so the delete at seq 2
    * strictly post-dates them; the oracle is the NOT-EXISTS
    * recomputation over raw lineitem. */
  private[graft] def icebergEqDelete(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = formatFixtureDir(dir, "iceberg_eqd", "lineitem") {
      out =>
      val t = s"$out/tbl"
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
      Iceberg.create(s, base.repartition(8), t)
      val snap1 = Iceberg.snapshot(s, t)
      base.filter(col("l_quantity") <= 3)
        .select("l_orderkey", "l_partkey").dropDuplicates()
        .coalesce(1).write.parquet(s"$t/data/eq2")
      val delFiles = Iceberg.countsByFile(s,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("l_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("l_partkey",
            org.apache.spark.sql.types.LongType))),
        s"$t/data/eq2")
      // schema ids assign depth-first: l_orderkey=1, l_partkey=2
      Iceberg.commit(s, t, 2L, 2L, base.schema,
        snap1.files.map(f => (f.path, f.recordCount, f.fileSize)),
        prior = Seq((1L, s"$t/metadata/snap-1.avro")),
        equalityDeletes = delFiles.map(f =>
          (f._1, f._2, f._3, Seq(1, 2))),
        fileSeqs = snap1.files.map(f => f.path -> 1L).toMap)
    }
    graft.operators.Iceberg.read(s, s"$root/tbl")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy("rf")
  }
  /** Partitioned-iceberg fixture (r12): lineitem written ONCE with
    * a real partition spec — identity(l_returnflag) ×
    * bucket[16](l_orderkey) — through [[Iceberg.create]]'s
    * partitioned path: clustered write, hive-laid data dirs, typed
    * partition values in OUR Avro manifests, the spec JSON in
    * `partition-specs`. */
  private[graft] def icebergPartFixtureRoot(s: SparkSession, dir: String)
      : String =
    formatFixtureDir(dir, "iceberg_part", "lineitem") { out =>
      import graft.operators.Iceberg
      val base = Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag")
      Iceberg.create(s, base, s"$out/tbl", partitionBy = Seq(
        ("rf_p", "identity", "l_returnflag"),
        ("ok_b", "bucket[16]", "l_orderkey")))
    }
  /** Iceberg PARTITION PRUNING (r12) — the scale path the plain
    * scan leaves on the table: `readWhere` plans from MANIFEST
    * METADATA ONLY, keeping just the files whose stored partition
    * values match the transformed literal (identity flags keep
    * ~1/3 of files, a bucket[16] orderkey keeps ~1/16), then makes
    * the result exact with the residual filter. Each facet
    * REQUIRES in-flight that pruning actually shrank the file list
    * — at 100 TB this is the difference between planning 48 files
    * and scanning everything. The oracle recomputes every facet
    * from raw lineitem, so wrong bucket hashing (murmur3), a wrong
    * transform, or over-pruning (lost rows) all flip values. */
  private[graft] def icebergPartitionPrune(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Iceberg
    val root = icebergPartFixtureRoot(s, dir)
    val t = s"$root/tbl"
    val snap = Iceberg.snapshot(s, t)
    val total = snap.files.length
    def facetAgg(df: DataFrame, facet: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey")).as("ok_sum"))
        .select(lit(facet).as("facet"), col("n_rows"),
          col("qty_sum"), col("ok_sum"))
    val flagFacets = Seq("A", "N", "R").map { f =>
      val kept = Iceberg.prunedFiles(snap, "l_returnflag", f)
      require(kept.nonEmpty && kept.length < total,
        s"identity pruning did not shrink for flag $f " +
          s"(${kept.length}/$total)")
      facetAgg(Iceberg.readWhere(s, t, "l_returnflag", f),
        s"rf=$f")
    }
    val keptOk = Iceberg.prunedFiles(snap, "l_orderkey", 1L)
    require(keptOk.length * 8 <= total,
      s"bucket pruning kept ${keptOk.length}/$total files")
    val okFacet = facetAgg(
      Iceberg.readWhere(s, t, "l_orderkey", 1L), "ok=1")
    (flagFacets :+ okFacet).reduce(_.unionAll(_)).orderBy("facet")
  }
  /** Iceberg time travel (r12) — snapshot 1 by id (a metadata
    * lookup, not a replay) must equal plain lineitem. */
  private[graft] def icebergTimeTravel(s: SparkSession, dir: String)
      : DataFrame = {
    val root = icebergFixtureRoot(s, dir)
    graft.operators.Iceberg.read(s, s"$root/tbl", Some(1L))
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** Hudi COW snapshot (r12) — [[graft.operators.Hudi]] completes
    * the lakehouse trio: the fixture lives a real table history
    * (create → key-level upsert that rewrites exactly the touched
    * file groups → insert-overwrite of one partition through a
    * replacecommit → a PENDING commit whose base file exists on
    * disk but must stay invisible), and the oracle recomputes the
    * end state analytically from lineitem. The max commit-time
    * fact per partition pins WHICH file group generation each
    * partition reads — a reader that picks a stale or pending base
    * file flips the hash. */
  private[graft] def hudiSnapshot(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Hudi
    val root = formatFixtureDir(dir, "huditbl", "lineitem") { out =>
      val base = Tables.lineitem(s, dir).selectExpr(
        "l_orderkey * 10 + l_linenumber AS sk",
        "cast(l_orderkey % 4 as string) AS pb",
        "l_quantity AS qty")
      val tbl = s"$out/tbl"
      Hudi.create(s, base, tbl, "sk", "pb")
      val upd = base.where("(sk div 10) % 10 = 0")
        .withColumn("qty", expr("qty + 100"))
      Hudi.upsert(s, upd, tbl, "sk", "pb")
      val ov = base.where("pb = '3' and qty > 25")
      Hudi.insertOverwrite(s, ov, tbl, "sk", "3")
      Hudi.pendingCommit(s, base.where("pb = '1'")
        .withColumn("qty", expr("qty + 1000")), tbl, "sk", "1")
    }
    Hudi.read(s, s"$root/tbl")
      .groupBy("pb")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("sk").as("nk"),
        max("_hoodie_commit_time").as("mct"))
      .orderBy("pb")
  }
  /** Hudi MERGE_ON_READ through OUR log-block format (round 12):
    * createMor writes base parquet under a deltacommit, then the
    * history runs entirely through log appends — an AVRO_DATA
    * upsert wave (our own Avro datum codec inside HudiLog blocks),
    * a typed DELETE block wave, a second upsert wave, and a PENDING
    * deltacommit whose blocks exist on disk but whose INSTANT_TIME
    * never completes. The merge (base ∪ decoded log records, newest
    * per key, deletes dropping keys, uncommitted blocks gated out)
    * happens at read; the oracle recomputes the end state
    * analytically from lineitem, so a fault anywhere — block
    * framing, datum decode, instant gating, merge ordering, delete
    * application — flips the hash. Scale: one task per file group's
    * log chain (Hudi's own merge parallelism), shuffle = slice row
    * volume on the record key. */
  private[graft] def hudiMorSnapshot(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Hudi
    val root = formatFixtureDir(dir, "huditblmor", "lineitem") { out =>
      // keyed aggregate: hudi record keys must be UNIQUE (the
      // driver's synthetic lineitem repeats (orderkey, linenumber)
      // pairs, and a MOR merge would rightly collapse them)
      val base = Tables.lineitem(s, dir).selectExpr(
        "l_orderkey * 10 + l_linenumber AS sk",
        "cast(l_orderkey % 4 as string) AS pb",
        "l_quantity")
        .groupBy("sk", "pb")
        .agg(sum("l_quantity").as("qty"))
      val tbl = s"$out/tbl"
      Hudi.createMor(s, base, tbl, "sk", "pb") // deltacommit 1: base
      val upd1 = base.where("(sk div 10) % 10 = 0")
        .withColumn("qty", expr("qty + 100"))
      Hudi.upsertMorLog(s, upd1, tbl, "sk", "pb") // dc 2: avro blocks
      Hudi.deleteMor(s, base.where("pb = '2' and qty < 10"),
        tbl, "sk", "pb") // dc 3: delete blocks
      val upd2 = base.where("pb = '3' and qty > 40")
        .withColumn("qty", expr("qty + 7"))
      Hudi.upsertMorLog(s, upd2, tbl, "sk", "pb") // dc 4
      Hudi.pendingDeltaCommit(s, base.where("pb = '1'")
        .withColumn("qty", expr("qty + 1000")), tbl, "sk", "pb")
    }
    Hudi.read(s, s"$root/tbl")
      .groupBy("pb")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("sk").as("nk"),
        max("_hoodie_commit_time").as("mct"))
      .orderBy("pb")
  }
  /** Hudi MOR with PARQUET log blocks (r13): the
    * `hoodie.logfile.data.block.format=parquet` shape (also what
    * compaction with parquet log output leaves behind) — log blocks
    * whose content IS a complete parquet file, decoded by the
    * repo's own from-scratch page walker inside the merge, MIXED
    * with avro blocks and a delete wave in one log chain. The
    * oracle replays the history analytically; survivors' winning
    * commit times pin the cross-format merge ordering. */
  private[graft] def hudiMorParquetLog(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Hudi
    val root = formatFixtureDir(dir, "huditblmorpq", "lineitem") {
      out =>
      val base = Tables.lineitem(s, dir).selectExpr(
        "l_orderkey * 10 + l_linenumber AS sk",
        "cast(l_orderkey % 4 as string) AS pb",
        "l_quantity")
        .groupBy("sk", "pb")
        .agg(sum("l_quantity").as("qty"))
      val tbl = s"$out/tbl"
      Hudi.createMor(s, base, tbl, "sk", "pb") // dc 1: base files
      val upd1 = base.where("(sk div 10) % 10 = 0")
        .withColumn("qty", expr("qty + 100"))
      Hudi.upsertMorParquetLog(s, upd1, tbl, "sk", "pb") // dc 2
      Hudi.deleteMor(s, base.where("pb = '2' and qty < 10"),
        tbl, "sk", "pb") // dc 3: delete blocks
      val upd2 = base.where("pb = '3' and qty > 40")
        .withColumn("qty", expr("qty + 7"))
      Hudi.upsertMorLog(s, upd2, tbl, "sk", "pb") // dc 4: avro
      val upd3 = base.where("pb = '0' and qty > 30")
        .withColumn("qty", expr("qty + 11"))
      Hudi.upsertMorParquetLog(s, upd3, tbl, "sk", "pb") // dc 5
    }
    Hudi.read(s, s"$root/tbl")
      .groupBy("pb")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("sk").as("nk"),
        max("_hoodie_commit_time").as("mct"))
      .orderBy("pb")
  }
  /** MOR with HFILE log blocks (r14): the chain above again, but
    * the update blocks at dc2/dc5 carry complete in-content HFILES
    * (HoodieLogBlockType HFILE_DATA_BLOCK — the metadata-table
    * payload kind): key-sorted KeyValue cells, CRC32C chunk
    * checksums, root data index, gz/none codecs rotating by log
    * version — decoded by operators/HFile inside the merge,
    * MIXED with avro + delete blocks. Same analytic oracle. */
  private[graft] def hudiMorHFileLog(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.Hudi
    val root = formatFixtureDir(dir, "huditblmorhf", "lineitem") {
      out =>
      val base = Tables.lineitem(s, dir).selectExpr(
        "l_orderkey * 10 + l_linenumber AS sk",
        "cast(l_orderkey % 4 as string) AS pb",
        "l_quantity")
        .groupBy("sk", "pb")
        .agg(sum("l_quantity").as("qty"))
      val tbl = s"$out/tbl"
      Hudi.createMor(s, base, tbl, "sk", "pb") // dc 1: base files
      val upd1 = base.where("(sk div 10) % 10 = 0")
        .withColumn("qty", expr("qty + 100"))
      Hudi.upsertMorHFileLog(s, upd1, tbl, "sk", "pb") // dc 2
      Hudi.deleteMor(s, base.where("pb = '2' and qty < 10"),
        tbl, "sk", "pb") // dc 3: delete blocks
      val upd2 = base.where("pb = '3' and qty > 40")
        .withColumn("qty", expr("qty + 7"))
      Hudi.upsertMorLog(s, upd2, tbl, "sk", "pb") // dc 4: avro
      val upd3 = base.where("pb = '0' and qty > 30")
        .withColumn("qty", expr("qty + 11"))
      Hudi.upsertMorHFileLog(s, upd3, tbl, "sk", "pb") // dc 5
    }
    Hudi.read(s, s"$root/tbl")
      .groupBy("pb")
      .agg(count(lit(1)).as("n"),
        round(sum("qty"), 4).as("qsum"),
        countDistinct("sk").as("nk"),
        max("_hoodie_commit_time").as("mct"))
      .orderBy("pb")
  }
  /** Lakehouse ingest capstone (r12) — the composed migration DAG a
    * curation pipeline actually runs, chaining FOUR of this round's
    * systems live in one gate row: (1) read the Delta fixture at
    * its LATEST version through checkpoint+tail reconstruction,
    * (2) curate — keep l_quantity > 5 and DISTINCT away the rows
    * the v2 append duplicated, (3) write the result as a NEW
    * Iceberg table through OUR manifest writer (fresh temp store
    * each run — the write is part of the operator under test),
    * (4) read it back through OUR metadata→manifest-list→manifest
    * chain and aggregate. The oracle recomputes the end state
    * analytically from lineitem, so a fault ANYWHERE in the chain —
    * delta replay, the distinct, manifest round trip, final scan —
    * flips the hash. */
  private[graft] def lakehouseIngestDag(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.{DeltaLog, Iceberg}
    val deltaRoot = deltaFixtureRoot(s, dir)
    val curated = DeltaLog.read(s, s"$deltaRoot/tbl")
      .filter("l_quantity > 5")
      .select("l_orderkey", "l_partkey", "l_quantity",
        "l_returnflag", "bucket")
      .distinct()
    val out = java.nio.file.Files
      .createTempDirectory("graft_lakedag").toFile
    out.deleteOnExit()
    val t = s"${out.getAbsolutePath}/tbl"
    Iceberg.create(s, curated, t)
    graft.operators.Iceberg.read(s, t)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(col("l_orderkey") * col("bucket").cast("long"))
          .as("okb_sum"))
      .orderBy("rf")
  }
  /** delta_scan / iceberg_scan shared oracle: the 3-step lakehouse
    * story recomputed analytically from lineitem. */
  private[graft] def lakehouseScanOracleSql: String =
    """WITH base AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    l_orderkey AS okey, l_orderkey % 4 AS bucket
      |  FROM lineitem),
      |live AS (
      |  SELECT * FROM base WHERE bucket <> 1 OR qty > 10
      |  UNION ALL
      |  SELECT * FROM base WHERE bucket = 2 AND qty > 40)
      |SELECT rf, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
      |  CAST(SUM(okey * bucket) AS BIGINT) AS okb_sum
      |FROM live GROUP BY rf ORDER BY rf""".stripMargin
  /** delta/iceberg_time_travel shared oracle: the first version is
    * plain lineitem. */
  private[graft] def lakehouseTimeTravelOracleSql: String =
    """WITH base AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    l_orderkey AS okey, l_orderkey % 4 AS bucket
      |  FROM lineitem)
      |SELECT rf, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
      |  CAST(SUM(okey * bucket) AS BIGINT) AS okb_sum
      |FROM base GROUP BY rf ORDER BY rf""".stripMargin

  /** This part's oracle SQL entries (the `oracleSql` slice). */
  private[graft] def lakehouseOracleSql: Map[String, String] = Map(
    // snapshots/files metadata tables: per-snapshot live row
    // totals replayed analytically (v1 all, v2 minus the bucket-1
    // qty<=10 delete, v3 plus the duplicated bucket-2 qty>40 slice)
    "iceberg_files_meta" ->
      """WITH b AS (
        |  SELECT l_orderkey % 4 AS bucket,
        |    CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
        |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b
        |  WHERE bucket <> 1 OR qty > 10),
        |v3 AS (SELECT v2.n + (SELECT COUNT(*) FROM b
        |  WHERE bucket = 2 AND qty > 40) AS n FROM v2)
        |SELECT CAST(1 AS BIGINT) AS snapshot_id,
        |  (SELECT n FROM v1) AS n_rows,
        |  CAST(1 AS BIGINT) AS n_formats,
        |  CAST(1 AS BIGINT) AS max_seq
        |UNION ALL
        |SELECT 2, (SELECT n FROM v2), 1, 2
        |UNION ALL
        |SELECT 3, (SELECT CAST(n AS BIGINT) FROM v3), 1, 3
        |ORDER BY snapshot_id""".stripMargin,
    // one manifest per partition tuple + field summaries: the
    // bucket=2 slice survives manifest-level pruning (pinned
    // in-flight) and must equal the analytic recomputation
    "iceberg_manifest_prune" ->
      """SELECT l_returnflag AS rf,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem WHERE l_orderkey % 4 = 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // OUR Hudi COW reader after a lived history: create -> upsert
    // (keys with l_orderkey%10=0, partitions 0/2 rewritten at
    // instant 2) -> replacecommit overwriting partition 3 ->
    // pending commit on partition 1 that must stay invisible
    "hudi_snapshot" ->
      """WITH b AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS sk,
        |    CAST(l_orderkey % 4 AS VARCHAR) AS pb,
        |    l_quantity AS qty
        |  FROM lineitem),
        |u AS (
        |  SELECT sk, pb,
        |    CASE WHEN (sk // 10) % 10 = 0 THEN qty + 100
        |      ELSE qty END AS qty
        |  FROM b),
        |f AS (
        |  SELECT sk, pb, qty FROM u WHERE pb <> '3'
        |  UNION ALL
        |  SELECT sk, pb, qty FROM b WHERE pb = '3' AND qty > 25)
        |SELECT pb, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(qty), 4) AS qsum,
        |  CAST(COUNT(DISTINCT sk) AS BIGINT) AS nk,
        |  CASE pb WHEN '1' THEN '00000000000001'
        |    WHEN '3' THEN '00000000000003'
        |    ELSE '00000000000002' END AS mct
        |FROM f GROUP BY pb ORDER BY pb""".stripMargin,
    // MERGE_ON_READ: base deltacommit + two avro-log upsert waves +
    // a delete-block wave + a pending (invisible) deltacommit; the
    // oracle replays the same history analytically. The surviving
    // row set and each survivor's winning commit time both pin the
    // merge ordering.
    "hudi_mor_snapshot" ->
      """WITH b AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS sk,
        |    CAST(l_orderkey % 4 AS VARCHAR) AS pb,
        |    sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (
        |  SELECT sk, pb,
        |    CASE WHEN pb = '3' AND qty > 40 THEN qty + 7
        |      WHEN (sk // 10) % 10 = 0 THEN qty + 100
        |      ELSE qty END AS qty2,
        |    CASE WHEN pb = '3' AND qty > 40 THEN '00000000000004'
        |      WHEN (sk // 10) % 10 = 0 THEN '00000000000002'
        |      ELSE '00000000000001' END AS ct
        |  FROM b WHERE NOT (pb = '2' AND qty < 10))
        |SELECT pb, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(qty2), 4) AS qsum,
        |  CAST(COUNT(DISTINCT sk) AS BIGINT) AS nk,
        |  max(ct) AS mct
        |FROM f GROUP BY pb ORDER BY pb""".stripMargin,
    // MOR again with PARQUET log blocks (the
    // logfile.data.block.format=parquet shape) MIXED with avro
    // blocks + deletes in one chain; our own page walker decodes
    // the block contents inside the merge
    "hudi_mor_parquet_log" ->
      """WITH b AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS sk,
        |    CAST(l_orderkey % 4 AS VARCHAR) AS pb,
        |    sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (
        |  SELECT sk, pb,
        |    CASE WHEN pb = '0' AND qty > 30 THEN qty + 11
        |      WHEN pb = '3' AND qty > 40 THEN qty + 7
        |      WHEN (sk // 10) % 10 = 0 THEN qty + 100
        |      ELSE qty END AS qty2,
        |    CASE WHEN pb = '0' AND qty > 30 THEN '00000000000005'
        |      WHEN pb = '3' AND qty > 40 THEN '00000000000004'
        |      WHEN (sk // 10) % 10 = 0 THEN '00000000000002'
        |      ELSE '00000000000001' END AS ct
        |  FROM b WHERE NOT (pb = '2' AND qty < 10))
        |SELECT pb, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(qty2), 4) AS qsum,
        |  CAST(COUNT(DISTINCT sk) AS BIGINT) AS nk,
        |  max(ct) AS mct
        |FROM f GROUP BY pb ORDER BY pb""".stripMargin,
    // MOR once more with HFILE log blocks mixed into the chain
    // (same analytic end state as the parquet-log lane)
    "hudi_mor_hfile_log" ->
      """WITH b AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS sk,
        |    CAST(l_orderkey % 4 AS VARCHAR) AS pb,
        |    sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (
        |  SELECT sk, pb,
        |    CASE WHEN pb = '0' AND qty > 30 THEN qty + 11
        |      WHEN pb = '3' AND qty > 40 THEN qty + 7
        |      WHEN (sk // 10) % 10 = 0 THEN qty + 100
        |      ELSE qty END AS qty2,
        |    CASE WHEN pb = '0' AND qty > 30 THEN '00000000000005'
        |      WHEN pb = '3' AND qty > 40 THEN '00000000000004'
        |      WHEN (sk // 10) % 10 = 0 THEN '00000000000002'
        |      ELSE '00000000000001' END AS ct
        |  FROM b WHERE NOT (pb = '2' AND qty < 10))
        |SELECT pb, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(qty2), 4) AS qsum,
        |  CAST(COUNT(DISTINCT sk) AS BIGINT) AS nk,
        |  max(ct) AS mct
        |FROM f GROUP BY pb ORDER BY pb""".stripMargin,
    // Lakehouse formats: OUR snapshot reconstruction (Delta log
    // replay / Iceberg manifest chain) must equal the analytically
    // recomputed table state — create, delete-rewrite of bucket 1
    // (qty ≤ 10 gone), append duplicating bucket 2 rows with
    // qty > 40. ONE oracle, both formats.
    "delta_scan" -> lakehouseScanOracleSql,
    // Change Data Feed: v0 inserts (add actions), v1 update
    // pre/postimages (REAL cdc actions + _change_data files), v2
    // deletes DERIVED from remove actions vs the prior snapshot
    "delta_cdf_scan" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_quantity,
        |    l_orderkey % 4 AS bucket FROM lineitem),
        |ch AS (
        |  SELECT 'insert' AS change_type, 0 AS commit_version,
        |    bucket, l_quantity, l_orderkey FROM b
        |  UNION ALL
        |  SELECT 'update_preimage', 1, bucket, l_quantity,
        |    l_orderkey FROM b WHERE bucket = 3 AND l_quantity > 45
        |  UNION ALL
        |  SELECT 'update_postimage', 1, bucket, l_quantity + 5,
        |    l_orderkey FROM b WHERE bucket = 3 AND l_quantity > 45
        |  UNION ALL
        |  SELECT 'delete', 2, bucket, l_quantity, l_orderkey
        |  FROM b WHERE bucket = 0)
        |SELECT change_type,
        |  CAST(commit_version AS BIGINT) AS commit_version, bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 4) AS qsum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS oksum
        |FROM ch GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "iceberg_scan" -> lakehouseScanOracleSql,
    // snapshot 1 parquet + snapshot 2 appends an AVRO data file
    // (file_format=AVRO, our OCF codec both directions): the final
    // state is base plus the duplicated bucket-2 qty>40 slice
    "iceberg_avro_scan" ->
      """WITH base AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    l_orderkey AS okey, l_orderkey % 4 AS bucket
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT * FROM base WHERE bucket = 2 AND qty > 40)
        |SELECT rf, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
        |  CAST(SUM(okey * bucket) AS BIGINT) AS okb_sum
        |FROM live GROUP BY rf ORDER BY rf""".stripMargin,
    // the same table at its first version: Delta via pure JSON
    // replay (the later checkpoint must be IGNORED), Iceberg via
    // snapshot-id lookup — both equal plain lineitem
    "delta_time_travel" -> lakehouseTimeTravelOracleSql,
    // v2 checkpoint: the latest state is reachable ONLY through the
    // UUID-named manifest + _sidecars files (early commits pruned) —
    // the final table equals the classic delta_scan story
    "delta_checkpoint_v2" -> lakehouseScanOracleSql,
    // reader-version-3 features: rows masked by REAL deletion
    // vectors (roaring bitmaps, both storage forms) must equal the
    // analytic survivor set; the column-mapped table must aggregate
    // identically to plain lineitem despite opaque physical names
    "delta_dv_scan" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "delta_column_mapping" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    // id-mode column mapping: files with throwaway names + field
    // IDs must aggregate identically to plain lineitem
    "delta_column_mapping_id" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    // iceberg v2 position deletes: the SAME survivor truth as
    // delta_dv_scan — one oracle pins both formats' row-level
    // delete mechanisms (roaring masks vs anti-join)
    // map<string,long> column through the full metadata chain:
    // facts read the round-tripped map BY KEY
    "iceberg_map_type" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey % 97) AS BIGINT) AS okmod_sum,
        |  CAST(count(*) * 2 AS BIGINT) AS nkeys
        |FROM lineitem GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "iceberg_pos_delete" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    // v3 deletion vectors: same truth as the pos-delete lane,
    // through puffin blobs
    "iceberg_dv_scan" ->
      """SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    // equality deletes are VALUE-wide: any row sharing a deleted
    // (orderkey, partkey) pair dies, even with qty > 3
    "iceberg_eq_delete" ->
      """WITH del AS (
        |  SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem WHERE l_quantity <= 3)
        |SELECT l_returnflag AS rf, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM del d
        |  WHERE d.l_orderkey = l.l_orderkey
        |    AND d.l_partkey = l.l_partkey)
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "iceberg_time_travel" -> lakehouseTimeTravelOracleSql,
    // partition pruning: per-flag facets (identity transform) + one
    // orderkey facet (bucket[16] — murmur3 pruning); pruned-scan
    // results must equal the raw-lineitem recomputation, and the
    // query REQUIRES in-flight that each facet's file list shrank
    "iceberg_partition_prune" ->
      """WITH f AS (
        |  SELECT 'rf=' || l_returnflag AS facet,
        |    count(*) AS n_rows,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      AS qty_sum,
        |    CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |  FROM lineitem GROUP BY l_returnflag),
        |o AS (
        |  SELECT 'ok=1' AS facet, count(*) AS n_rows,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      AS qty_sum,
        |    CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |  FROM lineitem WHERE l_orderkey = 1)
        |SELECT * FROM f UNION ALL SELECT * FROM o
        |ORDER BY facet""".stripMargin,
    // the composed migration DAG: delta latest → qty>5 + DISTINCT
    // (the v2 duplicates collapse) → iceberg write → iceberg read;
    // the analytic end state, straight from lineitem
    "lakehouse_ingest_dag" ->
      """WITH base AS (
        |  SELECT l_returnflag AS rf, l_partkey AS pkey,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    l_orderkey AS okey, l_orderkey % 4 AS bucket
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM base WHERE bucket <> 1 OR qty > 10
        |  UNION ALL
        |  SELECT * FROM base WHERE bucket = 2 AND qty > 40),
        |cur AS (
        |  SELECT DISTINCT okey, pkey, qty, rf, bucket
        |  FROM live WHERE qty > 5)
        |SELECT rf, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
        |  CAST(SUM(okey * bucket) AS BIGINT) AS okb_sum
        |FROM cur GROUP BY rf ORDER BY rf""".stripMargin
  )
}
