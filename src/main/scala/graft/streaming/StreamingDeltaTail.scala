package graft.streaming

import graft.operators.DeltaLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming twin of the Delta log reader: TAIL a delta table as a
  * Structured Streaming source — the "process a lakehouse table as
  * it grows" shape every incremental-ingest pipeline needs. The
  * JSON commits under `_delta_log` themselves are the stream: they
  * arrive through `readStream.format("binaryFile")` (commit files
  * are small driver metadata — the DATA files they reference are
  * only ever touched by executor-side parquet scans via
  * [[DeltaLog.readFiles]], partition values injected exactly like
  * the batch read).
  *
  * Contract (the same default as production delta streaming
  * sources): APPEND-ONLY. A commit carrying `remove` actions fails
  * the query loudly — silently skipping a delete would emit rows a
  * batch reader of the same version would not see, and re-emitting
  * rewritten files would duplicate. `metaData` actions update the
  * schema used for subsequent commits' scans.
  *
  * Per micro-batch, commit files are parsed IN VERSION ORDER and
  * each commit's added files flow to the caller's sink as one
  * DataFrame tagged with its version — so the stream's cumulative
  * output equals the batch snapshot at the last seen version
  * (pinned by StreamingDeltaTailSpec on a live query with commits
  * landing while it runs).
  *
  * 100 TB: the stream state is the file-listing offsets of the log
  * dir (O(#commits), the same listing the batch reader does);
  * per-batch work is O(new commits) + the pruned scans of the
  * added files. */
object StreamingDeltaTail {

  private val BinSchema = new StructType()
    .add("path", StringType)
    .add("modificationTime", TimestampType)
    .add("length", LongType)
    .add("content", BinaryType)

  /** Start tailing. `sink(version, rows)` is invoked once per
    * commit, version-ascending within and across micro-batches. */
  def start(spark: SparkSession, table: String,
      sink: (Long, DataFrame) => Unit): StreamingQuery = {
    // schema as of the log head, updated by later metaData actions
    @volatile var meta: Option[DeltaLog.Meta] = None
    spark.readStream.format("binaryFile").schema(BinSchema)
      .option("pathGlobFilter", "*.json")
      .load(s"$table/_delta_log")
      .select("path", "content")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val commits = batch.collect().map { r =>
          val path = r.getString(0)
          val name = path.substring(path.lastIndexOf('/') + 1)
          (name.stripSuffix(".json").toLong,
            new String(r.getAs[Array[Byte]](1), "UTF-8"))
        }.sortBy(_._1)
        commits.foreach { case (version, text) =>
          val c = DeltaLog.parseCommit(text).getOrElse(
            sys.error(s"malformed commit $version in $table"))
          require(c.removes.isEmpty,
            s"commit $version removes files — the tail is " +
              "append-only (a skipped delete would diverge from " +
              "the batch read; re-emitting a rewrite would " +
              "duplicate)")
          require(c.adds.forall(_.deletionVector.isEmpty),
            s"commit $version adds a deletion vector — a row-level " +
              "delete breaks the append-only tail the same way a " +
              "remove does")
          c.meta.foreach(m => meta = Some(m))
          val m = meta.getOrElse(sys.error(
            s"no metaData at or before commit $version"))
          if (c.adds.nonEmpty)
            sink(version, DeltaLog.readFiles(spark, table, m, c.adds))
        }
      }
      .start()
  }
}
