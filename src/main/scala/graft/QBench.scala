package graft

import org.apache.spark.sql.SparkSession

/** Targeted micro-bench: time selected queries with repetitions.
  * Usage: QBench <sfDir> <reps> <query...> — complements Bench (full
  * suite) for optimizing a single query without suite noise. */
object QBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's coalescing floor so micro-bench numbers compare
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "16k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, dir).count())
    for (n <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s min=${times.min}%.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

/** Stage-by-stage probe of the parse_hits pipeline (temporary tooling). */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    graft.functions.PolyHash.register(spark)
    def time(name: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-28s min=${runs.map(_._1).min}%.2f s rows=${runs.head._2}")
    }
    val raw = Tables.events(spark, dir)
    time("events scan")(raw.count())
    val lines = Wire.wireLinesPublic(spark, dir)
    time("wireLines (format)")(lines.count())
    val splitDf = lines
      .withColumn("t", split(col("topic"), "/"))
      .withColumn("p", split(col("payload"), " "))
      .filter(size(col("t")) >= 4 && col("t").getItem(2) =!= "" && col("t").getItem(2) =!= "cluster")
    time("+ split/guards")(splitDf.count())
    val casts = splitDf
      .withColumn("start_ns", (col("p").getItem(0).cast("decimal(30,9)") * 1000000000L).cast("long"))
      .withColumn("end_ns", (col("p").getItem(1).cast("decimal(30,9)") * 1000000000L).cast("long"))
      .filter(col("start_ns") <= col("end_ns"))
    time("+ decimal casts")(casts.count())
    time("full parse_hits")(SparkEntry.queries("parse_hits")(spark, dir).count())
    spark.stop()
  }
}
