package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named queries twice in one JVM (first = cold
  * incl. shared-scan builds, second = steady-state). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, dir).count())
    for (n <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"[prof] $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

/** Scratch phase-splitter: construction vs analysis/optimization vs
  * execution for one query (where does a fixed per-run cost live?). */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PP_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PP_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("PP_COALESCE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PP_MIN_PARTITION_SIZE", "16k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, dir).count())
    for (n <- names; pass <- 1 to 3) {
      var t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val tCons = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[phase] $n pass$pass cons=$tCons%.2f plan=$tPlan%.2f exec=$tExec%.2f")
    }
    spark.stop()
  }
}
