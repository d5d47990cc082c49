package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints the formatted physical plan of selected
  * queries so pushdown/broadcast/codegen properties can be audited. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q2_join_nation", "q3_topk_orders", "coincidence_l1")
    for (n <- names) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      if (sys.env.contains("SPARK_GRAFT_PLAN_RAW"))
        println(df.queryExecution.sparkPlan.toString)
      else df.explain("formatted")
    }
    spark.stop()
  }
}
