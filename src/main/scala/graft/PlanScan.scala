package graft
import org.apache.spark.sql.SparkSession

/** One-off audit aid: prints, for every batch query, whether its
  * physical plan contains CartesianProduct / BroadcastNestedLoopJoin
  * (the PlanShapeSpec allowlist is derived from this output). */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !name.startsWith("q_stream_")) {
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj)
          println(s"FLAG $name cartesian=$cart bnlj=$bnlj")
        else println(s"ok   $name")
      } catch { case e: Throwable =>
        println(s"ERR  $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    spark.stop()
  }
}
