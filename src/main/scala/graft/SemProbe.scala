package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SemProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val qs = graft.queries.CurationQueries.queries
    def noop(name: String) =
      qs(name)(spark, d).write.format("noop").mode("overwrite").save()
    // bench-identical: warmups unscoped, then timed rounds
    time("W sem")   { try noop("q_semdedup") catch { case _: Throwable => } }
    time("W autok") { try noop("q_semdedup_autok") catch { case _: Throwable => } }
    for (it <- 1 to 2) {
      spark.catalog.clearCache()
      time(s"T$it sem") { graft.ext.CacheScope.withScope { noop("q_semdedup") } }
      spark.catalog.clearCache()
      // instrumented autok: stage timings inside the scope
      time(s"T$it autok TOTAL") { graft.ext.CacheScope.withScope {
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
        val clones = emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
        val all = emb.select(col("vec_id"), col("embedding")).unionByName(clones)
        var res: org.apache.spark.sql.DataFrame = null
        time(s"T$it autok build(train+assign plan)") {
          res = graft.ext.SemDedup.semDedupAuto(all, "vec_id", "embedding", 0.9, 512)
        }
        time(s"T$it autok execute") {
          res.orderBy(col("id")).write.format("noop").mode("overwrite").save()
        }
      } }
    }
    spark.stop()
  }
}
