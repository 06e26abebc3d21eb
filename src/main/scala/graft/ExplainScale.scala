package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ExplainScale {
  def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val parts = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("MPB", "134217728"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PFIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("ADVISORY", "67108864"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = sys.env.getOrElse("SCALE_PATH", "/tmp/graft_bench_scale_800000")
    val t = spark.read.parquet(path)
    val entity = t.filter(pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(10)) === 0)
      .select(col("conv_id"), (col("ts") + expr("INTERVAL 30 SECONDS")).as("event_ts"))
    val view = FeatureView("turn_stats",
      t.select(col("conv_id"), col("ts"), col("turn_idx"), col("role"),
        length(col("text")).as("text_len")),
      Seq("conv_id"), "ts", None, ttlSeconds = 4 * 3600L,
      features = Seq("turn_idx", "role", "text_len"),
      tieBreakCols = Seq("turn_idx"))
    val df = sys.env.getOrElse("JOB", "merge") match {
      case "join" => pit.PointInTimeJoin.enrich(entity, view,
        saltBuckets = 8, hotKeyRowThreshold = 1000L)
      case _ => engine.Historical.getHistoricalFeatures(entity, Seq(view))
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.4) println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d dur=$dur%6.1f ${i.name.take(60)}")
      }
    })
    force(df)
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    val times = (1 to 5).map { _ =>
      val g0 = gcMs
      val t0 = System.nanoTime(); force(df)
      val w = (System.nanoTime()-t0)/1e9
      println(f"RUN wall=$w%.1f gc=${(gcMs-g0)/1000.0}%.1f")
      w
    }
    println(f"RESULT cores=$cores parts=$parts min=${times.min}%.2f all=${times.map(x => f"$x%.1f").mkString(",")}")
    spark.stop()
  }
}
