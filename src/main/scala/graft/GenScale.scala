package graft
import org.apache.spark.sql.SparkSession
object GenScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Transcripts.syntheticDistributed(spark, 800000L, 60)
      .write.mode("overwrite").parquet("/tmp/graft_bench_scale_800000")
    println("GEN done " + spark.read.parquet("/tmp/graft_bench_scale_800000").count())
    spark.stop()
  }
}
