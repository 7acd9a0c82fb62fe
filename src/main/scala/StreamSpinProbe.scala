/** Dev probe: decompose the streaming-twin spin-up constant — schema
  * read, writeStream.start(), processAllAvailable, stop — for the same
  * minimal file-stream Bench times as `stream_spinup_sec`.
  */
object StreamSpinProbe {
  def main(a: Array[String]): Unit = {
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    def one(i: Int): Unit = {
      val t0 = System.nanoTime()
      val schema = s.read.parquet(s"$dir/region.parquet").schema
      val t1 = System.nanoTime()
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "region.parquet").parquet(dir)
        .select(col("r_regionkey"))
        .writeStream.format("memory").queryName(s"spin_$i")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val t2 = System.nanoTime()
      q.processAllAvailable()
      val t3 = System.nanoTime()
      q.stop()
      val t4 = System.nanoTime()
      println(f"SPIN schema=${(t1 - t0) / 1e9}%.3f start=${(t2 - t1) / 1e9}%.3f process=${(t3 - t2) / 1e9}%.3f stop=${(t4 - t3) / 1e9}%.3f total=${(t4 - t0) / 1e9}%.3f")
    }
    (0 to 5).foreach(one)
    s.stop()
  }
}
