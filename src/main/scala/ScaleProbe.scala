/** Dev scratch: single forced run of selected queries at a given dir. */
object ScaleProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.head
    a.tail.foreach { q =>
      val t0 = System.nanoTime()
      try {
        graft.BenchForce.force(graft.SparkEntry.queries(q)(s, dir))
        println(f"SP $q ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        println(s"SP $q ERR ${e.toString.take(200)}")
      }
    }
    s.stop()
  }
}
