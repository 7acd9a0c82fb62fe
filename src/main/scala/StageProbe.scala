import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe: per-query job/stage/task census over one timed run —
  * where does a warm run's wall time go? Prints job count, stage count,
  * task count, summed task time, and the top stages by duration with
  * their names. Args: sfDir query...
  */
object StageProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.head
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => }

    case class St(name: String, var ms: Long = 0L, var tasks: Int = 0,
                  var taskMs: Long = 0L, var shufRead: Long = 0L,
                  var shufWrite: Long = 0L)
    val stages = mutable.Map[Int, St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val st = stages.getOrElseUpdate(i.stageId, St(i.name.takeWhile(_ != '\n')))
        st.ms += i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        st.tasks += i.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) {
          val st = stages.getOrElseUpdate(e.stageId, St("?"))
          st.taskMs += e.taskMetrics.executorRunTime
          st.shufRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          st.shufWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    a.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      // two warm-ups: pays index builds + codegen
      graft.BenchForce.force(fn(s, dir))
      graft.operators.Checkpoints.releaseTransients()
      stages.clear(); jobs = 0
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.BenchForce.force(fn(s, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the listener bus drain
      s.sparkContext.removeSparkListener(listener)
      graft.operators.Checkpoints.releaseTransients()
      val totalStageMs = stages.values.map(_.ms).sum
      val totalTasks = stages.values.map(_.tasks).sum
      val totalTaskMs = stages.values.map(_.taskMs).sum
      println(f"STAGEPROBE $q wall=$wall%.2f jobs=$jobs stages=${stages.size} tasks=$totalTasks stageMs=$totalStageMs taskMs=$totalTaskMs")
      stages.toSeq.sortBy(-_._2.ms).take(8).foreach { case (id, st) =>
        println(f"    stage$id%-5d ${st.ms}%6d ms  tasks=${st.tasks}%4d taskMs=${st.taskMs}%6d sr=${st.shufRead}%9d sw=${st.shufWrite}%9d  ${st.name.take(90)}")
      }
    }
    s.stop()
  }
}
