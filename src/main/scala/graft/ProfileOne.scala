package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch stage-level profiler: runs one registered query N times and
  * prints, per completed stage, its duration, task count, and shuffle
  * read/write volumes — the event-log evidence the optimization guide
  * (§1.1/§7.1) asks for, without needing the UI in a headless sandbox.
  * Usage: runMain graft.ProfileOne <queryName> <sfDir> <reps> */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, reps) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, nm: String, ms: Long, tasks: Int,
        shRead: Long, shWrite: Long, input: Long, rep: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    @volatile var rep = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val ms = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(80), ms,
            i.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead, rep)
        }
      }
    })
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    (1 to reps.toInt).foreach { i =>
      stages.synchronized { stages.clear() }
      rep = i
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      CacheHygiene.clear(spark)
      Thread.sleep(300) // let listener events drain
      println(f"PROFILE $name rep$i total=$total%.2f s ($n rows)")
      val snap = stages.synchronized { stages.toSeq }
      snap.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
          f"shR=${s.shRead / 1024}%8dK shW=${s.shWrite / 1024}%8dK " +
          f"in=${s.input / 1024}%8dK  ${s.nm}")
      }
      println(f"  n_stages=${snap.size} sum_stage_ms=${snap.map(_.ms).sum}")
    }
    spark.stop()
  }
}
