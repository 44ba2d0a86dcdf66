package graft.api

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage runtime stats — the data the reference's stats service
  * reports per stage (reference internal/stats/stats.go:12-157: stage
  * runtime plus row counts, served over gRPC; here the numbers come off
  * Spark's listener bus, no service to run).
  *
  * `wallMs` is submission→completion wall clock; `runTimeMs` is summed
  * executor task time (> wallMs under parallelism). Row counts split the
  * reference's transform-vs-shuffle view: `inputRows` entered from a
  * source scan, `shuffleReadRows`/`shuffleWriteRows` crossed an exchange.
  */
final case class StageStat(
    stageId: Int,
    attempt: Int,
    name: String,
    wallMs: Long,
    runTimeMs: Long,
    tasks: Int,
    inputRows: Long,
    shuffleReadRows: Long,
    shuffleWriteRows: Long)

/** Collects a [[StageStat]] per completed stage. Register for the span of
  * one action (see [[GraftFrame.runWithStats]]); events arrive on the
  * async listener bus, hence the thread-safe buffers.
  *
  * @param jobGroup when set, ONLY stages belonging to jobs launched under
  *   this job group are recorded — without it, concurrent actions on the
  *   shared SparkContext would have their stages attributed here too.
  */
final class StageStatListener(jobGroup: Option[String] = None) extends SparkListener {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[StageStat]()
  private val groupStageIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onJobStart(event: SparkListenerJobStart): Unit = {
    val g = Option(event.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (jobGroup.exists(_ == g))
      event.stageIds.foreach(id => groupStageIds.add(id))
  }

  override def onStageCompleted(event: SparkListenerStageCompleted): Unit = {
    val si = event.stageInfo
    if (jobGroup.isEmpty || groupStageIds.contains(si.stageId)) {
      val tm = si.taskMetrics
      val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s)
        .getOrElse(0L)
      buf.add(StageStat(
        stageId = si.stageId,
        attempt = si.attemptNumber,
        name = si.name,
        wallMs = wall,
        runTimeMs = if (tm == null) 0L else tm.executorRunTime,
        tasks = si.numTasks,
        inputRows = if (tm == null) 0L else tm.inputMetrics.recordsRead,
        shuffleReadRows = if (tm == null) 0L else tm.shuffleReadMetrics.recordsRead,
        shuffleWriteRows = if (tm == null) 0L else tm.shuffleWriteMetrics.recordsWritten))
    }
  }

  def count: Int = buf.size
  def stages: Seq[StageStat] = {
    import scala.collection.JavaConverters._
    buf.iterator().asScala.toSeq.sortBy(s => (s.stageId, s.attempt))
  }
}
