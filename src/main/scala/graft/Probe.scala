package graft

/** Scratch profiling main (not part of the driver contract).
  *
  * Current probe: reproduce the per-repetition slowdown on the batched
  * index-probe queries (BENCH r7 `iters` growth) and attribute the wall
  * time with a sampling profiler — every 25 ms, snapshot all thread
  * stacks; per iteration, print the hottest frames. A fast-vs-slow
  * iteration diff names the accumulating state.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qnames = args.headOption.getOrElse("q_ann_lsh_batch").split(",").toSeq
    val iters = sys.env.getOrElse("PROBE_ITERS", "8").toInt

    // warm-up / index build
    qnames.foreach(q => SparkEntry.queries(q)(spark, d).count())

    val sampling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val fullStacks = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sampler = new Thread(() => {
      while (true) {
        if (sampling.get()) {
          val stacks = Thread.getAllStackTraces()
          stacks.forEach { (t, frames) =>
            if (frames.nonEmpty && t.getState == Thread.State.RUNNABLE) {
              // attribute to the deepest "interesting" frame (skip pure JDK)
              val f = frames.find { fr =>
                val c = fr.getClassName
                c.startsWith("org.apache.spark") || c.startsWith("graft") ||
                  c.startsWith("org.apache.parquet") || c.startsWith("org.apache.hadoop")
              }.getOrElse(frames.head)
              val key = s"${f.getClassName}.${f.getMethodName}"
              counts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
              // keep a few FULL stacks of the interesting shapes
              val top = frames.take(40).map(_.toString)
              if (fullStacks.size < 30 && top.exists(s =>
                  s.contains("readObject") || s.contains("copyFileStreamNIO") ||
                  s.contains("Configuration.<init>")))
                fullStacks.add(s"--- ${t.getName}\n  " + top.mkString("\n  "))
            }
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // task-level tally: is a slow iteration MORE tasks, or SLOWER tasks?
    val nTasks = new java.util.concurrent.atomic.AtomicLong()
    val nStages = new java.util.concurrent.atomic.AtomicLong()
    val nJobs = new java.util.concurrent.atomic.AtomicLong()
    val sumRun = new java.util.concurrent.atomic.AtomicLong()
    val sumDeser = new java.util.concurrent.atomic.AtomicLong()
    val sumResultSer = new java.util.concurrent.atomic.AtomicLong()
    val sumSchedDelayProxy = new java.util.concurrent.atomic.AtomicLong()
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (String, java.util.concurrent.atomic.AtomicLong, java.util.concurrent.atomic.AtomicLong)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        perStage.putIfAbsent(e.stageInfo.stageId,
          (e.stageInfo.name.takeWhile(_ != '\n').take(80),
            new java.util.concurrent.atomic.AtomicLong(),
            new java.util.concurrent.atomic.AtomicLong()))
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          sumRun.addAndGet(m.executorRunTime)
          sumDeser.addAndGet(m.executorDeserializeTime)
          sumResultSer.addAndGet(m.resultSerializationTime)
          val wall = e.taskInfo.finishTime - e.taskInfo.launchTime
          sumSchedDelayProxy.addAndGet(math.max(0L,
            wall - m.executorRunTime - m.executorDeserializeTime - m.resultSerializationTime))
          val st = perStage.get(e.stageId)
          if (st != null) { st._2.addAndGet(m.executorRunTime); st._3.incrementAndGet() }
        }
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        nStages.incrementAndGet()
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        nJobs.incrementAndGet()
    })

    // minor/major page-fault counters from /proc/self/stat (fields 10/12)
    def faults(): (Long, Long) = {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      val f = s.substring(s.lastIndexOf(')') + 2).split(" ")
      (f(7).toLong, f(9).toLong) // minflt, majflt
    }
    def gcTotals(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val bs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (bs.map(_.getCollectionCount).sum, bs.map(_.getCollectionTime).sum)
    }
    def heapUsed(): Long =
      (Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) >> 20
    // /sys/block/vda/stat: rd_ios rd_merge rd_sec rd_ms wr_ios wr_merge wr_sec wr_ms inflight io_ticks ...
    def disk(): (Long, Long, Long, Long) = {
      try {
        val f = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/sys/block/vda/stat"))).trim.split("\\s+")
        (f(2).toLong, f(6).toLong, f(9).toLong, f(3).toLong + f(7).toLong) // rdSec, wrSec, ioTicksMs, rdwrMs
      } catch { case _: Throwable => (0L, 0L, 0L, 0L) }
    }
    def dirtyKb(): Long = {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/meminfo")))
      "Dirty:\\s+(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L)
    }

    for (qname <- qnames; i <- 1 to iters) {
      val fn = SparkEntry.queries(qname)
      spark.catalog.clearCache()
      counts.clear()
      Seq(nTasks, nStages, nJobs, sumRun, sumDeser, sumResultSer, sumSchedDelayProxy)
        .foreach(_.set(0L))
      val (mf0, mjf0) = faults()
      val (gcc0, gct0) = gcTotals()
      val (rd0, wr0, iot0, iom0) = disk()
      sampling.set(true)
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      sampling.set(false)
      val (mf1, mjf1) = faults()
      val (gcc1, gct1) = gcTotals()
      val (rd1, wr1, iot1, iom1) = disk()
      println(f"PROBE flt iter $i%2d  $sec%8.3f s  minflt=${mf1 - mf0}%9d majflt=${mjf1 - mjf0}%6d " +
        f"gcCount=${gcc1 - gcc0}%3d gcMs=${gct1 - gct0}%6d heapUsedMb=${heapUsed()}%7d totalMb=${Runtime.getRuntime.totalMemory() >> 20}%7d " +
        f"rdMb=${(rd1 - rd0) >> 11}%6d wrMb=${(wr1 - wr0) >> 11}%6d ioBusyMs=${iot1 - iot0}%6d ioWaitMs=${iom1 - iom0}%8d dirtyKb=${dirtyKb()}%9d")
      // let the listener bus drain so the tallies cover this iteration
      Thread.sleep(300)
      val hconfSize = spark.sparkContext.hadoopConfiguration.size()
      val newHconfSize = spark.sessionState.newHadoopConf().size()
      val sqlConfSize = spark.conf.getAll.size
      println(f"PROBE iter $i%2d  $sec%8.3f s  jobs=${nJobs.get()}%3d stages=${nStages.get()}%4d tasks=${nTasks.get()}%6d " +
        f"runMs=${sumRun.get()}%7d deserMs=${sumDeser.get()}%7d resSerMs=${sumResultSer.get()}%6d gapMs=${sumSchedDelayProxy.get()}%7d " +
        f"hconf=$hconfSize%6d newHconf=$newHconfSize%7d sqlConf=$sqlConfSize%7d  $qname")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2.get()).take(6).foreach { case (k, v) =>
        println(f"      ${v.get()}%6d  $k")
      }
      perStage.asScala.toSeq.sortBy(-_._2._2.get()).take(8).foreach {
        case (sid, (nm, run, nt)) =>
          println(f"      STAGE $sid%4d runMs=${run.get()}%7d tasks=${nt.get()}%4d  $nm")
      }
      perStage.clear()
      if (i == iters) { // dump captured full stacks from the last iteration
        fullStacks.asScala.take(6).foreach(println)
      }
      if (i < iters) fullStacks.clear()
    }
    spark.stop()
  }
}
