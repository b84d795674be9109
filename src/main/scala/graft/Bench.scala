package graft

import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): times every registered query on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line with the total.
  *
  * Hardening from round 1 (VERDICT §wrong 3):
  *   - failures are NOT swallowed — a broken query aborts the bench with a
  *     non-zero exit instead of recording a fake "fast" timing;
  *   - the JSON line is written to `bench_result.json` in the CWD as well as
  *     stdout, so the driver's parse cannot lose it in sbt log noise;
  *   - documented-quadratic verification baselines (q_jaccard_all_pairs —
  *     kept only to validate the LSH paths against exact answers) are
  *     excluded from the timed set and listed in the `excluded` field.
  *
  * SELF-ADJUDICATION (round 7, VERDICT r6 §wrong 1): a single min-of-3
  * number per query could not distinguish "plan regressed" from "suite/
  * machine pressure" — two rounds of builder-vs-driver disputes. The
  * artifact now carries, per query:
  *   - `iters`: ALL steady-state iteration times (the headline stays the
  *     min) — a real plan regression shows 3 uniformly-slow iterations,
  *     contention shows spread;
  *   - `gc_ms`: the JVM GC time that elapsed DURING each iteration
  *     (GarbageCollectorMXBean deltas) — if a 3.6 s iteration carries
  *     2.5 s of collector time the cause is heap pressure, not the plan;
  *   - `order`: the exact run order (suite position is the index), plus
  *     `heap_max_mb` — so order/pressure effects are visible in-artifact.
  * `SPARK_GRAFT_BENCH_ORDER=reverse` runs the suite backwards: a query
  * whose cost follows its POSITION (late = slow) is feeling accumulated
  * suite state; one whose cost follows its NAME is mispriced by its plan.
  * Between queries the harness runs one explicit System.gc() (JMH
  * practice): each query's iterations then start from a comparable heap
  * instead of inheriting whatever garbage the previous 60 queries left,
  * which is what inflated unrelated queries in lockstep in rounds 3-6.
  *
  * PINNED BENCH HEAP (round 8, closing VERDICT r7 §wrong 1): the r7
  * artifact's monotone per-iteration growth on q_ann_lsh_batch
  * (1.41→4.61→7.75 s, gc_ms ≈ 0) was named this round — it is NOT query
  * state. Two environmental mechanisms, both reproduced and measured:
  *   1. under the driver's 89 GB -Xmx, G1 lets eden grow to tens of GB, so
  *      timed iterations allocate straight through VIRGIN address space —
  *      every fresh 4 KiB page is a first-touch fault, serialized on the
  *      mmap lock across 32 executor threads (measured: slow iterations
  *      carry ~250k minor faults and a committed-heap growth event;
  *      task/stage/plan counts are bit-identical between fast and slow
  *      iterations). The explicit System.gc() between queries UNCOMMITS
  *      the heap again, so the fault storm repeats per query, growing
  *      across iterations as eden's high-water mark marches.
  *   2. the cold run builds multi-hundred-MB on-disk indexes whose dirty
  *      page-cache writeback lands MID-iteration (measured: Dirty
  *      425 MB → 4 MB with > 1.2 s device io_wait inside one timed run).
  * At the right-sized 8 GB heap neither happens — young GCs recycle
  * already-faulted pages every iteration (6/6 iterations flat ± 20% on
  * every formerly-growing query, two independent runs) — so main()
  * RE-EXECS itself into a child JVM pinned at SPARK_GRAFT_BENCH_HEAP
  * (default 8g, -Xms = -Xmx) whenever the inherited heap is far from the
  * spec. Timings are then comparable across environments regardless of
  * how the invoking JVM was sized; `heap_max_mb` in the artifact records
  * the heap the queries actually ran under.
  *
  * The one slowdown source that CANNOT be harness-fixed — host CPU steal
  * on a shared hypervisor (caught in the same investigation: every
  * residual spike carried 2+ s of /proc/stat steal vs <= 120 ms on flat
  * iterations) — is recorded per iteration as `steal_ms`, so a
  * contended-host spike adjudicates itself in-artifact the way gc_ms
  * already adjudicates heap pressure. min-of-N keeps the headline robust
  * to both.
  */
object Bench {

  private def parseMb(s: String): Long = {
    val t = s.trim.toLowerCase
    if (t.endsWith("g")) t.dropRight(1).toLong * 1024
    else if (t.endsWith("m")) t.dropRight(1).toLong
    else t.toLong // bare number = MiB
  }

  /** Re-exec into a pinned-heap child when the inherited -Xmx is outside
    * [spec/2, 1.5*spec] — returns only in the correctly-sized JVM. */
  private def ensureBenchHeap(args: Array[String]): Unit = {
    val specMb = parseMb(sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAP", "8g"))
    val haveMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val inBand = haveMb >= specMb / 2 && haveMb <= specMb * 3 / 2
    if (inBand || sys.env.contains("SPARK_GRAFT_BENCH_CHILD")) return
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filterNot(_.startsWith("-Xm"))
    val cmd = (Seq(javaBin) ++ inherited ++
      Seq(s"-Xmx${specMb}m", s"-Xms${specMb}m",
        "-cp", System.getProperty("java.class.path"), "graft.Bench") ++
      args).asJava
    val pb = new ProcessBuilder(cmd).inheritIO()
    pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
    System.err.println(s"[bench] re-exec at pinned ${specMb}m heap " +
      s"(inherited ${haveMb}m is outside the bench spec)")
    sys.exit(pb.start().waitFor())
  }
  /** Exact-answer baselines that exist to verify the scalable paths; timing
    * them tells you nothing about the engine's 100 TB design.
    * q_semantic_dedup_recall joined the set in round 10: it is a recall
    * AUDIT whose truth side is the brute-force all-pairs cosine join — the
    * same quadratic-verification class as q_jaccard_all_pairs. Both stay
    * under the per-round correctness gate; they are only untimed. */
  private val excludedBaselines =
    Set("q_jaccard_all_pairs", "q_semantic_dedup_recall")

  private def syncFs(): Unit =
    try new ProcessBuilder("sync").inheritIO().start().waitFor()
    catch { case _: java.io.IOException => () } // no /bin/sync: skip

  /** Per-iteration OS counters — minor faults, disk write sectors + io-wait.
    * The round-8 instrumentation that named the r7 growth; ALWAYS on since
    * round 10 (VERDICT r9 #1: the counters that adjudicate iteration spread
    * must live in the committed artifact, not behind a debug flag). Three
    * sub-millisecond /proc reads per iteration — negligible vs the timed run.
    * SPARK_GRAFT_BENCH_DEBUG=1 additionally prints them per-iteration. */
  private val benchDebug = sys.env.get("SPARK_GRAFT_BENCH_DEBUG").contains("1")
  private def osSnap(): (Long, Long, Long, Long) = try {
    val stat = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")))
    val mf = stat.substring(stat.lastIndexOf(')') + 2).split(" ")(7).toLong
    val dsk = try {
      val f = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/sys/block/vda/stat"))).trim.split("\\s+")
      (f(6).toLong, f(3).toLong + f(7).toLong)
    } catch { case _: Throwable => (0L, 0L) }
    val cpu = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/stat"))).linesIterator.next().split("\\s+")
    val stealTicks = cpu(8).toLong // host CPU stolen from this VM
    (mf, stealTicks, dsk._2, dsk._1)
  } catch { case _: Throwable => (0L, 0L, 0L, 0L) }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Host CPU-steal milliseconds for the whole VM (/proc/stat field 8 * 10ms
    * ticks). The round-8 investigation caught every residual iteration spike
    * carrying 2+ s of steal vs <= 120 ms on flat iterations — recorded per
    * iteration so a contended-host spike is attributable IN-ARTIFACT instead
    * of looking like a plan regression (the gc_ms precedent). Returns 0 where
    * /proc/stat is unavailable. */
  private def stealMillis(): Long =
    try {
      val cpu = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat"))).linesIterator.next().split("\\s+")
      cpu(8).toLong * 10L
    } catch { case _: Throwable => 0L }

  /** One timed iteration with its attribution counters. All recorded in the
    * artifact (round 10): `jitMs` (HotSpot compiler-thread time that elapsed
    * during the run — background C2 churn shows up here), `janino` (Spark
    * codegen compile COUNT; nonzero on a warm run means cache thrash),
    * `minorFaults` (first-touch page faults — heap-growth storms), and
    * `ioWaitMs` (device-queue time — dirty-writeback interference). These are
    * exactly the counters that adjudicated rounds 7-9's variance disputes;
    * VERDICT r9 #1 required them in the committed artifact, not debug logs. */
  private final case class Iter(sec: Double, gcMs: Long, stealMs: Long,
      jitMs: Long, janino: Long, minorFaults: Long, ioWaitMs: Long)

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    ensureBenchHeap(args)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.local(cpus, "graft-bench")
    // Warm-up (untimed): JIT + codegen + parquet footer caches, so the first
    // timed query isn't charged several seconds of JVM warm-up.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    // Per-query MIN of 3 steady-state iterations: one steady run per round
    // produced two false regression alarms across rounds 3-5 (machine
    // contention inflates untouched queries in lockstep); the min is the
    // contention-free estimate of the plan's real cost, which is what a
    // cross-round comparison needs.
    val steadyIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // Dev-only iteration filter (comma-separated names); driver leaves unset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val ordered0 = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => excludedBaselines(name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val orderMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_ORDER", "forward")
    val ordered = if (orderMode == "reverse") ordered0.reverse else ordered0
    val results = ordered.map { case (name, fn) =>
        // Steady-state timing (JMH-style): the first run — timed separately
        // as `cold` — compiles this query's generated code (Janino + JIT —
        // measured ~5.5 s of a 7.7 s cold run for the LSH dedup plan, pure
        // compile, amortized per-executor-process on a real cluster).
        // Caches are CLEARED before every timed run so each re-does all
        // data work: queries persist intermediates (shingle sets, band
        // keys) and Spark's cache manager matches plan subtrees, so without
        // the clear a timed run would skip whole stages and bench 3-10×
        // faster than its real plan.
        val c0 = System.nanoTime()
        fn(spark, sfDir).count()
        val cold = (System.nanoTime() - c0) / 1e9
        // Level the heap before this query's timed iterations (see scaladoc).
        System.gc()
        val iters = (1 to steadyIters).map { _ =>
          spark.catalog.clearCache()
          // clearCache drops DATASET cache entries but NOT the persistent
          // RDD blocks behind localCheckpoint (q_pipeline_e2e materializes
          // 7 stages per run): those wait for a driver GC + async
          // ContextCleaner round, so successive iterations ran against a
          // block manager still holding earlier iterations' checkpoints
          // (measured: monotone 6.3→4.8 s decline across 6 iterations,
          // gc_ms≈0, as the cleaner caught up). Blocking unpersist makes
          // every timed run start from the same empty block manager.
          // CONTRACT for query authors: this is a blanket unpersist of the
          // whole shared session — a query function must NOT rely on RDD
          // blocks persisted in an earlier iteration (disk-backed index
          // state is fine; that's where all current cross-run state lives).
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          // Flush dirty page-cache writes NOW, outside the timed region:
          // the cold run builds multi-hundred-MB on-disk indexes and every
          // timed run leaves its own shuffle files dirty — the
          // investigation caught both the post-build flush (Dirty
          // 425 MB -> 4 MB with > 1.2 s device io_wait inside a timed
          // run) and the 30 s dirty-expire kupdate flush of earlier
          // iterations' shuffle writes landing mid-iteration. `sync`
          // costs ~ms when the page cache is clean, so each timed run
          // pays only for ITS OWN writes and pays them here, untimed.
          syncFs()
          val s0 = osSnap()
          val st0 = stealMillis()
          val g0 = gcMillis()
          val jit0 = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
          val cg0 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val s1 = osSnap()
          val jit1 = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
          val cg1 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
          val it = Iter(sec, gcMillis() - g0, stealMillis() - st0,
            jit1 - jit0, cg1 - cg0, s1._1 - s0._1, s1._3 - s0._3)
          if (benchDebug)
            System.err.println(f"[bench-debug] $name $sec%8.3f s minflt=${it.minorFaults}%9d " +
              f"stealMs=${it.stealMs}%8d ioWaitMs=${it.ioWaitMs}%8d " +
              f"wrMb=${(s1._4 - s0._4) >> 11}%6d heapMb=${Runtime.getRuntime.totalMemory() >> 20}%6d " +
              f"jitMs=${it.jitMs}%7d janinoCompiles=${it.janino}%4d")
          it
        }
        (name, iters.map(_.sec).min, cold, iters)
      }
    def jMap[T](f: ((String, Double, Double, Seq[Iter])) => T) =
      results.map { r => s"\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    // Locale.ROOT: the f interpolator is default-locale-sensitive — a
    // comma-decimal locale would render 3,6700 and corrupt the JSON line.
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val qs = jMap(_._2)
    // Median alongside min (VERDICT r9 #6): min is the contention-free plan
    // cost; median makes variance a first-class, zero-extra-runtime signal
    // in every round's artifact instead of something a reader reconstructs
    // from `iters`.
    val qsMedian = jMap(r => fmt(median(r._4.map(_.sec))))
    val itersJson = jMap(_._4.map(i => fmt(i.sec)).mkString("[", ",", "]"))
    val gcJson = jMap(_._4.map(_.gcMs).mkString("[", ",", "]"))
    val stealJson = jMap(_._4.map(_.stealMs).mkString("[", ",", "]"))
    val jitJson = jMap(_._4.map(_.jitMs).mkString("[", ",", "]"))
    val janinoJson = jMap(_._4.map(_.janino).mkString("[", ",", "]"))
    val minfltJson = jMap(_._4.map(_.minorFaults).mkString("[", ",", "]"))
    val ioWaitJson = jMap(_._4.map(_.ioWaitMs).mkString("[", ",", "]"))
    val orderJson = results.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val excl = excludedBaselines.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val totalMedian = results.map(r => median(r._4.map(_.sec))).sum
    // cold_total keeps cross-round numbers comparable with round 1's
    // cold-run mode (the headline `value` stays steady-state).
    val coldTotal = results.map(_._3).sum
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_median":$qsMedian,"total_median":${fmt(totalMedian)},"excluded":$excl,"mode":"steady_state_min_of_$steadyIters","cold_total":$coldTotal,"sf":"$sfDir","iters":$itersJson,"gc_ms":$gcJson,"steal_ms":$stealJson,"jit_ms":$jitJson,"janino_compiles":$janinoJson,"minor_faults":$minfltJson,"io_wait_ms":$ioWaitJson,"order":$orderJson,"order_mode":"$orderMode","heap_max_mb":$heapMb,"cpus":"$cpus"}"""
    Files.writeString(Paths.get("bench_result.json"), line + "\n")
    // The metric line goes out LAST, after spark.stop(), so no executor/
    // shutdown logging can interleave with it and a last-JSON-line parse
    // finds it (the driver's BENCH parse came back null in rounds 1-2).
    spark.stop()
    System.out.println(line)
    System.out.flush()
  }
}
