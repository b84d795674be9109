package graft.engine

import org.apache.spark.sql.SparkSession

/** One place that builds the engine's local SparkSession, so session-scoped
  * config is set exactly once at construction instead of mutated mid-query.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` lives here (not in a reader — see
  * [[Tables.events]]): the fixture's `events.ts` is parquet TIMESTAMP(NANOS),
  * which has no per-read option, and flipping the session conf inside a
  * reader would leak the setting into every later query and race under
  * concurrent use. UTC pins `date_format`/`window` output so results are
  * reproducible against the DuckDB oracle regardless of host timezone.
  */
object Sessions {
  def local(cpus: String, appName: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // InferFiltersFromGenerate synthesizes `size(e)>0 AND isnotnull(e)`
      // below every explode; predicate pushdown then re-inlines the full
      // array-producing expression (for shingle sets: a dozen regex splits,
      // some inside lambdas where codegen cannot eliminate them) into that
      // filter, roughly doubling every explode-heavy stage (measured 2× on
      // MinHash shingling). Our generators never feed empty/null arrays
      // (TextOps.shingleSetFromWords guarantees ≥1 element), so the rule
      // only costs.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // The whole-stage-codegen class cache holds 100 entries by default;
      // the 9-stage composed pipeline alone generates ~186 codegen units
      // per execution, so EVERY run of a big plan evicted the entire cache
      // and re-paid ~5-10 s of Janino+JIT (measured per-iteration
      // janinoCompiles=186, jitMs 5-11k on q_pipeline_e2e — the BENCH r7/r8
      // iteration variance). One executor JVM serving many composed
      // queries wants the cache sized to the working set, not the default.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate silently IGNORES creation-time configs when a session
    // already exists in the JVM — without the graft extensions the SQL
    // function registrations vanish and nanos-parquet reads throw deep in
    // the scan. Fail fast with a readable message instead.
    val required = Seq(
      "spark.sql.extensions" -> "graft.functions.GraftExtensions",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.session.timeZone" -> "UTC")
    for ((k, want) <- required) {
      val got = s.conf.getOption(k).orNull
      require(got == want,
        s"Pre-existing SparkSession is incompatible with graft: $k=$got (need $want). " +
          "Stop the existing session (or build it via graft.engine.Sessions) first.")
    }
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
