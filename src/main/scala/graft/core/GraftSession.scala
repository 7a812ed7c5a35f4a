package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 32 shuffle partitions); on a real cluster the same builder is used
  * with `master` unset and shuffle partitions sized to ~2-3x total
  * cores (or left to AQE coalescing, which is enabled here).
  */
object GraftSession {

  /** Apply engine-required SQL confs to an existing session (used when
    * the driver harness owns the builder, e.g. Verify/Bench). Safe to
    * call repeatedly; all confs are runtime-settable.
    */
  def configure(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // The driver-generated events.parquet carries TIMESTAMP(NANOS),
    // which Spark's parquet reader rejects by default; read as raw
    // nanosecond longs and convert explicitly (core.Tables.events).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    // Driver testdata generations have flipped between TIMESTAMP(NANOS)
    // and TIMESTAMP(MICROS) parquet annotations; read every micros
    // timestamp as TimestampType (not NTZ) so literal comparisons and
    // window functions type-check identically across generations. With
    // the session timezone pinned UTC this relabels the same value.
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Runtime re-planning: partition coalescing + skew-join splitting.
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Round-13 measurement (Profile13 minpart, OPTIMIZATION_r13.md):
    // AQE's byte-based coalescing merges CPU-heavy but byte-light
    // post-shuffle stages below the core count — a 1.3M-row pair set
    // is ~20 MB, so the default 1 MB floor coalesces the per-pair
    // jaccard/containment walks to a fraction of local[32] (q29
    // 3.8 s -> 1.7-2.0 s with a smaller floor; q66/q128 similar).
    // 128k keeps local parallelism at the core count for these
    // stages while staying invisible at production scale, where
    // post-shuffle partitions are far above 1 MB either way — the
    // floor only matters in the small-bytes/heavy-CPU regime.
    // Env-overridable for cluster deployments that want the default.
    c.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "128k"))
    spark
  }

  def build(appName: String = "graft",
            master: Option[String] = Some(s"local[$defaultCpus]"),
            shufflePartitions: Int = defaultCpus): SparkSession = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    val spark = b
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
}
