package graft.streaming

/** State-store deployment presets — the round-14 d8/d12 provider A/B
  * (results/d8_provider_ab_r14.json, results/d12 live runs) promoted
  * from probe defaults + scaladoc notes into a library surface a
  * deployment actually calls. The measured decision table:
  *
  *  - SPAN-SCALE state (millions+ live rows — d8's substring spans,
  *    d12's dual-buffered interval join): the default on-heap
  *    HDFSBackedStateStoreProvider OOMs (~16.5M span states per
  *    32-thread JVM at the 500k-doc probe); RocksDB holds state in
  *    native memory + disk, and CHANGELOG checkpointing makes each
  *    commit ship the batch's delta (snapshots upload async) instead
  *    of a full snapshot per commit: d8@500k 75.5 → 55.4 s, d12-live
  *    44.1 → 25.7 s, neutral on small state (d11 5.66 vs 5.69 s).
  *    State shards = cores: the same A/B measured shards 8/32/64 at
  *    22.4-vs-26.6/16.1/20.3 s — fewer shards serialize ingest,
  *    more shards multiply per-commit overhead.
  *  - SKETCH-SCALE state (a bounded handful of rows per key group —
  *    d11/d14/d15's one-sketch-per-source, d16's k-row reservoirs):
  *    stay on the heap provider and keep shards at min(8, cores) —
  *    every micro-batch commits one store PER SHARD, so shards follow
  *    state volume, not core count (Bench stateful-class curve:
  *    22.0/14.1/12.4/11.7 s total at 32/16/8/4 shards on 32 threads).
  *
  * Apply at session build (`configs.foldLeft(builder)((b, kv) =>
  * b.config(kv._1, kv._2))`) or per-query via `spark.conf.set` before
  * the stream starts — the state-store provider and shard count bind
  * when the query's FIRST checkpoint is written and are then pinned
  * for the checkpoint's lifetime, so pick by the state volume the
  * query will reach, not the volume it starts with.
  *
  * COMMIT BATCHING (r17 A/B, results/d8_state_commit_ab_r17.json):
  * at identical state volume, per-trigger per-store commit machinery
  * costs ~2.3 s per extra trigger at 32 stores (1 trigger 15.5 s vs
  * 8 triggers 31.6 s over the same 100k-doc corpus, rocksdb+
  * changelog, no eviction). Fewer, larger micro-batches
  * (maxFilesPerTrigger / trigger interval, bounded by the latency
  * SLO) are the third lever next to provider and shard count; the
  * min-of-5 changelog-vs-full-snapshot confirmation (0.77x) is in the
  * same artifact.
  */
object StateStoreConf {
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The span-scale STORE conf alone (RocksDB + changelog
    * checkpointing), for harnesses that manage their shard count
    * themselves (ScaleProbe's A/B knob). */
  val largeStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Span-scale preset: RocksDB + changelog checkpointing, state
    * shards = cores. */
  def largeState(cores: Int): Map[String, String] = {
    require(cores > 0, s"cores must be positive, got $cores")
    largeStateStore + ("spark.sql.shuffle.partitions" -> cores.toString)
  }

  /** Sketch-scale preset: heap provider (the Spark default), shards
    * follow state volume. The provider and changelog flag are PINNED
    * explicitly, not left to the session default: presets may be
    * applied per-query via `spark.conf.set`, and switching from
    * [[largeState]] to this one mid-session would otherwise silently
    * run sketch-scale streams on the span-scale RocksDB provider (the
    * session conf keeps the last value set). */
  def smallState(cores: Int): Map[String, String] = {
    require(cores > 0, s"cores must be positive, got $cores")
    Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming." +
          "state.HDFSBackedStateStoreProvider"),
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "false",
      "spark.sql.shuffle.partitions" -> math.min(8, cores).toString)
  }
}
