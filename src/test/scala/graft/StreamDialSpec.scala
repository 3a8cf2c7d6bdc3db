package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming state-store partition dial (SCALE.md r18 measured
  * it at ×1000; r19 encodes it): a stateful operator runs one state
  * store per shuffle partition, so partition count trades per-batch
  * store-commit fan-out against state-shard parallelism. Measured: the
  * HEAVY stateful entries (state scaling with stream content —
  * q_stream_dedup's dedup keys, q_stream_topk's per-hour-per-user
  * counts) win 32 partitions at the ×1000 corpus (~196 MB events:
  * 44.4→40.5 s, 30.6→27.1 s) while LIGHT fixed-state entries win 8 at
  * every measured volume (2.1 vs 3.0, 2.6 vs 4.5 s at ×1000). The
  * chooser therefore requires BOTH signals — heavy entry AND volume at
  * the measured boundary — exactly like JobCorpus.executionSession's
  * profile gate.
  */
class StreamDialSpec extends AnyFunSuite {

  test("heavy stateful entries flip to 32 partitions only past the measured volume") {
    val big = StreamQueries.HeavyStateVolumeBytes
    // Bench volume (~2 MB events at sf0.1): everything on 8.
    assert(StreamQueries.streamPartitionsFor("q_stream_dedup", 2L << 20) == 8)
    assert(StreamQueries.streamPartitionsFor("q_stream_topk", 2L << 20) == 8)
    // ×1000 volume (~196 MB, the measured winning point): heavy → 32.
    assert(StreamQueries.streamPartitionsFor("q_stream_dedup", 196L << 20) == 32)
    assert(StreamQueries.streamPartitionsFor("q_stream_topk", big) == 32)
    // Light entries stay on 8 at ANY volume — they lose at 32 even at
    // ×1000 (state is O(types×hours) / O(users), no shard bottleneck).
    assert(StreamQueries.streamPartitionsFor("q_stream_windowed", 196L << 20) == 8)
    assert(StreamQueries.streamPartitionsFor("q_stream_user_totals", 1L << 40) == 8)
  }

  test("the real bench corpus routes every entry to the 8-partition child") {
    // The driver's sf dirs sit far below the boundary; a silent
    // boundary change that re-routes the bench would invalidate the
    // promoted record's comparability.
    for (name <- Seq("q_stream_dedup", "q_stream_topk", "q_stream_windowed"))
      assert(StreamQueries.streamPartitions(name, "/root/testdata/sf0.1") == 8,
        s"$name no longer rides the recorded 8-partition child at bench volume")
  }
}
