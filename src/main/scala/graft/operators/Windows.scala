package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Index-based windows — the reference's WindowCollectable.slide/tumble
  * (semantic.h:1595-1643, 908-913): windows over the LOGICAL INDEX, not
  * time. Batch shape: assign window ids and aggregate — one shuffle, no
  * per-window materialization. Partial tail windows are included, exactly
  * like the reference (window starts at every multiple of `step` < n).
  *
  * For the time-based streaming reinterpretation see
  * [[graft.streaming.StreamWindows]].
  */
object Windows {

  /** Tumbling window id: idx ∈ [w·size, (w+1)·size) → w
    * (tumble(size) ≡ slide(size, size), semantic.h:910-913). */
  def tumbleId(idx: Column, size: Long): Column = floor(idx / size).cast("long")

  /** All sliding-window ids covering idx: w·step ≤ idx < w·step+size.
    * Emitted via `sequence` + `explode` — each row fans out to at most
    * ⌈size/step⌉ windows, fully distributed, no self-join. */
  def slideIds(idx: Column, size: Long, step: Long): Column = {
    val wMax = floor(idx / step)
    val wMin = greatest(lit(0L), floor((idx - size) / step) + 1)
    explode(sequence(wMin.cast("long"), wMax.cast("long")))
  }

  /** Fixed-size chunks in arrival order — the reference's partition(size)
    * collector (collector.h:2098-2136). */
  def chunkId(idx: Column, size: Long): Column = tumbleId(idx, size)
}
