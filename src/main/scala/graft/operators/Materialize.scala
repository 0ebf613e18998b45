package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialize a mid-pipeline table exactly once with a bounded lifetime:
  * lazy localCheckpoint, so (a) blocks are freed by the ContextCleaner
  * when the result plan becomes unreachable (persist() entries live in
  * the CacheManager until an explicit unpersist), and (b) 2x-replicated
  * storage, so losing a single executor loses no blocks. The residual
  * tradeoff vs persist(): simultaneous loss of both replicas fails the
  * job instead of recomputing from (truncated) lineage — for multi-hour
  * jobs on preemptible nodes, prefer a reliable `checkpoint()` to durable
  * storage upstream.
  */
object Materialize {
  def once(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false, storageLevel = StorageLevel.MEMORY_AND_DISK_2)
}
