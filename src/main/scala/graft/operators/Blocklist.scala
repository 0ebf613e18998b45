package graft.operators

import graft.functions.AhoCorasick
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern content filtering — the C4/RefinedWeb badwords /
  * blocklist stage as corpus operators over the [[graft.functions
  * .AcCounts]] Aho–Corasick kernel: ONE codegen'd scan per document for
  * the ENTIRE pattern set (occurrences at every ending position,
  * overlaps included; case-sensitive — lower() both sides upstream for
  * case-folded gating). Reference surface: the filter-expression
  * mini-DSL and `bind` closures express per-pattern `contains`; this is
  * the many-pattern form whose cost at 100 TB stays O(|text|) per
  * document regardless of blocklist size (automaton is a plan constant,
  * O(Σ|pattern|) memory, broadcast with the plan — no join, no shuffle,
  * no state, so the gate is also streaming-append-safe as
  * [[graft.streaming.GraftStreaming.blocklistStream]]).
  */
object Blocklist {

  /** Per-pattern hit-count column: array<long>, one slot per pattern. */
  def countsCol(text: Column, patterns: Seq[String]): Column =
    AhoCorasick.countsCol(text, patterns)

  /** (idCol, hits, patterns_hit): total occurrences and distinct
    * patterns present per document — the audit form (what WOULD a gate
    * at threshold t drop?). One zero-shuffle projection.
    */
  def matchCounts(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        countsCol(col(textCol), patterns).as("__c"))
      .select(col(idCol),
        aggregate(col("__c"), lit(0L), (a, x) => a + x).as("hits"),
        aggregate(col("__c"), lit(0L),
          (a, x) => a + when(x > 0L, 1L).otherwise(0L)).as("patterns_hit"))

  /** Drop every document with more than `maxHits` total blocklist
    * occurrences (C4's badwords rule is `maxHits = 0`: any hit drops the
    * page). Keeps the input schema; `blocklist_hits` rides along.
    */
  def gate(df: DataFrame, textCol: String, patterns: Seq[String],
      maxHits: Long = 0L): DataFrame =
    df.withColumn("blocklist_hits",
        aggregate(countsCol(col(textCol), patterns), lit(0L), (a, x) => a + x))
      .where(col("blocklist_hits") <= maxHits)
}
