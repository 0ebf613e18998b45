package graft

/** Dev probe: run [[graft.plans.PlanAssert.heavyFilterKernels]] over the
  * ENTIRE query registry — plan-only (builds each query's DataFrame and
  * inspects the optimized logical plan, executes nothing), so the sweep
  * takes seconds and reports every latent kernel-in-filter inline, not
  * just the three curated pipelines the spec pins.
  *
  * Round-12 triage of the initial 19 hits (fix when the kernel is hot,
  * accept when every barrier costs more than the duplication):
  *  - DotProduct in every ANN query's top-k tail — FIXED: the null-drop
  *    moved from `.where(cosine.isNotNull)` (inlined per PAIR) into the
  *    heap aggregate's `when`-wrapped input (topKByCosine), whose
  *    pre-agg projection computes the cosine once.
  *  - Band/gram kernels duplicated below every posexplode — FIXED by
  *    excluding `InferFiltersFromGenerate` in the graft session builders
  *    (the Generate already skips null/empty arrays; the inferred filter
  *    only re-ran the kernel).
  *  - ByteEntropyBits in the eval lane's score null-filters — FIXED by
  *    materializing the eval-sized (score, label) relations once.
  *  - q_semdedup's per-VECTOR `sqrt(dot(v,v)) IS NOT NULL` (constraint-
  *    inferred from the pair threshold) — ACCEPTED: O(n·d) next to the
  *    O(|cell|²·d) pair work, and the pair kernel itself evaluates once;
  *    any barrier would add a corpus exchange.
  */
object ProbePlanGate {
  def main(args: Array[String]): Unit = {
    val detail = args.contains("--detail")
    val rest = args.filterNot(_ == "--detail")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val only = rest.drop(1).toSet
    val spark = DevSpark.session()
    var bad = 0
    graft.queries.Queries.all
      .filter(qd => only.isEmpty || only.contains(qd.name))
      .foreach { qd =>
      try {
        val df = qd.fn(spark, dir)
        val ks = graft.plans.PlanAssert.heavyFilterKernels(df)
        if (ks.nonEmpty) { bad += 1
          println(s"[plangate] ${qd.name}: ${ks.mkString(", ")}")
          if (detail) df.queryExecution.optimizedPlan.collect {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter
              if f.condition.exists(graft.plans.PlanAssert.isGraftKernel) =>
              println(s"[plangate]   FILTER ${f.condition.sql.take(400)}")
          }
        }
      } catch {
        case e: Throwable =>
          println(s"[plangate] ${qd.name}: PLAN ERROR " +
            e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(120))
      }
    }
    println(s"[plangate] === ${graft.queries.Queries.all.size} queries, $bad with kernel-in-filter ===")
    spark.stop()
  }
}
