package graft.queries

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Frequent, PairBudget, Retrieval, Snapshot, Split}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators that close the loop from raw documents to a
  * training set: deterministic splits (plain / stratified-exact /
  * leakage-safe), snapshot diffing + incremental recompute, blocked
  * edit-distance fuzzy dedup, per-group heavy hitters, and BM25 ranked
  * retrieval. Every query here is fully DuckDB-oracled — the split
  * thresholds, BM25 coefficients, and stratified cuts are GENERATED from
  * the same Scala definitions the Spark path executes (the
  * OracleFixtures discipline), so the two engines cannot drift.
  */
object CurationQueries {

  private def q(name: String, oracle: String = null, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Option(oracle), bench)

  // 90/5/5 and 80/10/10 — the standard corpus split shapes
  private val Parts955 = Seq(("train", 90L), ("val", 5L), ("test", 5L))
  private val Parts811 = Seq(("train", 80L), ("val", 10L), ("test", 10L))

  private val splitQ = q("q_split",
    s"""SELECT doc_id, ${Split.assignSql(OracleSql.lcg31("doc_id"), Parts955)} AS split
       FROM documents""") { (s, d) =>
    Split.byHash(Tables.df(s, d, "documents"), "doc_id", Parts955)
      .select("doc_id", "split")
  }

  private val splitStratifiedQ = q("q_split_stratified",
    s"""WITH r AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
             ORDER BY ${OracleSql.lcg31("doc_id")}, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
         FROM documents)
       SELECT doc_id, lang, ${Split.stratifiedCaseSql("rn", "n", Parts811)} AS split
       FROM r""") { (s, d) =>
    Split.stratifiedExact(Tables.df(s, d, "documents"), "doc_id", "lang", Parts811)
      .select("doc_id", "lang", "split")
  }

  /** Leakage-safe split over a corpus with planted exact duplicates: every
    * member of a duplicate cluster follows the min-id representative's
    * hash — SplitSpec additionally asserts zero clusters straddle splits.
    */
  private val splitGroupQ = q("q_split_group",
    s"""WITH c AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                   FROM (SELECT doc_id, text FROM documents
                         UNION ALL SELECT doc_id + 10000, text FROM documents)),
         g AS (SELECT fp, MIN(doc_id) AS rep FROM c GROUP BY fp)
       SELECT c.doc_id AS doc_id, g.rep AS rep,
              ${Split.assignSql(OracleSql.lcg31("g.rep"), Parts955)} AS split
       FROM c JOIN g USING (fp)""") { (s, d) =>
    val base = Tables.df(s, d, "documents").select("doc_id", "text")
    val corpus = base.unionByName(base.withColumn("doc_id", col("doc_id") + 10000))
    val c = corpus.withColumn("fp", fingerprint(col("text")))
    val g = c.groupBy("fp").agg(min(col("doc_id")).as("rep"))
    Split.groupAware(c.join(g, "fp"), "rep", Parts955)
      .select("doc_id", "rep", "split")
  }

  /** End-to-end dedup-aware split: near-duplicate clusters (the exact
    * 2-gram-Jaccard component graph of q_dedup_clusters) collapse to their
    * min-id representative, singletons represent themselves, and every doc
    * follows its representative's hash — so a near-duplicate of a training
    * doc can never leak into eval. This is the full pipeline a curation
    * stack actually runs; the oracle replays clustering (recursive CTE)
    * AND the split thresholds from the same shared definitions.
    */
  private val splitNearDupQ = q("q_split_neardup",
    raw"""WITH RECURSIVE
       ${ExtQueries.NgramCcCtes},
       cc AS (SELECT node, least(node, MIN(x)) AS cluster FROM reach GROUP BY node)
       SELECT d.doc_id AS doc_id, COALESCE(cc.cluster, d.doc_id) AS rep,
              ${Split.assignSql(OracleSql.lcg31("COALESCE(cc.cluster, d.doc_id)"), Parts955)} AS split
       FROM documents d LEFT JOIN cc ON d.doc_id = cc.node""") { (s, d) =>
    val docs = Tables.df(s, d, "documents")
    val cc = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingle = 2, threshold = 0.1,
        budget = PairBudget.Exact),
      "idA", "idB")
    val withRep = docs.select("doc_id")
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
    Split.groupAware(withRep, "rep", Parts955)
      .select("doc_id", "rep", "split")
  }

  /** The synthetic "next crawl" snapshot, defined ONCE as SQL and mirrored
    * in Spark: every 17th doc removed, every 11th edited, every 13th
    * re-added under a new id.
    */
  private val NewSnapSql =
    """SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 'edit ' || text ELSE text END AS text
       FROM documents WHERE doc_id % 17 <> 0
       UNION ALL
       SELECT doc_id + 50000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0"""

  private def newSnap(s: SparkSession, d: String): DataFrame = {
    val base = Tables.df(s, d, "documents").select("doc_id", "text")
    base.where(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(lit("edit "), col("text")))
          .otherwise(col("text")))
      .unionByName(base.where(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 50000))
  }

  private val snapshotDiffQ = q("q_snapshot_diff",
    s"""WITH o AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                   FROM documents),
         n AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
               FROM ($NewSnapSql))
       SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
              CASE WHEN o.doc_id IS NULL THEN 'added'
                   WHEN n.doc_id IS NULL THEN 'removed'
                   WHEN o.fp = n.fp THEN 'unchanged'
                   ELSE 'changed' END AS status
       FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""") { (s, d) =>
    Snapshot.diff(
      Tables.df(s, d, "documents").select("doc_id", "text"),
      newSnap(s, d), "doc_id", "text")
  }

  /** Incremental recompute vs the full-recompute oracle: the Spark side
    * re-derives token counts ONLY for added/changed docs and carries the
    * old run's results for unchanged ids; DuckDB recomputes everything
    * from the new snapshot. Hash-equality of the two IS the correctness
    * claim of [[graft.operators.Snapshot.incremental]].
    */
  private val incrementalQ = q("q_incremental",
    s"""SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       FROM ($NewSnapSql)""") { (s, d) =>
    val oldDf = Tables.df(s, d, "documents").select("doc_id", "text")
    val fn: DataFrame => DataFrame = df =>
      df.select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
    Snapshot.incremental(oldDf, newSnap(s, d), fn(oldDf), "doc_id", "text")(fn)
  }

  /** Fuzzy dedup corpus: originals plus head-edited twins at edit distance
    * doc_id % 4 (prepended 'x's), so distances 0, 1, 2 qualify at
    * maxDist = 2 and 3 is provably excluded. The oracle is the BRUTE-FORCE
    * definition (all id-ordered pairs within the length precondition) —
    * agreement proves the length-bucket blocking loses nothing.
    */
  private val dedupFuzzyQ = q("q_dedup_fuzzy",
    """WITH c AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 10000, repeat('x', CAST(doc_id % 4 AS INT)) || text
                  FROM documents)
       SELECT a.doc_id AS idA, b.doc_id AS idB,
              CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
       FROM c a JOIN c b ON a.doc_id < b.doc_id
       WHERE abs(length(a.text) - length(b.text)) <= 2
         AND levenshtein(a.text, b.text) <= 2""") { (s, d) =>
    val base = Tables.df(s, d, "documents").select("doc_id", "text")
    val corpus = base.unionByName(
      base.select((col("doc_id") + 10000).as("doc_id"),
        concat(expr("repeat('x', CAST(doc_id % 4 AS INT))"), col("text")).as("text")))
    Dedup.fuzzyEditDistancePairs(corpus, "doc_id", "text", maxDist = 2)
  }

  /** Unrolled-CTE oracle for [[graft.operators.Graph.pageRank]] over the
    * deterministic doc-id link graph (v → 3v mod m, v → 5v mod m; dense
    * ids make 0 and m/2 dangling). Each iteration's update expression
    * comes from Graph.rankUpdateExpr — the SAME template the Spark loop
    * executes, rendered with DuckDB's `//`.
    */
  private def pageRankOracleSql(iters: Int): String = {
    val S = graft.operators.Graph.Scale
    val head =
      s"""WITH $LinkGraphCtes,
         outd AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         r0 AS (SELECT v, $S // (SELECT n FROM nn) AS r FROM nodes)"""
    val iterCtes = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (SELECT e.dst AS v, CAST(SUM($p.r // o.deg) AS BIGINT) AS c
             FROM edges e JOIN outd o ON e.src = o.src JOIN $p ON $p.v = e.src
             GROUP BY 1),
         d$i AS (SELECT CAST(COALESCE(SUM($p.r), 0) AS BIGINT) AS dm FROM $p
                 LEFT JOIN outd o ON $p.v = o.src WHERE o.src IS NULL),
         r$i AS (SELECT nodes.v AS v,
                   ${graft.operators.Graph.rankUpdateExpr("//", s"c$i.c",
                     s"(SELECT dm FROM d$i)", "(SELECT n FROM nn)")} AS r
                 FROM nodes LEFT JOIN c$i ON nodes.v = c$i.v)"""
    }.mkString(",\n")
    s"$head,\n$iterCtes\nSELECT v AS doc_id, CAST(r AS BIGINT) AS rank_units FROM r$iters"
  }

  /** The deterministic doc-id link graph shared by q_pagerank and
    * q_label_prop: v → 3v mod m, v → 5v mod m (m = max id + 1), self-loops
    * and out-of-corpus targets dropped.
    */
  private def linkGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val nodes = Tables.df(s, d, "documents").select(col("doc_id").as("v"))
    val mAgg = nodes.agg((max(col("v")) + 1).as("m"))
    def half(mult: Int) = nodes.crossJoin(broadcast(mAgg))
      .select(col("v").as("src"), ((col("v") * mult) % col("m")).as("dst"))
    val edges = half(3).unionByName(half(5))
      .where(col("src") =!= col("dst"))
      .join(nodes.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
      .distinct()
    (nodes, edges)
  }

  /** The matching oracle CTE block: `nodes` and `edges` from `documents`. */
  private val LinkGraphCtes =
    """nodes AS (SELECT doc_id AS v FROM documents),
       nn AS (SELECT COUNT(*) AS n, MAX(v) + 1 AS m FROM nodes),
       cand AS (SELECT v AS src, (v * 3) % (SELECT m FROM nn) AS dst FROM nodes
                UNION ALL SELECT v, (v * 5) % (SELECT m FROM nn) FROM nodes),
       edges AS (SELECT DISTINCT src, dst FROM cand
                 WHERE src <> dst AND dst IN (SELECT v FROM nodes))"""

  /** Hybrid-retrieval fusion: two deterministic per-customer order
    * rankings (by price, by recency) fused with integer fixed-point RRF
    * (Retrieval.reciprocalRankFusion — 10^12 // (60 + rank) per list,
    * exact BIGINT sums, no float rank flips), top-5 per customer.
    */
  private val rrfQ = q("q_rrf",
    """WITH r1 AS (SELECT o_custkey AS q, o_orderkey AS item,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders),
       r2 AS (SELECT o_custkey AS q, o_orderkey AS item,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey ASC) AS rk
           FROM orders),
       u AS (SELECT q, item, rk FROM r1 WHERE rk <= 10
             UNION ALL SELECT q, item, rk FROM r2 WHERE rk <= 10),
       f AS (SELECT q, item, SUM(1000000000000 // (60 + rk)) AS rrf_score
             FROM u GROUP BY 1, 2),
       rr AS (SELECT q AS o_custkey, item AS o_orderkey,
                CAST(rrf_score AS BIGINT) AS rrf_score,
                row_number() OVER (PARTITION BY q
                  ORDER BY rrf_score DESC, item ASC) AS fused_rank
              FROM f)
       SELECT o_custkey, o_orderkey, rrf_score,
              CAST(fused_rank AS BIGINT) AS fused_rank
       FROM rr WHERE fused_rank <= 5""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.df(s, d, "orders")
    def ranked(order: Seq[org.apache.spark.sql.Column]) = o.withColumn("rk",
        row_number().over(Window.partitionBy(col("o_custkey")).orderBy(order: _*)))
      .where(col("rk") <= 10)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
    val u = ranked(Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .unionByName(ranked(Seq(col("o_orderdate").desc, col("o_orderkey").asc)))
    graft.operators.Retrieval.reciprocalRankFusion(
      u, "o_custkey", "o_orderkey", "rk", topK = 5, k = 60L)
  }

  /** Per-node triangle counts over a same-nation near-key customer graph
    * (edges: customers of one nation with key distance 1..3 — local
    * cliques, so triangles exist). The engine runs degree-ordered wedge
    * counting (Graph.triangleCounts, the O(m^1.5) shape); the oracle is
    * the ALGORITHM-INDEPENDENT ground truth — a plain ordered 3-join —
    * so the optimized plan is checked against first-principles truth,
    * not a mirror of itself.
    */
  private val trianglesQ = q("q_triangles",
    """WITH e AS (SELECT a.c_custkey AS a, b.c_custkey AS b
                  FROM customer a JOIN customer b
                    ON a.c_nationkey = b.c_nationkey
                   AND b.c_custkey - a.c_custkey BETWEEN 1 AND 3),
       tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM e e1 JOIN e e2 ON e1.b = e2.a
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       m AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri)
       SELECT v, CAST(COUNT(*) AS BIGINT) AS n_tri FROM m GROUP BY 1""") { (s, d) =>
    val c = Tables.df(s, d, "customer")
      .select(col("c_custkey").as("k"), col("c_nationkey").as("n"))
    val e = c.as("x").join(c.as("y"),
        col("x.n") === col("y.n") &&
          col("y.k") - col("x.k") >= 1 && col("y.k") - col("x.k") <= 3)
      .select(col("x.k").as("a"), col("y.k").as("b"))
    graft.operators.Graph.triangleCounts(e, "a", "b")
  }

  private val pageRankQ = q("q_pagerank", pageRankOracleSql(3)) { (s, d) =>
    val (nodes, edges) = linkGraph(s, d)
    graft.operators.Graph.pageRank(nodes, edges, iters = 3)
      .select(col("v").as("doc_id"), col("r").as("rank_units"))
  }

  /** Unrolled-CTE oracle for [[graft.operators.Graph.labelPropagate]]:
    * each round is MIN over the undirected neighborhood — integer-exact,
    * so the 3-hop community labels hash-match engine to engine.
    */
  private def labelPropOracleSql(iters: Int): String = {
    val head =
      s"""WITH $LinkGraphCtes,
         und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         l0 AS (SELECT v, v AS l FROM nodes)"""
    val iterCtes = (1 to iters).map { i =>
      val p = s"l${i - 1}"
      s"""n$i AS (SELECT u.dst AS v, MIN($p.l) AS nl
             FROM und u JOIN $p ON $p.v = u.src GROUP BY 1),
         l$i AS (SELECT $p.v AS v, least($p.l, COALESCE(n$i.nl, $p.l)) AS l
                 FROM $p LEFT JOIN n$i ON $p.v = n$i.v)"""
    }.mkString(",\n")
    s"$head,\n$iterCtes\nSELECT v AS doc_id, CAST(l AS BIGINT) AS label FROM l$iters"
  }

  private val labelPropQ = q("q_label_prop", labelPropOracleSql(3)) { (s, d) =>
    val (nodes, edges) = linkGraph(s, d)
    graft.operators.Graph.labelPropagate(nodes, edges, iters = 3)
      .select(col("v").as("doc_id"), col("l").as("label"))
  }

  /** Unrolled-CTE oracle for
    * [[graft.operators.Graph.pageRankPersonalized]] — teleport/dangling
    * mass confined to the seed set (every 25th doc), update expression
    * rendered from Graph.pprUpdateExpr for both engines.
    */
  private def pprOracleSql(iters: Int): String = {
    val S = graft.operators.Graph.Scale
    val head =
      s"""WITH $LinkGraphCtes,
         seeds AS (SELECT v FROM nodes WHERE v % 25 = 0),
         ss AS (SELECT COUNT(*) AS s FROM seeds),
         mk AS (SELECT nodes.v AS v, (seeds.v IS NOT NULL) AS is_seed
                FROM nodes LEFT JOIN seeds ON nodes.v = seeds.v),
         outd AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         r0 AS (SELECT v, is_seed,
                  CASE WHEN is_seed THEN $S // (SELECT s FROM ss)
                       ELSE CAST(0 AS BIGINT) END AS r
                FROM mk)"""
    val iterCtes = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (SELECT e.dst AS v, CAST(SUM($p.r // o.deg) AS BIGINT) AS c
             FROM edges e JOIN outd o ON e.src = o.src JOIN $p ON $p.v = e.src
             GROUP BY 1),
         d$i AS (SELECT CAST(COALESCE(SUM($p.r), 0) AS BIGINT) AS dm FROM $p
                 LEFT JOIN outd o ON $p.v = o.src WHERE o.src IS NULL),
         r$i AS (SELECT mk.v AS v, mk.is_seed AS is_seed,
                   ${graft.operators.Graph.pprUpdateExpr("//", s"c$i.c",
                     s"(SELECT dm FROM d$i)", "(SELECT s FROM ss)", "mk.is_seed")} AS r
                 FROM mk LEFT JOIN c$i ON mk.v = c$i.v)"""
    }.mkString(",\n")
    s"$head,\n$iterCtes\nSELECT v AS doc_id, CAST(r AS BIGINT) AS rank_units FROM r$iters"
  }

  private val pageRankSeededQ = q("q_pagerank_seeded", pprOracleSql(3)) { (s, d) =>
    val (nodes, edges) = linkGraph(s, d)
    graft.operators.Graph.pageRankPersonalized(nodes, edges,
      nodes.where(col("v") % 25 === 0), iters = 3)
      .select(col("v").as("doc_id"), col("r").as("rank_units"))
  }

  private val frequentTokensQ = q("q_frequent_tokens",
    """WITH t AS (SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
                  FROM documents),
         tok AS (SELECT * FROM t WHERE word <> ''),
         c AS (SELECT source, word, COUNT(*) AS n FROM tok GROUP BY 1, 2),
         tot AS (SELECT source, COUNT(*) AS total FROM tok GROUP BY 1)
       SELECT c.source AS source, c.word AS word, CAST(c.n AS BIGINT) AS n
       FROM c JOIN tot USING (source)
       WHERE c.n * 50 >= tot.total * 1""") { (s, d) =>
    Frequent.frequentTokens(Tables.df(s, d, "documents"), "source", "text",
      supNum = 1, supDen = 50)
  }

  private val Bm25Terms = Seq("join", "merge", "vector")

  private val bm25Q = q("q_bm25",
    s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
                   FROM documents),
         tok AS (SELECT * FROM t WHERE term <> ''),
         dls AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
         tot AS (SELECT COUNT(*) AS nn, SUM(dl) AS sumdl FROM dls),
         tfs AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                 WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
                 GROUP BY 1, 2),
         dfs AS (SELECT term, COUNT(*) AS dfn FROM tfs GROUP BY 1),
         sc AS (SELECT tfs.doc_id, tfs.term,
                  ${Retrieval.bm25ScoreSql(6, 5, 3, 4)} AS score
                FROM tfs JOIN dls USING (doc_id) CROSS JOIN tot JOIN dfs USING (term))
       SELECT term, CAST(rnk AS BIGINT) AS rank, doc_id, score
       FROM (SELECT *, row_number() OVER (PARTITION BY term
               ORDER BY score DESC, doc_id ASC) AS rnk FROM sc)
       WHERE rnk <= 10""") { (s, d) =>
    Retrieval.bm25(Tables.df(s, d, "documents"), "doc_id", "text", Bm25Terms, topK = 10)
  }

  val all: Seq[QueryDef] = Seq(
    splitQ, splitStratifiedQ, splitGroupQ, splitNearDupQ, snapshotDiffQ, incrementalQ,
    dedupFuzzyQ, frequentTokensQ, bm25Q, rrfQ, pageRankQ, labelPropQ, pageRankSeededQ,
    trianglesQ)
}
