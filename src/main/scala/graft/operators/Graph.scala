package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph primitives over edge DataFrames. Companion to the iterative
  * tier (x111 connected components, x140 PageRank): x163's triangle
  * SQL references its edge CTE three times, and Spark inlines CTEs, so
  * the contract form rebuilds the frequent-pair edge list three times.
  * This operator materializes the edges ONCE and reuses them across
  * the two joins — the x136/x140/x149/x161 policy (declarative SQL for
  * the oracle, persist-once Scala for the executable scale path).
  *
  * Triangle enumeration itself is the standard oriented-edge join:
  * edges kept as p1 < p2, so each triangle (a,b,c) with a<b<c is
  * produced exactly once (no 6-way symmetric duplicates to dedup — the
  * fan-out reduction that makes this viable on power-law graphs).
  */
object Graph {

  /** Frequent-co-occurrence edges from an incidence table: pairs of
    * `itemCol` values sharing a `basketCol` value in at least
    * `minSupport` baskets, oriented item1 < item2. Skew note: pair
    * count is O(baskets · maxBasketSize²); cap basket size upstream
    * for corpora with unbounded baskets (x119's cap pattern).
    */
  def coOccurrenceEdges(df: DataFrame, basketCol: String, itemCol: String,
                        minSupport: Long = 2L): DataFrame = {
    val li = df.select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct()
    li.as("a").join(li.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("p1"), col("b.it").as("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** All triangles (a,b,c), a<b<c, in an oriented edge set (columns
    * p1 < p2). The edge build above it is the expensive part, so it is
    * persisted and reused across both joins — one shuffle to build,
    * two broadcast-or-shuffle joins to close the wedges.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select("p1", "p2").persist(StorageLevel.MEMORY_AND_DISK)
    try {
      e.count() // materialize once, before the three-way reuse
      val t = e.as("e1")
        .join(e.as("e2"), col("e1.p2") === col("e2.p1"))
        .join(e.as("e3"),
          col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
        .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
        .orderBy("a", "b", "c")
      // Force the plan to resolve against the persisted relation now;
      // the caller gets rows computed off the cached edges.
      t.localCheckpoint(eager = true)
    } finally e.unpersist()
  }

  /** Fixed-round k-core peeling over an oriented edge set (p1 < p2):
    * each round drops every vertex whose CURRENT degree is below `k`
    * (and its incident edges), which can push surviving neighbors
    * below k — the feedback that distinguishes peeling from a one-shot
    * degree filter. Returns the surviving vertices with their degree
    * after `rounds` rounds.
    *
    * Iterative-materialized (the x140/x149 policy): each round is one
    * degree aggregation + two semi-join-shaped edge filters, with the
    * round's edge set localCheckpoint'ed so round r+1 never re-executes
    * rounds 1..r — unrolling this same recurrence in Spark SQL would
    * re-evaluate the base edge build ~3^rounds times (CTE inlining, the
    * x136 measurement). The DuckDB oracle (Extensions "x179") unrolls
    * the identical recurrence declaratively, where CTEs materialize.
    * At 100 TB: per round two shuffles of (int, int) edges hashed by
    * endpoint; round count is the fixed peel depth, not data-driven. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var und = edges
      .select(col("p1").as("a"), col("p2").as("b"))
      .union(edges.select(col("p2").as("a"), col("p1").as("b")))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val keep = und.groupBy("a").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("a")
      und = und.join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      r += 1
    }
    und.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("part"), col("deg"))
      .orderBy("part")
  }
}
