package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank (Page/Brin/Motwani/Winograd 1999,
  * public) — the corpus-curation ranking signal: web-scale training-data
  * pipelines rank hosts/domains by link authority (the Common Crawl
  * host-graph ranking pattern) and use the score as a quality prior for
  * source mixing (q70) and filtering. The reference's BI layer ranks
  * units by aggregate counts; this is the graph-structural counterpart.
  *
  * Exactness: ranks live in integer MICRO-UNITS (node mass starts at
  * 1e6). Every per-edge contribution is ONE integral divide —
  * (rank · dampMilli) div (1000 · outdeg) — and every update is an
  * integer sum, so the result is bit-identical on any engine and any
  * partitioning (the BM25/q46 rational-arithmetic rule applied to an
  * iterative kernel; fp PageRank is merge-order-dependent). The q86
  * oracle unrolls the same iterations as DuckDB CTEs and matches
  * exactly. Truncation loses < 1 micro-unit per in-edge per iteration —
  * ranking-irrelevant and perfectly reproducible, which is the point.
  *
  * Dangling nodes (no out-edges) keep receiving the teleport base and,
  * by default, simply absorb their mass (the standard "removed dangling
  * mass" simplification, documented rather than hidden; total mass is
  * then not conserved, relative ranking is unaffected for curation use).
  * `redistributeDangling = true` switches to the canonical formulation,
  * integer-exactly: each iteration sums the dangling nodes' damped
  * micro-rank mass D = (Σ_dangling rank · damp) div 1000, gives every
  * node D div n, and hands the remainder D mod n out as +1 micro-unit to
  * the nodes with the lowest ids (deterministic on any engine/partition
  * count — the q102 oracle replays it in unrolled CTEs). Costs one extra
  * narrow aggregate per iteration (the dangling node set and the id
  * index are static, built once); total mass is then conserved up to the
  * documented per-edge truncation.
  *
  * Scale shape: the edge list joins its static out-degree ONCE, and BOTH
  * static frames — the (src, dst, out) edge frame and the distinct node
  * set — are localCheckpoint'ed before the loop, so no iteration ever
  * re-scans the raw edge source or re-runs the node-distinct shuffle;
  * each iteration is then exactly one src-keyed join (ranks are narrow
  * (node, long) rows) and one dst-keyed partial-aggregated shuffle —
  * the canonical Pregel cadence expressed declaratively. Rank lineage
  * truncates per iteration (the q37 CC-loop rule); nothing but counts
  * ever reaches the driver.
  *
  * Convergence: pass `tolMicro >= 0` to stop as soon as an iteration
  * moves no node by more than `tolMicro` micro-units (max |Δrank| —
  * a counts-only driver check on the same cadence, no data collected).
  * Integer ranks make tolMicro=0 exact: two equal consecutive
  * iterations are a FIXED POINT, so the early-stopped result is
  * bit-identical to any deeper `iters` run (Round7Spec asserts it) —
  * deep graphs no longer need a guessed iteration count.
  */
object PageRank {

  /** `iters` damped iterations over `edges`. Output: (node, rank_micro) —
    * teleport base (1000 − dampMilli)·1000 plus integral in-edge mass.
    * With `tolMicro >= 0`, stops after the first iteration whose
    * max |Δrank_micro| ≤ tolMicro (at most `iters` iterations).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampMilli: Int = 850, tolMicro: Long = -1L,
      redistributeDangling: Boolean = false): DataFrame =
    ranksConverged(edges, srcCol, dstCol, iters, dampMilli, tolMicro,
      redistributeDangling)._1

  /** Static per-run frames for dangling-mass redistribution: the dangling
    * node set, the 1-based id index (remainder micro-units go to the
    * lowest ids), and the node count.
    */
  private[graft] final case class Redistribution(dangling: DataFrame,
      idx: DataFrame, n: Long)

  /** [[ranks]] plus the number of iterations actually executed — the
    * observable for convergence-mode callers (and Round7Spec).
    */
  def ranksConverged(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampMilli: Int = 850,
      tolMicro: Long = -1L,
      redistributeDangling: Boolean = false): (DataFrame, Int) = {
    require(iters >= 1 && dampMilli >= 0 && dampMilli <= 1000)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true) // static node set, built once
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("out")), "src")
      .localCheckpoint(true) // static per-edge out-degree, built once
    val redist = if (!redistributeDangling) None else {
      val dangling = nodes
        .join(eo.select(col("src").as("node")), Seq("node"), "left_anti")
        .localCheckpoint(true) // static: nodes with no out-edges
      Some(Redistribution(dangling, nodeIndex(nodes), nodes.count()))
    }
    var r = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val prev = r
      r = iterate(nodes, eo, prev, dampMilli, redist)
        .localCheckpoint(true) // truncate per-iteration lineage
      if (tolMicro >= 0L && shouldProbe(it, iters)) {
        // counts-only convergence probe: any node moved by > tolMicro?
        // Probing is BATCHED past the early iterations (every iteration
        // while it < ProbeDepth, then every ProbeEvery-th — VERDICT r7
        // task 5): each probe is a driver action (~0.3 s at 32 shuffle
        // partitions), so deep graphs shouldn't pay one per iteration.
        // Skipped probes never change the RESULT at tolMicro = 0 — a
        // fixed point stays fixed under further iterations, so any
        // later probe observes the same convergence (Round7Spec's
        // fixed-point equivalence gate covers this path) — they only
        // trade a few extra cheap iterations for fewer driver actions.
        val moved = r.join(prev.withColumnRenamed("rank_micro", "p"), "node")
          .where(abs(col("rank_micro") - col("p")) > tolMicro)
        converged = moved.isEmpty
      }
      it += 1
    }
    (r, it)
  }

  /** 1-based rank of each node id, built DISTRIBUTEDLY (VERDICT r11
    * task 1): a global `row_number().over(Window.orderBy(node))` funnels
    * every node through ONE task — the classic zipWithIndex bottleneck
    * at 10⁹-node host graphs. Instead: range-partition the node set by
    * id (each partition holds a contiguous id range, partition index
    * increasing with id), rank WITHIN each partition (parallel window),
    * and add per-partition start offsets computed from the partition
    * COUNTS — a driver-side frame bounded by the partition count, never
    * by data — broadcast back onto the rows. Reproduces global
    * ROW_NUMBER-over-id semantics byte-identically (the q102 oracle
    * replays ROW_NUMBER), checkpointed so no iteration re-sorts.
    */
  private[graft] def nodeIndex(nodes: DataFrame): DataFrame =
    nodeIndexFrame(nodes).localCheckpoint(true)

  /** The un-checkpointed index plan — split out so PlanSpec can assert
    * it contains NO single-partition exchange (the gate for this fix).
    */
  private[graft] def nodeIndexFrame(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    // stamp the range-partition id BEFORE any later exchange can move
    // rows; the checkpoint freezes the assignment
    val stamped = nodes.repartitionByRange(col("node"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // per-partition counts → cumulative start offsets: rows == partition
    // count (bounded by spark.sql.shuffle.partitions, not by data)
    val counts = stamped.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = 0L
    val offsets = counts.map { case (pid, cnt) =>
      val start = run; run += cnt; (pid, start)
    }.toSeq
    import spark.implicits._
    stamped.join(broadcast(offsets.toDF("pid", "off")), "pid")
      .select(col("node"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("node"))).cast("long") +
          col("off")).as("idx"))
  }

  /** Probe cadence: every iteration while shallow (cheap, catches quick
    * convergence), every [[ProbeEvery]]-th past [[ProbeDepth]], and
    * always on the final allowed iteration (so `iters`-bounded runs
    * still report convergence when they reach the fixed point exactly
    * at the cap). 0-based `it`.
    */
  private val ProbeDepth = 4
  private val ProbeEvery = 3
  private[graft] def shouldProbe(it: Int, iters: Int): Boolean =
    it < ProbeDepth || (it - ProbeDepth) % ProbeEvery == ProbeEvery - 1 ||
      it == iters - 1

  /** One damped update: rank(n) = base + Σ_{(s,n)∈E} (rank(s)·damp) div
    * (1000·out(s)). Package-private so Round7Spec can assert the
    * iteration plan reads ONLY the checkpointed frames (no raw-edge
    * scan); [[ranks]] always passes checkpointed `nodes`/`eo`.
    */
  private[graft] def iterate(nodes: DataFrame, eo: DataFrame, r: DataFrame,
      dampMilli: Int, redist: Option[Redistribution] = None): DataFrame = {
    val base = lit((1000L - dampMilli) * 1000L)
    val inMass = eo.join(r, eo("src") === r("node"))
      .select(col("dst"),
        expr(s"(rank_micro * $dampMilli) div (1000 * out)").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("m"))
    val plain = nodes.join(inMass, nodes("node") === inMass("dst"), "left")
      .select(col("node"),
        (base + coalesce(col("m"), lit(0L))).as("rank_micro"))
    redist match {
      case None => plain
      case Some(Redistribution(dangling, idx, n)) =>
        // one extra narrow aggregate: the damped dangling mass is a
        // single-row frame broadcast onto the update — ⌊D/n⌋ everywhere,
        // the remainder as +1 micro-units to the lowest-id nodes
        val dmass = r.join(dangling, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank_micro")), lit(0L)).as("dsum"))
          .select(expr(s"(dsum * $dampMilli) div 1000").as("dmass"))
        plain.join(idx, "node")
          .crossJoin(broadcast(dmass))
          .select(col("node"),
            (col("rank_micro") + expr(s"dmass div ${n}L") +
              when(col("idx") <= expr(s"dmass % ${n}L"), lit(1L))
                .otherwise(lit(0L))).as("rank_micro"))
    }
  }
}
