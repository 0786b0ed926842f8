package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic N× scale-up generator for the bench's scale-regression point
  * (SURVEY §4's probe as a reproducible artifact): replicates every base
  * table `factor`× with key remapping that preserves join semantics, and
  * perturbs documents/embeddings so each base row becomes a `factor`-way
  * NEAR-DUP CLIQUE — the maximal-pair-density shape that stresses the
  * LSH/verify family the way a boilerplate-heavy real corpus does.
  *
  *  - keys: id' = id * factor + replica, applied consistently on both
  *    sides of every FK (orders.o_custkey ↔ customer.c_custkey,
  *    lineitem.l_orderkey ↔ orders.o_orderkey, events.user_id), so join
  *    fan-outs scale linearly, not quadratically;
  *  - documents: every 25th token (at a per-doc phase) is rewritten to a
  *    replica-specific marker — within-clique bigram Jaccard lands ~0.85,
  *    above every dedup operating threshold, while cross-doc similarity
  *    is untouched;
  *  - embeddings: elementwise relative perturbation with a deterministic
  *    per-(id, replica, index) sign — within-clique cosine ~0.999;
  *  - dims (region/nation/part/supplier) copy as-is: scale-up multiplies
  *    facts, not dimensions.
  *
  * Usage: runMain graft.ScaleGen <baseSfDir> <factor> <outDir>
  */
object ScaleGen {

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_r", explode(sequence(lit(0), lit(factor - 1))))

  private def remap(c: String, factor: Int) =
    (col(c) * factor + col("_r")).as(c)

  def main(args: Array[String]): Unit = {
    val Array(baseDir, factorS, outDir) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, baseDir)

    def write(name: String, df: DataFrame): Unit =
      df.drop("_r").write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // dims copy through unchanged
    Seq("region", "nation", "part", "supplier").foreach(n =>
      write(n, t.table(n)))

    write("customer", replicate(t.table("customer"), factor)
      .select(remap("c_custkey", factor), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment")))

    write("orders", replicate(t.table("orders"), factor)
      .select(remap("o_orderkey", factor), remap("o_custkey", factor),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))

    write("lineitem", replicate(t.table("lineitem"), factor)
      .select(remap("l_orderkey", factor), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")))

    // events.ts stays the raw nanos long (Tables converts on read)
    write("events", replicate(t.table("events"), factor)
      .select(remap("event_id", factor), col("ts"),
        remap("user_id", factor), col("event_type"), col("value"),
        col("props")))

    // documents: replica r of a doc rewrites tokens at positions
    // i ≡ doc_id (mod 25) to "xrep<r>" — same positions across a clique,
    // different values, so within-clique bigram Jaccard ≈ 0.85 and the
    // clique never bleeds into unrelated docs
    write("documents", replicate(t.table("documents"), factor)
      .withColumn("text", array_join(
        transform(split(col("text"), "\\s+"), (tok, i) =>
          when(i % 25 === col("doc_id") % 25,
            concat(lit("xrep"), col("_r"))).otherwise(tok)),
        " "))
      .select(remap("doc_id", factor), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars")))

    // embeddings: deterministic ±3% elementwise wiggle per (id, replica,
    // index) — within-clique cosine stays ≈ 0.999, far above any τ
    write("embeddings", replicate(t.table("embeddings"), factor)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x * (lit(1.0) + lit(0.03) *
            when(pmod(col("vec_id") * 31 + col("_r") * 17 + i, lit(2)) === 0,
              lit(1.0)).otherwise(lit(-1.0)))).cast("float")))
      .select(remap("vec_id", factor), col("embedding"), col("label")))

    println(s"wrote ${factor}x of $baseDir to $outDir")
    spark.stop()
  }
}
