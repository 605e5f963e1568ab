package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic k× scale-up of a driver testdata directory — the
  * sf1-scale evidence generator (the driver ships sf up to 0.1; the
  * scale gate wants the SAME 149-query sweep at 10× that).
  *
  * WEAK-SCALING semantics, the [[ScaleProbe]] recipe applied to every
  * table: replica i carries shifted keys and (for content tables) a
  * disjoint token vocabulary / decorrelated embedding signs, so each
  * replica contributes its OWN dup/similarity structure and totals
  * scale linearly in k. (Plain replication would make every document
  * a 10-way near-duplicate — pair counts ×k², which measures the
  * generator's degeneracy, not the operators.)
  *
  *  - TPC-H tables: key columns shifted by a per-replica stride
  *    (orderkey/event stride 10M, entity strides 1M), FK integrity
  *    preserved because both sides of every FK shift together;
  *    nation/region are dimensions and stay fixed.
  *  - documents: every token prefixed with the replica tag (disjoint
  *    shingle spaces — no cross-replica near-dups), n_chars adjusted
  *    by the tag bytes; doc_id stride 1M, matching vec_id so the
  *    docs⋈embeddings alignment survives.
  *  - embeddings: per-replica deterministic sign pattern over
  *    coordinates (replica 0 = identity) — within-replica cosines
  *    exact, cross-replica pairs decorrelated.
  *  - events: user/event ids shifted (10 independent user
  *    populations over the same wall-clock range — k× events/day).
  *
  * Usage: runMain graft.ScaleUp [inDir] [outDir] [k]
  * Defaults: /root/testdata/sf0.1 → target/sf1 at k=10.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val inDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "target/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    // the embedding sign patterns (2i+1 mod P, P prime) are distinct
    // odd residues only for i < P/2; at i = P/2 the multiplier is 0
    // and the replica becomes the exact NEGATION of replica 0 — a
    // mirror duplicate, the generator degeneracy this tool exists to
    // avoid. P = 101 for k ≤ 50 (BYTE-IDENTICAL to every sf1 artifact
    // generated before the k ≤ 100 extension); P = 211 gives 105
    // distinct patterns for the sf10 decade (k = 100); P = 2003 covers
    // the sf100 decade (k = 1000; 2i+1 ≤ 1999 < 2003, all distinct).
    // Id strides are 1M, so the INPUT's ids must stay under 1M — scale
    // from the base testdata, never from an already-scaled output
    // (whose ids reach k·1M and would collide across replicas).
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val P = if (k <= 50) 101 else if (k <= 100) 211 else 2003
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def in(name: String): DataFrame = spark.read.parquet(s"$inDir/$name.parquet")
    // optional comma-separated table allowlist: a docs-only decade
    // probe need not pay for (or store) a 12 GB lineitem
    val onlyTables = sys.env.get("GRAFT_SCALEUP_TABLES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    /** Enforce the ids-under-stride precondition LOUDLY: an input that
      * is itself a scaled output carries ids up to k·stride, and the
      * per-replica shifts would silently collide — producing exactly
      * the mirror-duplicate degeneracy this generator exists to avoid.
      * One cheap max() per shifted key column, only for tables that
      * will actually be written, only when a second replica exists. */
    def requireIdsUnder(name: String, keys: (String, Long)*): Unit = {
      if (k <= 1 || !onlyTables.forall(_.contains(name))) return
      val maxes = in(name).agg(
        max(col(keys.head._1).cast("long")),
        keys.tail.map(kv => max(col(kv._1).cast("long"))): _*).head()
      keys.zipWithIndex.foreach { case ((c, stride), idx) =>
        val m = maxes.getLong(idx)
        require(m < stride,
          s"[scaleup] $name.$c max=$m >= stride $stride — input looks like an " +
            "already-scaled output; scale from the BASE testdata only")
      }
    }
    def write(name: String, df: => DataFrame, parts: Int): Unit = {
      if (!onlyTables.forall(_.contains(name))) return
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    /** Union of per-replica transforms of `base`. */
    def times(base: DataFrame)(one: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => one(base, i)).reduce(_ unionByName _)

    val E = 1000000L   // entity stride (cust/part/supp/doc/vec/user)
    val O = 10000000L  // orderkey/event stride (6M lineitem rows at k=10)

    requireIdsUnder("customer", "c_custkey" -> E)
    requireIdsUnder("supplier", "s_suppkey" -> E)
    requireIdsUnder("part", "p_partkey" -> E)
    requireIdsUnder("orders", "o_orderkey" -> O, "o_custkey" -> E)
    requireIdsUnder("lineitem", "l_orderkey" -> O, "l_partkey" -> E, "l_suppkey" -> E)
    requireIdsUnder("events", "event_id" -> O, "user_id" -> E)
    requireIdsUnder("documents", "doc_id" -> E)
    requireIdsUnder("embeddings", "vec_id" -> E)

    // dimensions: fixed
    write("region", in("region"), 1)
    write("nation", in("nation"), 1)

    write("customer", times(in("customer")) { (t, i) =>
      t.withColumn("c_custkey", col("c_custkey") + lit(i * E))
    }, 4)
    write("supplier", times(in("supplier")) { (t, i) =>
      t.withColumn("s_suppkey", col("s_suppkey") + lit(i * E))
    }, 1)
    write("part", times(in("part")) { (t, i) =>
      t.withColumn("p_partkey", col("p_partkey") + lit(i * E))
    }, 4)
    write("orders", times(in("orders")) { (t, i) =>
      t.withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
        .withColumn("o_custkey", col("o_custkey") + lit(i * E))
    }, 8)
    write("lineitem", times(in("lineitem")) { (t, i) =>
      t.withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
        .withColumn("l_partkey", col("l_partkey") + lit(i * E))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * E))
    }, 32)
    write("events", times(in("events")) { (t, i) =>
      t.withColumn("event_id", col("event_id") + lit(i * O))
        .withColumn("user_id", col("user_id") + lit(i * E))
    }, 16)
    write("documents", times(in("documents")) { (t, i) =>
      if (i == 0) t
      else t
        .withColumn("doc_id", col("doc_id") + lit(i * E))
        // disjoint vocabulary per replica: every token tagged, so no
        // shingle ever matches across replicas (tag length 3 for all
        // i ≤ 9 keeps the n_chars adjustment uniform)
        .withColumn("n_chars", col("n_chars") +
          size(split(col("text"), " ")) * lit(s"r${i}_".length.toLong))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            tk => concat(lit(s"r${i}_"), tk)), " "))
    }, 8)
    write("embeddings", times(in("embeddings")) { (t, i) =>
      // distinct odd multipliers mod 101 (prime) — no two replicas
      // share a sign pattern (the ScaleProbe decorrelation)
      val p = (2 * i + 1) % P
      if (i == 0) t
      else t
        .withColumn("vec_id", col("vec_id") + lit(i * E))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> " +
            s"CASE WHEN ((j + 1) * $p) % $P < ${P / 2} THEN -x ELSE x END)"))
    }, 4)

    spark.stop()
  }
}
