package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling probe: times the flagship sub-quadratic operators on
  * 1×/2×/4×/8× synthetic multiples of the sf documents/embeddings
  * tables and prints one JSON line per (operator, scale) — the
  * measured evidence behind "this plan survives a corpus 1000× this
  * size" (a near-flat sec/doc curve means the operator's cost is
  * linear in the corpus, i.e. the inverted-index / LSH / blocked
  * designs are doing their job; a super-linear curve would expose a
  * hidden all-pairs or global-sort term).
  *
  * Corpus multiplication preserves the PER-COPY dup structure while
  * keeping copies disjoint from each other — the weak-scaling shape
  * (k× the data, k× the independent work):
  *  - documents: EVERY token is prefixed with the copy tag, so copy
  *    vocabularies are disjoint and no cross-copy shingle ever
  *    matches (a first version prefixed only one token per doc; that
  *    left all original shingles shared, made every cross-copy pair
  *    of the same doc a near-duplicate, and the probe correctly
  *    reported the resulting quadratic pair growth — the generator,
  *    not the operators, was quadratic);
  *  - embeddings: a per-copy deterministic sign pattern over the
  *    coordinates (copy 0 = identity) keeps within-copy cosine
  *    structure exact and decorrelates cross-copy pairs.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [maxScale]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxScale = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseDocs = docs0.count()

    def docsAt(k: Int): DataFrame =
      (0 until k).map { i =>
        docs0.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          expr(s"array_join(transform(split(text, ' '), t -> concat('c${i}_', t)), ' ')")
            .as("text"),
          col("lang"), col("source"),
          // each token grows by |'cI_'| chars — keep n_chars consistent
          (col("n_chars") + (size(split(col("text"), " "))
            * lit(s"c${i}_".length.toLong))).as("n_chars"))
      }.reduce(_ unionByName _)

    def embAt(k: Int): DataFrame =
      (0 until k).map { i =>
        // distinct sign pattern per copy for all i < 50: multipliers
        // 2i+1 are distinct odd residues mod 101 (prime), so no two
        // copies share a pattern (a mod-13 first draft collided at
        // i and i+13, silently reintroducing quadratic pairs at 16×)
        val p = (2 * i + 1) % 101
        emb0.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          (if (i == 0) col("embedding")
           else expr(s"transform(embedding, (x, j) -> " +
             s"CASE WHEN ((j + 1) * $p) % 101 < 50 THEN -x ELSE x END)"))
            .as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def run(name: String, scale: Int, df: => DataFrame): Unit = {
      graft.operators.OpCaches.releaseAll()
      spark.catalog.clearCache()
      val (sec, rows) = time(df.queryExecution.toRdd.count())
      println(f"""{"op":"$name","scale":$scale,"docs":${baseDocs * scale},""" +
        f""""sec":$sec%.3f,"rows":$rows}""")
    }

    // warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    docsAt(1).queryExecution.toRdd.count()

    Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxScale).foreach { k =>
      run("minhash_lsh", k, graft.operators.Dedup.minhashLsh(docsAt(k)))
      run("jaccard_pairs", k, graft.operators.Dedup.jaccardPairsRaw(docsAt(k)))
      run("keep_list", k, graft.operators.Dedup.keepListRaw(docsAt(k)))
      run("repetition", k, graft.operators.TextAnalysis.repetitionStats(docsAt(k)))
      run("embedding_lsh", k,
        graft.operators.Similarity.cosinePairsLsh(embAt(k), threshold = 0.45))
      // round-4 additions: the dup-rate semi-join and the tfidf
      // postings/df/top-k pipeline both claim O(index) cost
      run("dup_ngram_rate", k, graft.operators.Dedup.dupNgramRateRaw(docsAt(k)))
      run("tfidf_top", k, graft.operators.TextAnalysis.tfidfTopK(docsAt(k), k = 5))
      // round-4 wave 2: the two quality-gate forms (the exact
      // per-source rank vs the sort-free approx-cutoff scan — the
      // curves SHOW the window's cost growing while the scan stays
      // flat) and the full real-codec perceptual-hash pipeline
      // (encode → decode → aHash → banded pair join)
      run("quality_gate", k, graft.operators.CorpusOps.qualityGate(docsAt(k)))
      run("quality_gate_approx", k,
        graft.operators.CorpusOps.qualityGateApprox(docsAt(k)))
      // round-4 wave 3: containment/overlap reuse jaccard's f²-bounded
      // index join — the curves must match jaccard_pairs' shape (a
      // divergence would mean the source join-back or the band
      // aggregate added a hidden super-linear term)
      run("containment", k, graft.operators.Dedup.containmentPairs(docsAt(k)))
      run("source_overlap", k, graft.operators.Dedup.sourceOverlap(docsAt(k)))
      run("phash_pairs", k, graft.operators.Multimodal.phashPairs(
        graft.operators.Multimodal.imagePHash(spark,
          graft.operators.Multimodal.imageTableWithVariants(spark, docsAt(k))).toDF()))
    }
    spark.stop()
  }
}
