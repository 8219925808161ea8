package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family for the training-data pipeline:
  * exact (fingerprint groupBy), MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale design: every variant is a map-side fingerprint/signature step
  * (pure codegen'd expressions, no shuffle) followed by ONE shuffle keyed on
  * the fingerprint / LSH band — candidate generation never compares all
  * pairs. Only candidate pairs sharing a band are verified. Hash functions
  * are md5-based and deterministic, so results are reproducible and
  * oracle-verifiable in DuckDB SQL.
  */
object Dedup {

  /** Per-doc exact-dup resolution: normalized-token-stream fingerprint,
    * canonical keeper = min id per fingerprint.
    * Output: (id, fp, keep_id, is_dup). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
    val keep = fp.groupBy("fp").agg(min("id").as("keep_id"))
    // fp cardinality ~= doc count; broadcast only if tiny — let AQE decide.
    fp.join(keep, "fp")
      .select(col("id"), col("fp"), col("keep_id"),
        (col("id") =!= col("keep_id")).as("is_dup"))
  }

  /** MinHash signature: numHashes permutations simulated by seeded md5;
    * element i = min over the distinct token set of md5(i || '|' || token).
    * Deterministic and engine-portable (string min over hex digests).
    * Evaluated by the native [[graft.functions.HashExpressions]] expression
    * (one JVM loop per row; same semantics as the composed built-ins). */
  def minhashSignature(text: Column, numHashes: Int): Column =
    graft.functions.HashExpressions.minhashSignature(text, numHashes)

  /** LSH band hashes: bands of `rowsPerBand` signature slots, md5-combined.
    * The band index is folded into the hash input and the digest truncated
    * to a 60-bit long, so the candidate join shuffles one 8-byte key per
    * band instead of (band_idx, 32-char digest). DuckDB twin:
    * `CAST('0x' || substr(md5(j || '|' || ...), 1, 15) AS BIGINT)`. */
  def lshBands(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val bands = numHashes / rowsPerBand
    transform(sequence(lit(0), lit(bands - 1)),
      j => conv(substring(md5(concat_ws("|",
        j.cast("string"), slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)))), 1, 15), 16, 10)
        .cast("long"))
  }

  /** MinHash-LSH near-dup pairs verified by exact Jaccard over distinct
    * token sets. Output: (id1, id2, jaccard) with id1 < id2, jaccard >= threshold.
    *
    * Candidate generation is a self-equi-join on (band_idx, band_hash): a
    * shuffle-hash join keyed on the band hash — no cross product. At 100 TB
    * the band join is the only shuffle and is uniformly keyed unless the
    * corpus has giant near-identical clusters (then salting the verify side
    * applies).
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      /** Skew guard for the candidate self-join. A band bucket with n
        * members emits n(n-1)/2 pairs — one giant near-identical cluster
        * (boilerplate pages, templated docs) turns the join quadratic at
        * exactly the corpus sizes where it hurts. Buckets larger than
        * `hubCap` switch to STAR edges (bucket-min id -> member): O(n)
        * pairs that keep the cluster connected for [[duplicateGroups]],
        * at the cost of not verifying every in-bucket pair directly
        * (members similar to the hub transitively group anyway; a member
        * NOT similar to the hub can lose edges it would have had — the
        * standard recall/safety trade for capped LSH). Default off so the
        * uncapped semantics stay oracle-exact. */
      hubCap: Int = Int.MaxValue): DataFrame = {

    // signatures are the expensive per-row step — make sure they compute
    // across cores even when the corpus is one parquet split (no-op at scale)
    val base = KnnExact.spreadSmall(
      docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
    val withBands = base
      .withColumn("sig", minhashSignature(col("text"), numHashes))
      .select(col("id"), explode(lshBands(col("sig"), numHashes, rowsPerBand)).as("band_hash"))

    val cand =
      if (hubCap == Int.MaxValue) {
        val l = withBands.select(col("band_hash"), col("id").as("id1"))
        val r = withBands.select(col("band_hash"), col("id").as("id2"))
        l.join(r, Seq("band_hash"))
          .filter(col("id1") < col("id2"))
          .select("id1", "id2").distinct()
      } else {
        // bucket sizes: aggregated on the SAME key as the join below, so
        // the exchange is reused (no extra shuffle of the big side)
        val sizes = withBands.groupBy("band_hash")
          .agg(count(lit(1)).as("__n"), min("id").as("__hub"))
        val tagged = withBands.join(sizes, Seq("band_hash"))
        val small = tagged.filter(col("__n") <= hubCap)
        val pairwise = small.select(col("band_hash"), col("id").as("id1"))
          .join(small.select(col("band_hash"), col("id").as("id2")), Seq("band_hash"))
          .filter(col("id1") < col("id2"))
          .select("id1", "id2")
        val star = tagged.filter(col("__n") > hubCap && col("id") =!= col("__hub"))
          .select(col("__hub").as("id1"), col("id").as("id2")) // hub = min id, so id1 < id2
        pairwise.union(star).distinct()
      }

    // verify join carries 60-bit token hashes, not strings (4x less shuffle;
    // portable to the DuckDB oracle via ('0x'||substr(md5(t),1,15))::BIGINT)
    val tokSets = base.select(col("id"),
      graft.functions.HashExpressions.ngramShingles(col("text"), 1).as("toks"))
    cand
      .join(tokSets.select(col("id").as("id1"), col("toks").as("toks1")), "id1")
      .join(tokSets.select(col("id").as("id2"), col("toks").as("toks2")), "id2")
      .withColumn("jaccard",
        graft.functions.VectorExpressions.jaccard(col("toks1"), col("toks2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Portable SimHash: 64-char '0'/'1' string. Bit b is the majority vote
    * over distinct tokens of hash-bit b, where a token's bit b is the high
    * bit of the first nibble of md5(b || '|' || token). Deterministic and
    * expressible identically in DuckDB for the oracle. */
  def simhashBits(text: Column, nBits: Int = 64): Column =
    graft.functions.HashExpressions.simhashBits(text, nBits)

  /** N-gram (shingle) Jaccard similarity between candidate pairs drawn from
    * a blocking key (e.g. same source). Shingles are n-token windows joined
    * by a single space, then hashed to 60-bit md5-derived longs before the
    * pair join — 4x less data through the shuffle and cheaper set compares,
    * still engine-portable (DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT).
    * Output: (id1, id2, jaccard). */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 3,
      threshold: Double = 0.0): DataFrame = {

    def shingles(text: Column): Column =
      graft.functions.HashExpressions.ngramShingles(text, n)

    val base = KnnExact.spreadSmall(docs.select(col(idCol).cast("long").as("id"),
      col(blockCol).as("blk"), col(textCol).as("__text")))
      .select(col("id"), col("blk"), shingles(col("__text")).as("sh"))
    val l = base.select(col("blk"), col("id").as("id1"), col("sh").as("sh1"))
    val r = base.select(col("blk"), col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, "blk")
      .filter(col("id1") < col("id2"))
      .withColumn("jaccard",
        graft.functions.VectorExpressions.jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected components over a near-dup pair list (HashMin label
    * propagation): every node's label converges to the minimum id reachable
    * from it, so `group_id` = canonical representative of the duplicate
    * cluster. This is the step that turns pairwise candidates (minhash /
    * ngram / embedding pairs) into keep/drop decisions — pairs alone can't
    * dedup a transitive cluster {a~b, b~c} correctly.
    *
    * Scale design: per iteration ONE shuffle (edge-label join + min-agg);
    * iteration count = cluster diameter, which for near-dup clusters is
    * small (near-duplicates of a common ancestor are near each other).
    * Labels only ever decrease, so convergence is detected by a cheap
    * scalar checksum (sum of labels strictly decreases until fixpoint) —
    * no extra join. Only EDGE-CONNECTED nodes iterate (per-round state is
    * O(duplicate-cluster members), not O(corpus)); singletons join back in
    * one pass at the end. Lineage is truncated every iteration with an eager
    * localCheckpoint, otherwise the iterated plan grows unboundedly (on a
    * cluster with an HDFS checkpoint dir, `Dataset.checkpoint` is the
    * durable equivalent). For graphs with giant diameters the
    * large-star/small-star variant halves rounds; near-dup workloads don't
    * need it.
    *
    * Output: (id, group_id, group_size, is_canonical) for EVERY id in
    * `nodes` — singletons keep group_id = id, size 1. */
  def duplicateGroups(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      id1Col: String = "id1",
      id2Col: String = "id2",
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val edges = pairs
      .select(col(id1Col).cast("long").as("src"), col(id2Col).cast("long").as("dst"))
      .union(pairs.select(col(id2Col).cast("long").as("src"), col(id1Col).cast("long").as("dst")))
      .localCheckpoint(true)

    // iterate ONLY over edge-connected nodes: after dedup candidate
    // generation the connected set is a tiny fraction of the corpus, and an
    // isolated node's label can never change — keeping the full corpus in
    // the loop would checkpoint + checksum O(corpus) rows EVERY round
    // instead of O(connected). Singletons are folded back in one left join
    // after the fixpoint.
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint(true)
    def sumOf(df: DataFrame): Long = {
      val r = df.agg(sum("label")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty edge set -> no loop work
    }
    var checksum = sumOf(labels)
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIters) {
      // min label among each node's neighbors, folded into its own label
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(true)
      val nextSum = sumOf(next)
      converged = nextSum == checksum
      checksum = nextSum
      labels = next
      it += 1
    }
    val all = ids.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    val w = Window.partitionBy("label")
    all.select(col("id"), col("label").as("group_id"),
        count(lit(1)).over(w).as("group_size"),
        (col("id") === col("label")).as("is_canonical"))
  }

  /** Embedding-cosine near-dup pairs within a blocking key (exact verify
    * path; the ANN module provides the LSH/IVF candidate path at scale).
    * Output: (id1, id2, sim) with sim = (1+cos)/2 >= threshold. */
  def embeddingNearDup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {

    val base = emb.select(col(idCol).cast("long").as("id"), col(blockCol).as("blk"),
      col(vecCol).as("v"))
    val l = base.select(col("blk"), col("id").as("id1"), col("v").as("v1"))
    val r = base.select(col("blk"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, "blk")
      .filter(col("id1") < col("id2"))
      .withColumn("sim", VectorFunctions.cosineSim(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
  }
}
