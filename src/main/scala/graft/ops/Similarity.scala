package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the standard ANN playbook:
  *  - [[cosineTopK]] — brute-force exact top-k: one narrow map computing
  *    the score (the query vector is a broadcast literal, folded into
  *    codegen) + a tree-reduced top-k. This is the baseline and the
  *    verifier for the approximate path.
  *  - [[lshTopK]] — sign-random-projection LSH: each vector hashes to a
  *    bucket by the sign pattern of `nPlanes` deterministic hyperplanes;
  *    search only scans the query's bucket (and optionally its Hamming-1
  *    neighbors). At 100 TB this turns a full-corpus scan into a
  *    partition-pruned scan when the table is written bucketed by
  *    `lsh_bucket`.
  *
  * Dot products accumulate in float64 in deterministic element order
  * (`aggregate` over `zip_with` is a sequential fold), so results are
  * reproducible across partitionings and match an oracle that also
  * folds in order.
  */
object Similarity {

  /** Sequential-fold dot product of an array column with a literal
    * query vector, in float64.
    */
  def dotWithLiteral(vec: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    aggregate(zip_with(vec, q, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)
  }

  /** L2 norm of an array column, float64. */
  def norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineWithLiteral(vec: Column, query: Seq[Double]): Column = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    dotWithLiteral(vec, query) / (norm(vec) * lit(qNorm))
  }

  /** Exact brute-force cosine top-k against a literal query vector.
    * `orderBy(desc, id)` + limit(k) is planned as TakeOrderedAndProject —
    * a per-partition heap + driver merge, NOT a global sort shuffle.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
        cosineWithLiteral(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component: a fixed function
    * of (plane, dim) with ~uniform values in [-7.5, 7.5] derived from an
    * md5 hex digit — shared-nothing reproducibility (any engine,
    * including a SQL oracle, can regenerate the planes exactly).
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$plane|dim$dim".getBytes("UTF-8"))
    ((h(0) & 0xff) % 16) - 7.5
  }

  /** Sign-random-projection bucket id from `nPlanes` hyperplanes: bit p
    * = sign(v . plane_p). Buckets are stable across runs and engines.
    */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = (0 until dims).map(d => planeComponent(p, d))
      when(dotWithLiteral(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: score only vectors in the query's LSH bucket.
    * `probeHamming1` widens recall by also probing the nPlanes buckets
    * at Hamming distance 1 (multi-probe LSH).
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nPlanes: Int = 8,
      probeHamming1: Boolean = true): DataFrame = {
    val dims = query.length
    val qBucket = {
      var b = 0L
      for (p <- 0 until nPlanes) {
        val plane = (0 until dims).map(d => planeComponent(p, d))
        val dot = query.zip(plane).map { case (x, y) => x * y }.sum
        if (dot >= 0) b |= (1L << p)
      }
      b
    }
    val probes: Seq[Long] =
      if (probeHamming1) qBucket +: (0 until nPlanes).map(p => qBucket ^ (1L << p))
      else Seq(qBucket)
    df.withColumn("lsh_bucket", lshBucket(col(vecCol), dims, nPlanes))
      .filter(col("lsh_bucket").isin(probes: _*))
      .select(col(idCol),
        cosineWithLiteral(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN index — the second scale path besides LSH.
    *
    * Centroids are deterministic: the embeddings of the `k` smallest
    * ids (reproducible in any engine, incl. the SQL oracle). Assignment
    * is a narrow map — the k centroids are literal vectors folded into
    * codegen, argmin by cosine. At 100 TB the corpus is written
    * partitioned by `ivf_cluster`, so a query scans only its `nprobe`
    * nearest clusters' partitions (partition pruning on a literal IN).
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Long, Seq[Double])] =
    df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))

  /** Deterministic kmeans++-style seeding (greedy D²/farthest-point):
    * seed 1 is the hash-random pick (min md5 of the id — uniform over
    * the corpus yet reproducible in any engine, unlike the id-ordered
    * [[ivfCentroids]] whose first k ids may all share one region);
    * each further seed is the point MAXIMIZING the rounded cosine
    * distance to its nearest chosen seed (ties to the smallest id).
    * Rounding to `roundDigits` before the argmax makes the selection
    * engine-exact (the e06 cross-engine discipline), so a SQL oracle
    * replays the seeds bit-for-bit.
    *
    * Cost: k-1 passes, each a narrow codegen'd map (the chosen seeds
    * are literal vectors) + a top-1 TakeOrdered — no shuffle wider
    * than one row per partition; only k x d doubles reach the driver.
    * At 100 TB, run it on a deterministic hash-gated sample (the d17
    * operator) — D² seeding on a 10^-4 sample is the standard trade.
    */
  def kmeansPlusPlusSeeds(df: DataFrame, idCol: String, vecCol: String,
      k: Int, roundDigits: Int = 6): Seq[(Long, Seq[Double])] = {
    require(k >= 1, "need at least one seed")
    def seedOf(r: org.apache.spark.sql.Row): (Long, Seq[Double]) =
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))
    // zero-norm vectors (padding / failed-encode rows) have no cosine
    // geometry: their distance to ANY seed is 0/0 = NaN, which Spark
    // sorts ABOVE every real distance — an un-filtered zero vector
    // would hijack the argmax deterministically (and diverge from a
    // SQL oracle, whose zero-division semantics differ). They are
    // excluded from seed CANDIDACY only; assignment of such rows is
    // the caller's policy.
    val cand = df.filter(norm(col(vecCol)) > 0)
    val firstRows = cand
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .select(col(idCol).cast("long"), col(vecCol))
      .limit(1).collect()
    if (firstRows.isEmpty) return Seq.empty // no seedable vectors
    var seeds = Vector(seedOf(firstRows.head))
    while (seeds.size < k) {
      val dmin = seeds.map { case (_, sv) =>
        round(lit(1.0) - cosineWithLiteral(col(vecCol), sv), roundDigits)
      }.reduce(least(_, _))
      val next = cand
        .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"),
          dmin.as("_d"))
        .filter(!col("_id").isin(seeds.map(_._1): _*))
        .orderBy(col("_d").desc, col("_id"))
        .limit(1).collect()
      // corpus exhausted before k: every seedable point IS a seed —
      // return what exists rather than crash (callers seeding from a
      // small filtered sample hit this legitimately)
      if (next.isEmpty) return seeds
      seeds = seeds :+ seedOf(next.head)
    }
    seeds
  }

  /** The ONE definition of the (score, cid) candidate structs behind
    * every assignment surface — a single body so the rounding and
    * tie-break discipline cannot drift between [[ivfAssignExpr]] (the
    * cluster-only form) and [[ivfAssignScored]] (cluster + score).
    */
  private def scoredStructs(vec: Column,
      centroids: Seq[(Long, Seq[Double])], roundDigits: Int): Seq[Column] =
    centroids.map { case (cid, cvec) =>
      val raw = cosineWithLiteral(vec, cvec)
      val s = if (roundDigits >= 0) round(raw, roundDigits) else raw
      struct(s.as("s"), lit(cid).as("cid"))
    }

  /** Argmax-cosine cluster id over literal centroids.
    *
    * `roundDigits >= 0` rounds each cosine BEFORE the argmax (the
    * [[kmeansPlusPlusSeeds]] discipline): a vector whose two nearest
    * centroids differ only in the last ulps of the float64 fold would
    * otherwise rank differently in an engine summing the dot product
    * in a different order — with rounding, such near-ties collapse to
    * EQUAL scores and break deterministically to the largest cid in
    * every engine (OpsSpec pins this on a constructed near-tie
    * fixture). EVERY oracle-replayed chain passes 6 (e04-e06,
    * e08-e10 and [[kmeans]] internally); the unrounded default (-1)
    * is for single-engine callers that want exact scores.
    */
  def ivfAssignExpr(vec: Column, centroids: Seq[(Long, Seq[Double])],
      roundDigits: Int = -1): Column =
    // array_max picks the lexicographically-largest (score, cid) struct:
    // highest cosine wins; ties break to the LARGEST cid — mirror that
    // exactly in any oracle.
    array_max(array(scoredStructs(vec, centroids, roundDigits): _*))
      .getField("cid")

  def ivfAssign(df: DataFrame, vecCol: String,
      centroids: Seq[(Long, Seq[Double])],
      roundDigits: Int = -1): DataFrame =
    df.withColumn("ivf_cluster",
      ivfAssignExpr(col(vecCol), centroids, roundDigits))

  /** As [[ivfAssign]], also emitting the winning cosine as
    * `ivf_cosine` — ONE argmax struct evaluated once, both fields
    * projected from it. With `roundDigits >= 0` the score is the
    * rounded value, so downstream order-independent aggregates over it
    * (count, min, max) are engine-exact for oracles.
    */
  def ivfAssignScored(df: DataFrame, vecCol: String,
      centroids: Seq[(Long, Seq[Double])],
      roundDigits: Int = -1): DataFrame = {
    // collision-free temp name: an input already carrying `_best` must
    // survive untouched rather than be silently shadowed and dropped
    val tmp = Iterator.from(0)
      .map(i => if (i == 0) "_best" else s"_best$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(tmp,
      array_max(array(
        scoredStructs(col(vecCol), centroids, roundDigits): _*)))
      .withColumn("ivf_cluster", col(tmp).getField("cid"))
      .withColumn("ivf_cosine", col(tmp).getField("s"))
      .drop(tmp)
  }

  /** One incremental IVF maintenance step — the ANN family's analog of
    * the dedup family's incremental story ([[Dedup.incrementalLshPairs]]
    * / mergeClusters): a NEW ingest batch is assigned against the
    * FROZEN centroid set (a narrow codegen'd map over the batch only —
    * the indexed corpus is never rescanned), and a drift check decides
    * whether the frozen index still fits. Drift = fraction of new
    * vectors whose best cosine falls below `minCosine`; past
    * `maxDriftFraction` the index is RE-SEEDED with
    * [[kmeansPlusPlusSeeds]] over a deterministic hash-gated sample
    * (the d17 operator's gate) of corpus + batch, and the batch is
    * re-assigned against the new seeds. Existing corpus labels are the
    * caller's to refresh lazily (clusters only change on re-seed).
    */
  case class IvfUpdate(assigned: DataFrame,
      centroids: Seq[(Long, Seq[Double])], reseeded: Boolean,
      driftFraction: Double)

  def incrementalIvf(corpus: DataFrame, fresh: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[(Long, Seq[Double])], k: Int,
      minCosine: Double = 0.7, maxDriftFraction: Double = 0.5,
      sampleRate16: Int = 16, roundDigits: Int = 6): IvfUpdate = {
    val scored = ivfAssignScored(fresh, vecCol, centroids, roundDigits)
    // one aggregate: batch size + count below the drift floor — only
    // two longs reach the driver
    val row = scored.agg(
      count(lit(1)).as("n"),
      count(when(col("ivf_cosine") < minCosine, lit(1))).as("low")).head()
    val (n, low) = (row.getLong(0), row.getLong(1))
    val frac = if (n == 0) 0.0 else low.toDouble / n
    if (frac > maxDriftFraction) {
      val sample = corpus.select(col(idCol), col(vecCol))
        .unionByName(fresh.select(col(idCol), col(vecCol)))
        .filter(TextAnalysis.hashSampleFlag(col(idCol), "ivf-reseed",
          lit(sampleRate16)))
      val seeds = kmeansPlusPlusSeeds(sample, idCol, vecCol, k)
      IvfUpdate(ivfAssignScored(fresh, vecCol, seeds, roundDigits),
        seeds, reseeded = true, frac)
    } else IvfUpdate(scored, centroids, reseeded = false, frac)
  }

  /** One Lloyd refinement iteration, DataFrame-native: explode vector
    * components, average per (cluster, dim) — a single hash aggregate —
    * and collect the k x d means to the driver (tiny). Returns refined
    * centroids keyed by the assignment's cluster ids (clusters that lost
    * every member drop out, exactly like a SQL GROUP BY replay).
    *
    * `roundDigits >= 0` rounds each mean IN THE QUERY (Spark `round`,
    * HALF_UP) — multi-iteration runs round between iterations so the
    * reassignment inputs are engine-exact against a SQL oracle that
    * rounds the same way (the e06-proven equivalence point).
    */
  def kmeansIteration(assigned: DataFrame, vecCol: String,
      dims: Int, roundDigits: Int = -1): Seq[(Long, Seq[Double])] = {
    val mean =
      if (roundDigits >= 0) round(avg(col("v")), roundDigits)
      else avg(col("v"))
    assigned
      .select(col("ivf_cluster"), posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy(col("ivf_cluster"), col("d"))
      .agg(mean.as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .map { case (cid, rows) =>
        val arr = new Array[Double](dims)
        rows.foreach { case (_, d, m) => arr(d) = m }
        (cid, arr.toSeq)
      }
  }

  /** Iterated Lloyd/k-means: `iters` rounds of (assign -> means), each a
    * narrow codegen'd assignment map plus ONE hash aggregate; only the
    * k x d centroid matrix ever reaches the driver. `roundDigits`
    * applies at BOTH engine-sensitive points: centroid means are
    * rounded between iterations (an unrounded float64 mean depends on
    * partition-level summation order) AND the assignment argmax rounds
    * before comparing (the near-tie discipline) — so every iteration's
    * inputs and every cluster membership are reproducible across
    * engines (the cross-engine fixpoint e06/e08 verify). Returns the
    * final centroids.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, dims: Int, roundDigits: Int = 6): Seq[(Long, Seq[Double])] = {
    var cents = ivfCentroids(df, idCol, vecCol, k)
    for (_ <- 1 to iters)
      cents = kmeansIteration(
        ivfAssign(df, vecCol, cents, roundDigits), vecCol, dims,
        roundDigits)
    cents
  }

  /** IVF search: score only vectors whose cluster is among the query's
    * `nprobe` nearest centroids. The cluster filter is a literal IN —
    * partition-prunable when the corpus is stored bucketed by cluster.
    */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Double])], query: Seq[Double], k: Int,
      nprobe: Int): DataFrame = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val probes = centroids.map { case (cid, cvec) => (cos(query, cvec), cid) }
      .sortBy(-_._1).take(nprobe).map(_._2)
    assigned
      .filter(col("ivf_cluster").isin(probes: _*))
      .select(col(idCol),
        cosineWithLiteral(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are only
    * formed within a bucket (same no-all-pairs discipline as
    * [[Dedup.lshCandidatePairs]]), then verified by exact cosine.
    * At scale, write the corpus bucketed by `lsh_bucket` so this is a
    * co-partitioned self-join with no shuffle.
    */
  /** `scoreRound >= 0` rounds the cosine to that many digits BEFORE the
    * threshold compare (and in the output) — engine-independent
    * borderline behavior for oracle cross-checks.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, threshold: Double, nPlanes: Int = 8,
      maxBucket: Int = 10000, scoreRound: Int = -1): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("_b", lshBucket(col("_v"), dims, nPlanes))
    val sizes = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
    val eligible = bucketed.join(sizes.select("_b"), Seq("_b"), "left_semi")
    val pairs = eligible.as("a").join(eligible.as("b"),
      col("a._b") === col("b._b") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
    val dot = aggregate(
      zip_with(col("a._v"), col("b._v"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val raw = dot / (norm(col("a._v")) * norm(col("b._v")))
    val score = if (scoreRound >= 0) round(raw, scoreRound) else raw
    pairs
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        score.as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
