package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation, in increasing
  * fuzziness: exact (hash groupBy), n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine near-dup (see [[Similarity]] for the
  * embedding path).
  *
  * Scale notes (the whole point of these designs):
  *  - exact dedup is one hash-aggregate shuffle on a 16-byte key, not on
  *    the full text;
  *  - MinHash/LSH candidate generation NEVER does an all-pairs join: docs
  *    shuffle by (band, band_signature) and only same-bucket docs pair,
  *    with a per-bucket cap to bound the quadratic worst case (a
  *    degenerate bucket of 1M docs would otherwise emit 10^12 pairs);
  *  - Jaccard verification runs only on LSH candidates.
  *
  * All hash material is md5-derived so the identical computation is
  * expressible in ANSI SQL for the DuckDB oracle.
  */
object Dedup {

  /** Exact duplicates by normalized fingerprint: one row per duplicate
    * group with its size and the minimum id (the canonical survivor).
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Keep one doc per exact-duplicate group (min id wins). No join back:
    * a single window-free aggregate + semi-join on the 16-byte key.
    */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles as an array column (distinct, sorted — set
    * semantics for Jaccard).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_sort(array_distinct(
      filter(
        transform(toks, (_, i) =>
          when(i <= size(toks) - n,
            concat_ws(" ", slice(toks, i + lit(1), lit(n))))),
        x => x.isNotNull)))
  }

  /** Benchmark-contamination screen: for every corpus document, the
    * number of its n-gram shingles that also appear anywhere in a
    * benchmark/eval set — the standard decontamination pass before
    * training. The benchmark shingle set is tiny relative to the corpus,
    * so it is DISTINCT'd and broadcast: the corpus side is one explode +
    * a broadcast left-semi join + one hash aggregate — the 100 TB scan
    * never shuffles on its own size. n_overlap counts DISTINCT
    * overlapping shingles ([[shingles]] de-duplicates per document).
    *
    * Both sides join on a 64-bit md5 PREFIX of the shingle, not the
    * shingle string: the broadcast shrinks from avg-shingle-length
    * (tens of bytes x n-gram text) to 16 fixed chars per entry, and the
    * probe hashes a short fixed-width key. A prefix collision marks one
    * extra shingle overlapping (never misses one) at ~2^-64 per pair —
    * noise against LSH-grade screening, and the oracle replays the same
    * hash so results stay exact-comparable.
    */
  def contaminationScreen(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleN: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    def h(s: Column): Column = substring(md5(s), 1, 16)
    // distinct AFTER hashing too: two distinct bench shingles colliding
    // to one prefix must not double-match a corpus row
    val benchSh = bench
      .select(explode(shingles(col(textCol), shingleN)).as("s")).distinct()
      .select(h(col("s")).as("sh_h")).distinct()
      .withColumn("_hit", lit(1))
    // ONE pass over the corpus: shingle once, explode_outer (docs with
    // no shingles keep a row), mark hits via a broadcast LEFT join
    // (benchSh is distinct, so each shingle matches at most once), then
    // a single aggregate yields both counts.
    corpus
      .select(col(idCol),
        explode_outer(shingles(col(textCol), shingleN)).as("s"))
      .select(col(idCol), h(col("s")).as("sh_h"))
      .join(broadcast(benchSh), Seq("sh_h"), "left")
      .groupBy(col(idCol))
      .agg(count(col("sh_h")).as("n_shingles"),
        count(col("_hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Exploded (id, shingle) view — the input to MinHash. NOT
    * deduplicated or sorted: `min` is idempotent, so set semantics buy
    * nothing here and the O(T^2) `array_distinct` + O(T log T)
    * `array_sort` per doc are pure overhead (use [[shingles]] where
    * Jaccard's set semantics actually matter).
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val all = filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n, concat_ws(" ", slice(toks, i + lit(1), lit(n))))),
      x => x.isNotNull)
    df.select(col(idCol), explode(all).as("shingle"))
  }

  /** One MinHash value from a shared digest: hex slice `i` (4 chars =
    * 16 bits) of md5(shingle). All `k` hash functions are slices of ONE
    * md5 per shingle — md5's bits are independent, so the slices act as
    * k independent minhash functions at 1/k the hash work (the 8-md5
    * form measured 8x the digest cost for identical LSH behavior).
    * String-min of fixed-width hex == numeric min; md5 keeps the oracle
    * expressible in SQL.
    */
  def minhashCol(shingleArr: Column, i: Int): Column = {
    require(i >= 0 && i < 8,
      s"minhashCol slice index must be 0..7 (one md5 = 8 slices); " +
        s"got $i — use minhashSignatures for more hash functions")
    array_min(transform(shingleArr,
      s => substring(md5(s), 1 + 4 * i, 4)))
  }

  /** MinHash signatures: `numHashes` columns mh0..mh{k-1} per doc,
    * as ONE grouped aggregate over exploded (id, shingle) rows — the
    * shingle set is computed once per doc and all k mins come from a
    * single partial+final hash-agg pass. (The tempting narrow form —
    * k `array_min(transform(sh, ...))` columns over a projected array —
    * re-inlines the whole shingling expression into every hash column
    * after projection collapse: measured 8x slower with k=8.)
    *
    * One md5 per shingle, sliced into 4-hex-char (16-bit) minhash
    * values; the projection materializes the digest ONCE (md5 is
    * non-cheap, so CollapseProject keeps it out of the 8 agg inputs).
    * 16-bit values bias the Jaccard estimate by ~|A∪B|/2^16 — noise at
    * document scale — and band signatures (2 slices = 32 bits) stay
    * collision-safe.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    // one md5 digest per 8 slices: digest g of a shingle is md5(shingle)
    // for g=0 and md5("g|shingle") for g>0 (seed-prefixed, same scheme the
    // oracle can replay); hash i = 4-hex slice i%8 of digest i/8.
    val nDigests = (numHashes + 7) / 8
    val digests = (0 until nDigests).map { g =>
      val d = if (g == 0) md5(col("shingle"))
        else md5(concat(lit(s"$g|"), col("shingle")))
      d.as(s"_h$g")
    }
    val sh = shingleRows(df, idCol, textCol, shingleN)
      .select(col(idCol) +: digests: _*)
    val aggs = (0 until numHashes).map { i =>
      min(substring(col(s"_h${i / 8}"), 1 + 4 * (i % 8), 4)).as(s"mh$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: concat `rowsPerBand` consecutive minhashes into one
    * band signature; docs sharing any (band, signature) are candidates.
    * Returns (band, sig, id).
    */
  def lshBands(sigs: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("", (0 until rowsPerBand)
          .map(r => col(s"mh${b * rowsPerBand + r}")): _*).as("sig"))
    }
    sigs.select(col(idCol), explode(array(bands: _*)).as("bs"))
      .select(col("bs.band"), col("bs.sig"), col(idCol))
  }

  /** Candidate pairs from LSH buckets — the shuffle is BY BUCKET, never
    * all-pairs. `maxBucket` caps pathological buckets (skew defense: a
    * bucket of b docs emits b^2/2 pairs; at 10^12 docs an uncapped hot
    * bucket is the job-killer, so oversized buckets are dropped and
    * reported rather than silently exploding).
    *
    * Shape: ONE grouped pass — ids collected per (band, sig), pairs
    * emitted by array expressions. A self-join formulation would
    * re-derive the whole (expensive) signature subtree for each join
    * input and shuffle it twice more; collect-then-expand touches the
    * signatures once, and the per-bucket cap bounds the collected array
    * at `maxBucket` ids.
    */
  /** Buckets DROPPED by the `maxBucket` skew cap — the "no silent caps"
    * companion to [[lshCandidatePairs]]: a curation job reports these
    * (band, sig, n) rows so a pathological bucket (e.g. a boilerplate
    * shingle shared by 10^6 docs) is visible, not silently skipped.
    * Members of an oversized bucket are usually exact/near-exact dups of
    * a template — route them to [[exactDupGroups]] instead.
    */
  def lshOversizedBuckets(bands: DataFrame, idCol: String,
      maxBucket: Int = 1000): DataFrame =
    bands.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("example_id"))
      .filter(col("n") > maxBucket)

  def lshCandidatePairs(bands: DataFrame, idCol: String,
      maxBucket: Int = 1000): DataFrame = {
    val buckets = bands.groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    // all ascending (a, b) pairs of the sorted id array
    val pairs = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2),
        greatest(size(col("ids")) - i - 1, lit(0))),
        b => struct(a.as("id_a"), b.as("id_b")))))
    buckets
      .select(explode(pairs).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Connected components over near-dup PAIRS, with survivor selection —
    * the transitive-closure step production corpus dedup runs on
    * LSH/SimHash pair output (A~B and B~C collapse to one cluster even
    * when A!~C, and exactly one member survives).
    *
    * Bounded-iteration min-label propagation, entirely shuffle-side (no
    * driver union-find, no collect): label(x) starts as x; each
    * iteration replaces it with min(label(x), min over neighbors'
    * labels); fixpoint when no label changes. Labels only DECREASE, so
    * an early stop at `maxIters` over-segments but never over-merges —
    * and is reported loudly (no silent caps). Iterations needed ~ the
    * component diameter: near-dup clusters are template families, which
    * are star-shaped/shallow in practice; 20 covers any plausible
    * corpus (a diameter-20 chain of pairwise near-dups is adversarial).
    *
    * Per-iteration cost: one equi-join edges->labels + one hash-agg +
    * one change-count — every operator shuffles on the id key, nothing
    * quadratic. Each iteration's labels are localCheckpoint'ed (eager),
    * which TRUNCATES the logical plan: without it the plan tree doubles
    * per iteration and the driver OOMs just PRINTING it around
    * iteration 7 (measured). At cluster scale, `checkpoint` to reliable
    * storage every few iterations is the executor-loss-safe variant of
    * the same truncation.
    *
    * Returns (id, cluster_id = min id in component, keep = survivor),
    * for ids that appear in at least one pair (singletons are not the
    * pair graph's business).
    */
  def resolveClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame =
    resolveClustersIter(pairs, maxIters)._1

  /** One min-label propagation step over (edges, labels): neighbor-min
    * via an EQUI-join + hash-agg, folded back with a left join. Emits
    * (id, label, _next). Factored out so the physical-plan shape is
    * pinnable un-checkpointed (PlanSpec) — [[resolveClustersIter]]
    * applies exactly this, truncated per iteration.
    */
  private[graft] def propagationStep(edges: DataFrame,
      labels: DataFrame): DataFrame = {
    val nbrMin = edges
      .join(labels.select(col("id").as("dst"), col("label").as("_nl")),
        Seq("dst"))
      .groupBy(col("src").as("id"))
      .agg(min(col("_nl")).as("_nmin"))
    labels.join(nbrMin, Seq("id"), "left")
      .select(col("id"), col("label"),
        least(col("label"), coalesce(col("_nmin"), col("label")))
          .as("_next"))
  }

  /** The checkpointed RDD backing an eager localCheckpoint'ed frame —
    * its plan is a single LogicalRDD leaf. Used to free superseded
    * iterations' blocks promptly instead of waiting for driver GC.
    */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** As [[resolveClusters]], also returning (iterations run, converged)
    * so callers (and tests) can observe the bound firing.
    */
  def resolveClustersIter(pairs: DataFrame,
      maxIters: Int = 20): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, "need at least one propagation iteration")
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    // blocks of superseded iterations are unpersisted as soon as the
    // next checkpoint is materialized — at most TWO label snapshots
    // live at any moment, not O(iterations)
    var prevCk = checkpointRdd(labels)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // eager localCheckpoint: materializes AND truncates the plan, so
      // the next iteration builds on a leaf, not on this one's tree
      val joined = propagationStep(edges, labels).localCheckpoint(true)
      val changed = joined.filter(col("_next") < col("label")).count()
      labels = joined.select(col("id"), col("_next").as("label"))
      prevCk.foreach(_.unpersist(blocking = false))
      prevCk = checkpointRdd(joined)
      converged = changed == 0L
      iters += 1
    }
    if (!converged)
      System.err.println(s"[resolveClusters] NOT converged after $iters " +
        s"iterations (component diameter exceeds maxIters=$maxIters); " +
        "labels are an over-segmentation, never an over-merge")
    edges.unpersist()
    (labels.select(col("id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("keep")), iters, converged)
  }

  /** Verified n-gram Jaccard for a set of candidate pairs: emits
    * (id_a, id_b, inter, union_) as exact integers (ratios are for the
    * caller — integer outputs hash-compare exactly against any oracle).
    */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame = {
    val withSh = df.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    pairs
      .join(withSh.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(withSh.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("union_"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle -> minhash -> band ->
    * bucket-join -> Jaccard-verify -> threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    val pairs = lshCandidatePairs(
      lshBands(sigs, idCol, numHashes, rowsPerBand), idCol, maxBucket)
    jaccardForPairs(df, pairs, idCol, textCol, shingleN)
      .filter(col("inter") >= col("union_") * jaccardThreshold)
  }

  /** Incremental cross-cycle dedup: drop rows whose normalized
    * fingerprint already appears in `seenFps` (a single-column `fp`
    * DataFrame — e.g. fingerprints of previously-published batches).
    * One left_anti hash join on the 16-byte key; at scale the seen-set
    * is a bucketed table on `fp` so the join co-partitions. This is the
    * lineage-integrated dedup a multi-cycle ingest needs: cycle N must
    * not re-emit documents cycle N-1 already published.
    */
  def dropSeen(df: DataFrame, seenFps: DataFrame, textCol: String): DataFrame =
    df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .join(seenFps.select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
      .drop("_fp")

  /** 16-bit SimHash from the md5 hex digits of each token: bit i of the
    * fingerprint is the majority vote of (hex digit i of md5(token)) & 1
    * over the doc's distinct tokens. Hamming-close simhashes => textual
    * near-dups. Chosen encoding is ANSI-SQL-expressible (position-in-
    * alphabet hex decode) so the oracle can replay it exactly.
    */
  def simhash16(text: Column): Column = {
    val toks = array_distinct(split(trim(lower(text)), "\\s+"))
    val hexAlphabet = "0123456789abcdef"
    val bitCols = (0 until 16).map { i =>
      // +1/-1 votes for bit i over tokens, via hex digit parity
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc +
          when((instr(lit(hexAlphabet),
            substring(md5(t), i + 1, 1)) - 1) % 2 === 1, lit(1))
            .otherwise(lit(-1)))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (bit-count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: group by simhash value (distance-0
    * buckets); Hamming-radius pairs are [[simhashNearDupPairs]].
    */
  def simhashDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhash16(col(textCol)).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** SimHash near-dup PAIRS within Hamming distance `maxHamming`, via
    * band bucketing over the native wide hash
    * ([[graft.functions.SimHashBits]]): the nBits hash splits into
    * `nBands` contiguous slices; by pigeonhole, any pair with hamming <=
    * nBands-1 shares at least one intact band, so candidates form ONLY
    * inside (band, slice) buckets — the same no-all-pairs discipline as
    * MinHash-LSH, with the same `maxBucket` skew cap — and are verified
    * by exact `bit_count(xor)`. Default 48 bits / 4 bands = 12-bit band
    * space (4096 buckets per band), detecting hamming <= 3 exactly.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      nBits: Int = 48, nBands: Int = 4, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(nBits % nBands == 0, "bands must tile the hash")
    require(maxHamming <= nBands - 1,
      s"banding guarantees detection only for hamming <= ${nBands - 1}")
    val w = nBits / nBands
    val hs = df.select(col(idCol).as("id"),
      graft.functions.SimHashBits.simhashBits(col(textCol), nBits).as("sh"))
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * w).bitwiseAND(lit((1L << w) - 1)).as("sig"))
    }
    val bands = hs
      .select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("bs.band"), col("bs.sig").cast("string").as("sig"),
        col("id"))
    // candidate pairs via the SHARED bucket expansion (scalar id arrays,
    // capped — one place owns the pairing + skew-cap semantics), then
    // join the hashes back for the exact verify
    val pairs = lshCandidatePairs(bands, "id", maxBucket)
    pairs
      .join(hs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
