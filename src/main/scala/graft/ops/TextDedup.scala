package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large text corpora: exact, MinHash+LSH,
 * SimHash and n-gram Jaccard. Signature hashing goes through md5 ->
 * 60-bit int so the same arithmetic is expressible in the DuckDB
 * oracle; the gram-shingle operators take a `hash` mode that defaults
 * to the cheaper codegen'd xxhash64 for production use, with "md5"
 * pinned by the oracle-gated catalog — same plan shape either way.
 *
 * Scale notes: every operator is a hash-partitioned aggregation or an
 * equi-join on a derived key — no driver-side state. The LSH pair
 * join is the scale path for near-dup detection: candidate pairs come
 * from an equi-join on (band, band-signature), never a cross join.
 */
object TextDedup {

  /** 2^31 - 1, the classic MinHash modulus prime. */
  val P: Long = 2147483647L

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit token hash via md5 (DuckDB-reproducible), reduced mod P. */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long") % P

  /** SQL text of the same token hash. */
  def tokenHashSql(t: String): String =
    s"(CAST(('0x' || substr(md5($t), 1, 15)) AS BIGINT) % $P)"

  /** Deterministic MinHash permutation constants (a_i odd, b_i). */
  def perm(i: Int): (Long, Long) =
    (((2L * i + 1) * 2654435761L) % P, ((i + 1) * 40503L) % P)

  /**
   * MinHash signatures: `doc_id, mh0 .. mh{k-1}` where
   * `mh_i = min over tokens of (a_i * h + b_i) % P`.
   * One explode + one hash aggregation; the k permutations are k
   * aggregate expressions over the same shuffled rows (not k passes).
   */
  def minhashSignatures(docs: DataFrame, k: Int = 16,
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    val perTok = docs.select(col(id),
      explode(array_distinct(tokens(col(text)))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val aggs = (0 until k).map { i =>
      val (a, b) = perm(i)
      min((col("h") * a + b) % P).as(s"mh$i")
    }
    perTok.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * LSH candidate pairs: two docs are candidates iff they agree on at
   * least one band of `rowsPerBand` consecutive signature components.
   * Implemented as explode(bands) -> self-equi-join on the band key —
   * the candidate set is found by hash partitioning, so cost scales
   * with bucket sizes, not with the number of document pairs.
   *
   * The full signature struct rides through the band explode, so
   * n_match is computed inside the band join itself (no signature
   * re-joins) and the multi-band duplicates collapse in one
   * aggregation. `maxBucket` guards the quadratic escape hatch: a
   * band bucket larger than the cap (a cluster of near-identical
   * docs) is dropped from candidate generation — the analog of the
   * reference's per-grid-cell candidate-test cap
   * (`/root/reference/src/uk/me/parabola/splitter/AreaGrid.java:60`
   * MAX_TESTS). Use `oversizedBandBuckets` to audit what a given cap
   * would drop. Returns (id_a, id_b, n_matching_components of k).
   */
  def lshCandidatePairs(sigs: DataFrame, k: Int = 16, rowsPerBand: Int = 2,
                        id: String = "doc_id",
                        maxBucket: Int = 100000): DataFrame = {
    // the banded frame feeds the bucket-size guard AND both self-join
    // sides; a lazy local checkpoint materializes the upstream
    // tokenize+minhash aggregation ONCE instead of three times (the
    // signatures are tiny next to the text they summarize: k longs
    // per doc vs the document body)
    val banded = bandedSignatures(sigs, k, rowsPerBand, id)
      .localCheckpoint(false)
    // the bucket-size aggregation hash-partitions on the same (band,
    // key) as the candidate join below, so AQE reuses the exchange
    val pruned =
      if (maxBucket == Int.MaxValue) banded
      else banded.join(
        banded.groupBy("band", "key").agg(count(lit(1)).as("bucket_n"))
          .where(col("bucket_n") <= maxBucket)
          .select(col("band"), col("key")),
        Seq("band", "key"))
    val a = pruned.select(col(id).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("key"))
    val b = pruned.select(col(id).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("key"))
    val matchCount = (0 until k).map(i =>
      when(col(s"sig_a.mh$i") === col(s"sig_b.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), matchCount.cast("long").as("n_match"))
      // a pair found in several bands has the same n_match everywhere;
      // max() collapses the duplicates in one hash aggregation
      .groupBy("id_a", "id_b").agg(max(col("n_match")).as("n_match"))
  }

  /** (id, sig, band, key) rows: one per (doc, band), carrying the full
    * signature struct so downstream joins need no signature lookup. */
  private def bandedSignatures(sigs: DataFrame, k: Int, rowsPerBand: Int,
                               id: String): DataFrame = {
    val nBands = k / rowsPerBand
    val sigStruct = struct((0 until k).map(i => col(s"mh$i")): _*).as("sig")
    val bands = explode(array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until rowsPerBand).map(r =>
          col(s"mh${b * rowsPerBand + r}").as(s"k$r")): _*).as("key"))
    }: _*)).as("bk")
    sigs.select(col(id), sigStruct, bands)
      .select(col(id), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Audit helper: band buckets a given cap would drop, with sizes —
    * run eagerly and log before a production dedup pass. */
  def oversizedBandBuckets(sigs: DataFrame, k: Int = 16, rowsPerBand: Int = 2,
                           id: String = "doc_id", maxBucket: Int = 100000): DataFrame =
    bandedSignatures(sigs, k, rowsPerBand, id)
      .groupBy("band", "key").agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucket)

  /**
   * 62-bit SimHash: for each bit b, sum +1/-1 over token hashes'
   * bit b; the fingerprint sets bit b iff the sum is positive.
   * (62 bits, not 64, so the packed value stays in a signed 64-bit
   * range in every SQL engine.) One explode + one aggregation with
   * 62 sum expressions — map-side combined, skew-free.
   */
  def simhash(docs: DataFrame, bits: Int = 62,
              id: String = "doc_id", text: String = "text"): DataFrame = {
    val perTok = docs.select(col(id),
      explode(array_distinct(tokens(col(text)))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val sums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b) % 2 === 1, 1).otherwise(-1)).as(s"s$b"))
    val agg = perTok.groupBy(col(id)).agg(sums.head, sums.tail: _*)
    val packed = (0 until bits).map(b =>
      when(col(s"s$b") > 0, lit(1L) * (1L << b)).otherwise(0L))
      .reduce(_ + _)
    agg.select(col(id), packed.as("simhash"))
  }

  /** Hamming distance between two SimHash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Disjoint covering bit-bands (offset, length) for Hamming-LSH
    * blocking: `nBands` bands over `bits` bits, remainder spread over
    * the first bands. With maxHamming < nBands, the pigeonhole
    * principle guarantees two fingerprints within maxHamming agree on
    * at least one full band. */
  def hammingBands(bits: Int, nBands: Int): Seq[(Int, Int)] = {
    val base = bits / nBands
    val rem = bits % nBands
    val lens = (0 until nBands).map(b => base + (if (b < rem) 1 else 0))
    lens.scanLeft(0)(_ + _).zip(lens)
  }

  /**
   * SimHash near-duplicate pairs by Hamming-band blocking: candidates
   * are pairs agreeing on at least one of `nBands` disjoint bit-bands
   * of the fingerprint (equi-join on (band, value) after a band
   * explode — exact recall for hamming <= nBands - 1 by pigeonhole),
   * verified with the exact popcount distance. Same scale shape as
   * the MinHash band join: cost follows band-bucket sizes, never the
   * number of pairs. Returns (id_a, id_b, hamming).
   */
  def simhashNearDupPairs(sigs: DataFrame, bits: Int = 62, nBands: Int = 4,
                          maxHamming: Int = 3,
                          id: String = "doc_id"): DataFrame = {
    require(maxHamming < nBands, "blocking is exact only for maxHamming < nBands")
    val bands = explode(array(hammingBands(bits, nBands).zipWithIndex.map {
      case ((off, len), b) =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), off)
            .bitwiseAND(lit((1L << len) - 1)).as("value"))
    }: _*)).as("bk")
    val banded = sigs.select(col(id), col("simhash"), bands)
      .select(col(id), col("simhash"),
        col("bk.band").as("band"), col("bk.value").as("value"))
      .localCheckpoint(false) // feeds both self-join sides
    val a = banded.select(col(id).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("value"))
    val b = banded.select(col(id).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("value"))
    a.join(b, Seq("band", "value"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(max(col("hamming")).as("hamming"))
  }

  /**
   * Connected components over an undirected pair list (id_a, id_b) by
   * iterative min-label propagation with pointer jumping:
   * label(v) <- min(label(v), min over neighbors label(n),
   * label(label(v))) until fixpoint. Returns (id, component_id) for
   * every id that appears in a pair, where component_id is the
   * smallest id in the component — so a chain A-B-C canonicalizes
   * every member to A (idempotent keepers, unlike a 1-hop min-partner
   * rule). Each round is two equi-joins + one aggregation over
   * checkpointed inputs (flat lineage); the label-of-label hop doubles
   * the propagation distance per round, so rounds are
   * O(log longest-path) instead of O(longest-path).
   */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = pairs
      .select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nbr")))
      .localCheckpoint(true)
    var labels = sym.select(col("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var changed = true
    var round = 0
    while (changed && round < maxRounds) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy("id").agg(min(col("label")).as("nbr_label"))
      val base = labels.withColumnRenamed("label", "old_label")
        .join(nbrMin, Seq("id"), "left")
      // pointer jump: label(label(v)) — label values are node ids of
      // the same component, so they always resolve in `labels`. On
      // round 0 every label == its id, so the jump is the identity —
      // skipping it saves two full shuffles of the label table
      val next = (if (round == 0) {
        base.select(col("id"),
          least(col("old_label"),
            coalesce(col("nbr_label"), col("old_label"))).as("label"),
          col("old_label"))
      } else {
        val viaLabel = labels
          .join(labels.toDF("label", "label2"), Seq("label"))
          .select(col("id"), col("label2"))
        base.join(viaLabel, Seq("id"), "left")
          .select(col("id"),
            least(col("old_label"),
              coalesce(col("nbr_label"), col("old_label")),
              coalesce(col("label2"), col("old_label"))).as("label"),
            col("old_label"))
      }).localCheckpoint(true)
      // the convergence probe runs over the already-checkpointed
      // partitions — no recomputation, no shuffle
      changed = !next.where(col("label") =!= col("old_label")).isEmpty
      labels = next.select(col("id"), col("label"))
      round += 1
    }
    labels
  }

  /**
   * Connected components via alternating large-star / small-star
   * contraction (Kiveris et al., "Connected Components in MapReduce
   * and Beyond", SoCC'14) — the shuffle-lean formulation for
   * web-scale graphs. Each round shuffles only the (monotonically
   * star-ifying) EDGE list:
   *
   *  - large-star: every node links its LARGER neighbors to the
   *    minimum of its closed neighborhood;
   *  - small-star: every node links its smaller-or-equal neighbors
   *    (and itself) to the minimum among them.
   *
   * Alternating the two preserves connectivity and converges to star
   * graphs (every node linked directly to its component minimum) in
   * O(log n) rounds. Compared to [[connectedComponents]]' pointer
   * jumping — which shuffles the full label table twice per round
   * (neighbor-min join + label-of-label join) — each round here is
   * two aggregations and two joins over the edge list alone, which
   * SHRINKS toward one edge per non-root node; at 10^12-doc scale
   * that halves per-round shuffle volume. Output contract identical
   * to [[connectedComponents]]: (id, label) for every id appearing
   * in a pair, label = smallest id in the component (spec-proven
   * equal on randomized graphs).
   */
  def connectedComponentsStars(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var round = 0
    // the frames are checkpointed, so count() scans materialized
    // partitions — still, the previous round's count is carried over
    // instead of recounting `edges` every round
    var edgeCount = edges.count()
    while (!converged && round < maxRounds) {
      // large-star over the symmetric neighbor view
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val minAll = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val afterLarge = sym.join(minAll, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // small-star over the directed (to-smaller) view; only the
      // round result is checkpointed — lineage inside a round is two
      // joins deep, no need to materialize the midpoint
      val minSmaller = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val next = afterLarge.join(minSmaller, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(minSmaller.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      // set equality = equal cardinality AND next ⊆ edges; the
      // anti-join only runs once the counts agree (late rounds)
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
      round += 1
    }
    val labels = edges.select(col("u").as("id"), col("v").as("label"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("label")))
      .distinct()
    // ids whose only pairs were self-pairs are filtered out of the
    // edge list up front but are still "appearing in a pair": emit
    // them as their own singleton component, exactly like
    // [[connectedComponents]] does (empty for id_a < id_b inputs)
    val selfOnly = pairs.where(col("id_a") === col("id_b"))
      .select(col("id_a").as("id")).distinct()
      .join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    labels.unionByName(selfOnly)
  }

  /** Distinct character n-gram shingles: (id, gram). */
  def charShingles(docs: DataFrame, n: Int = 3,
                   id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), col(text),
        explode(sequence(lit(1), greatest(length(col(text)) - (n - 1), lit(1))))
          .as("i"))
      .select(col(id), substring(col(text), col("i"), lit(n)).as("gram"))
      .distinct()

  /** The gram -> 8-byte shuffle key. "xxhash64" (default) is the
    * production mode: codegen'd, one pass, no hex round-trip.
    * "md5" (60-bit, via hex) is the cross-engine-reproducible mode the
    * oracle-gated catalog pins (any engine derives the same key), at
    * ~2x the scan CPU. Collisions merge identically in every engine
    * applying the same hash (~2^-60 per pair). */
  private def gramHash(c: Column, hash: String): Column = hash match {
    case "xxhash64" => xxhash64(c)
    case "md5" => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    case other => throw new IllegalArgumentException(
      s"unknown gram hash mode: $other (xxhash64 | md5)")
  }

  /**
   * Distinct (id, 8-byte gram hash) pairs with the hash applied
   * map-side, BEFORE the distinct's exchange — every shuffle carries
   * an 8-byte key instead of gram text (the 100 TB shape). `fullOnly`
   * keeps only grams of exactly n chars (drops the truncated gram
   * short texts produce). `hash` picks the key function — see
   * [[gramHash]].
   */
  def charShingleHashes(docs: DataFrame, n: Int = 3, fullOnly: Boolean = false,
                        id: String = "doc_id", text: String = "text",
                        hash: String = "xxhash64"): DataFrame = {
    val grams = docs.select(col(id), col(text),
        explode(sequence(lit(1), greatest(length(col(text)) - (n - 1), lit(1))))
          .as("i"))
      .select(col(id), substring(col(text), col("i"), lit(n)).as("gram"))
    val kept = if (fullOnly) grams.where(length(col("gram")) === n) else grams
    kept.select(col(id), gramHash(col("gram"), hash).as("gram_hash"))
      .distinct()
  }

  /** Position-preserving variant of [[charShingleHashes]]:
    * (id, i, gram_hash) for every FULL n-gram start position i
    * (1-based), hash applied map-side. Not deduplicated — the span
    * sessionization below needs every position. */
  def charShingleHashPositions(docs: DataFrame, n: Int,
                               id: String = "doc_id",
                               text: String = "text",
                               hash: String = "xxhash64"): DataFrame =
    docs.select(col(id), col(text),
        explode(sequence(lit(1), greatest(length(col(text)) - (n - 1), lit(1))))
          .as("i"))
      .select(col(id), col("i"),
        substring(col(text), col("i"), lit(n)).as("gram"))
      .where(length(col("gram")) === n)
      .select(col(id), col("i").cast("long").as("i"),
        gramHash(col("gram"), hash).as("gram_hash"))

  /**
   * Maximal duplicated spans — the ranges Lee et al.-style dedup
   * actually CUTS from documents: per-doc character intervals covered
   * by n-grams appearing in >= 2 distinct documents, with
   * overlapping/adjacent gram intervals merged (two fixed-length-n
   * intervals merge iff their start gap <= n). Output
   * (doc_id, span_start, span_end, n_grams), 1-based inclusive char
   * offsets. Scale shape: dup-gram detection shuffles 8-byte map-side
   * gram hashes; the sessionization windows are PER DOC (shuffle key
   * doc_id, sort bounded by doc length) — never a global window.
   */
  def dupSpanRanges(docs: DataFrame, n: Int = 20,
                    id: String = "doc_id", text: String = "text",
                    hash: String = "xxhash64"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = charShingleHashPositions(docs, n, id, text, hash)
    val dup = charShingleHashes(docs, n, fullOnly = true, id, text, hash)
      .groupBy("gram_hash").agg(count(lit(1)).as("nd")) // distinct (doc, hash) rows
      .where(col("nd") >= 2).select("gram_hash")
    val hits = pos.join(dup, "gram_hash").select(col(id), col("i"))
    val w = Window.partitionBy(col(id)).orderBy(col("i"))
    val flagged = hits
      .withColumn("prev", lag(col("i"), 1).over(w))
      .withColumn("new_span",
        when(col("prev").isNull || col("i") - col("prev") > n, 1L).otherwise(0L))
      .withColumn("grp", sum(col("new_span"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(id), col("grp"))
      .agg(min(col("i")).as("s"), max(col("i")).as("e"),
        count(lit(1)).as("n_grams"))
      .select(col(id), col("s").as("span_start"),
        (col("e") + (n - 1)).as("span_end"), col("n_grams"))
  }

  /**
   * Exact n-gram Jaccard for all pairs within a bounded id range
   * (the verification stage downstream of LSH candidates):
   * jaccard_ppm = |A intersect B| * 1e6 / |A union B|.
   * Pairs with an empty intersection are not emitted.
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, maxId: Long = 100,
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    val sub = docs.where(col(id) < maxId)
    // grams feed the size aggregation and both join sides — compute
    // the explode+distinct once (lazy materialization)
    val grams = charShingles(sub, n, id, text).localCheckpoint(false)
    val sizes = grams.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val inter = grams.toDF("id_a", "gram")
      .join(grams.toDF("id_b", "gram"), "gram")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      // integer div, not double-div+cast: exact in every SQL engine
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div (sz_a + sz_b - inter)").as("jaccard_ppm"))
  }
}
