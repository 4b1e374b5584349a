package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 * brute-force cosine top-k as the exactness baseline, and a
 * random-hyperplane LSH bucketed variant plus an IVF (inverted-file)
 * coarse quantizer as the scale paths.
 *
 * All dot products multiply and accumulate in float64 with
 * element-order accumulation, which is bit-exact against the DuckDB
 * oracle's `list_dot_product(CAST(... AS DOUBLE[]))`.
 */
object Similarity {

  /** Sequential-order float64 dot product of two numeric arrays —
    * the codegen'd [[graft.functions.DotF64Expr]] (a tight primitive
    * loop inside whole-stage codegen; bit-identical to the HOF
    * `aggregate(zip_with(...))` formulation it replaced and to the
    * DuckDB `list_dot_product(CAST(.. AS DOUBLE[]))` oracle). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotF64Expr.dotF64(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: every query joined against every
   * candidate. O(Q x N) — the correctness baseline the approximate
   * paths are verified against; fine when Q is small even at large N
   * (broadcast the queries; the candidate side never shuffles).
   */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int,
                     id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val c = candidates.select(col(id).as("neighbor_id"), col(vec).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic integer-valued hyperplane component for plane `p`,
    * dimension `d` — integer-exact in every engine. */
  def planeComponent(p: Int, d: Int, dims: Int): Long =
    (((p.toLong * dims + d + 1) * 2654435761L) % 1999L) - 999L

  /** Hyperplane sign-bucket of a vector: bit p = (v . plane_p) > 0. */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { p =>
      val plane = array((0 until dims).map(d =>
        lit(planeComponent(p, d, dims).toDouble)): _*)
      when(dot(vec, plane) > 0, lit(1L) * (1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /**
   * LSH ANN: vectors sharing the query's sign-bucket are scored
   * exactly; top-k within the bucket. The bucket assignment is a
   * map-side projection; the candidate join is an equi-join on the
   * bucket id — no cross join at scale.
   */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, dims: Int = 64,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = candidates.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      lshBucket(col(vec), nPlanes, dims).as("bucket"))
    val qb = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv"),
      lshBucket(col(vec), nPlanes, dims).as("bucket")))
    val scored = qb.join(cb, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /**
   * IVF coarse quantization: assign every vector to its nearest
   * centroid (highest dot product; centroids = the first `nCentroids`
   * vectors, a deterministic stand-in for k-means). Queries then probe
   * only their centroid's inverted list. This is the 100 TB path: the
   * assignment is a broadcast argmax projection and search cost drops
   * by the centroid fan-out.
   */
  def ivfAssign(vectors: DataFrame, nCentroids: Int = 16,
                id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val centroids = vectors.where(col(id) < nCentroids)
      .select(col(id).as("centroid_id"), col(vec).as("centv"))
    val c = broadcast(centroids)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id))
      .orderBy(col("score").desc, col("centroid_id"))
    vectors.crossJoin(c)
      .select(col(id), col("centroid_id"), dot(col(vec), col("centv")).as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(id), col("centroid_id"))
  }

  /**
   * Multi-probe LSH ANN: like [[lshTopK]], but each QUERY also probes
   * the `nProbes` neighboring buckets at Hamming distance 1 (one sign
   * bit flipped) — the standard recall fix for sign-bucket LSH: a
   * near-neighbor split across a hyperplane lands one bit away. Only
   * the (small) query side fans out x(1+nProbes); the candidate side
   * is still a plain equi-join on its single bucket.
   */
  def lshTopKMultiProbe(candidates: DataFrame, queries: DataFrame, k: Int,
                        nPlanes: Int = 8, dims: Int = 64, nProbes: Int = 2,
                        id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = candidates.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      lshBucket(col(vec), nPlanes, dims).as("bucket"))
    val probes = explode(array((lit(0L) +: (0 until math.min(nProbes, nPlanes))
      .map(p => lit(1L << p))): _*)).as("flip")
    val qb = broadcast(
      queries.select(col(id).as("query_id"), col(vec).as("qv"),
          lshBucket(col(vec), nPlanes, dims).as("qbucket"))
        .select(col("query_id"), col("qv"), col("qbucket"), probes)
        .select(col("query_id"), col("qv"),
          col("qbucket").bitwiseXOR(col("flip")).as("bucket")))
    val scored = qb.join(cb, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      // a candidate can match several probes of one query: dedup first
      .groupBy("query_id", "neighbor_id").agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /**
   * IVF search: assign every candidate to its inverted list (nearest
   * of the first-nCentroids quantizer, like [[ivfAssign]]); each query
   * probes its `nProbe` closest centroids' lists and scores exact
   * cosine only within them. The candidate side is one broadcast
   * argmax projection + an equi-join on centroid_id — never a cross
   * join against the queries.
   */
  def ivfSearch(candidates: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 2,
                id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = broadcast(candidates.where(col(id) < nCentroids)
      .select(col(id).as("centroid_id"), col(vec).as("centv")))
    // candidate lists: argmax centroid per vector
    val lists = candidates.crossJoin(centroids)
      .select(col(id).as("neighbor_id"), col(vec).as("cv"),
        col("centroid_id"), dot(col(vec), col("centv")).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("neighbor_id"))
          .orderBy(col("score").desc, col("centroid_id"))))
      .where(col("rn") === 1)
      .select(col("neighbor_id"), col("cv"), col("centroid_id"))
    // query probes: top-nProbe centroids per query
    val qProbes = broadcast(queries.crossJoin(centroids)
      .select(col(id).as("query_id"), col(vec).as("qv"),
        col("centroid_id"), dot(col(vec), col("centv")).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("centroid_id"))))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id")))
    val scored = qProbes.join(lists, "centroid_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /**
   * Lloyd k-means for IVF centroid training: deterministic init
   * (first k vectors by id), then `iters` rounds of assign (broadcast
   * argmax, map-side) + recompute (one groupBy per round averaging
   * element-wise via per-dimension sums). Distance = dot product on
   * L2-normalized inputs (spherical k-means, the ANN-standard
   * variant). Returns (centroid_id, centroid: array<double>).
   *
   * Scale shape: the big side is never shuffled by more than one
   * groupBy(cluster) per round, centroids always ride a broadcast.
   */
  def kmeansCentroids(vectors: DataFrame, k: Int, iters: Int = 2,
                      dims: Int = 64, id: String = "vec_id",
                      vec: String = "embedding"): DataFrame = {
    val normalized = vectors
      .select(col(id), col(vec).as("v"), norm(col(vec)).as("nrm"))
      .select(col(id), transform(col("v"), x => x.cast("double") / col("nrm")).as("nv"))
    var centroids = normalized.where(col(id) < k)
      .select(col(id).cast("long").as("centroid_id"), col("nv").as("centroid"))
    for (_ <- 0 until iters) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(id))
        .orderBy(col("score").desc, col("centroid_id"))
      val assigned = normalized.crossJoin(broadcast(centroids))
        .select(col(id), col("nv"), col("centroid_id"),
          dot(col("nv"), col("centroid")).as("score"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      // element-wise sum then renormalize (spherical k-means update:
      // centroid = normalize(sum of members)): k*dims aggregate
      // cells, map-side combined
      val sums = (0 until dims).map(d =>
        sum(element_at(col("nv"), d + 1)).as(s"s$d"))
      val counted = assigned.groupBy("centroid_id")
        .agg(count(lit(1)).as("n"), sums: _*)
      centroids = counted
        .select(col("centroid_id"),
          array((0 until dims).map(d => col(s"s$d")): _*).as("sv"))
        .select(col("centroid_id"), col("sv"), norm(col("sv")).as("nrm"))
        .where(col("nrm") > 0)
        .select(col("centroid_id"),
          transform(col("sv"), x => x / col("nrm")).as("centroid"))
        .localCheckpoint(true) // materialize: next round broadcasts this
    }
    centroids
  }

  /** IVF assignment against trained centroids (broadcast argmax). */
  def ivfAssignTrained(vectors: DataFrame, centroids: DataFrame,
                       id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id))
      .orderBy(col("score").desc, col("centroid_id"))
    vectors.crossJoin(broadcast(centroids))
      .select(col(id), col("centroid_id"),
        dot(col(vec), col("centroid")).as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(id), col("centroid_id"))
  }

  /** Exact near-duplicate pairs by cosine threshold within an id range
    * (embedding-cosine near-dup detection). All-pairs — the
    * verification baseline; the scale path is
    * [[cosineNearDupPairsBlocked]]. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double, maxId: Long,
                         id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val sub = vectors.where(col(id) < maxId)
    val a = sub.select(col(id).as("id_a"), col(vec).as("va"))
    val b = sub.select(col(id).as("id_b"), col(vec).as("vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .where(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /**
   * LSH-blocked embedding near-dup: exact cosine is computed only for
   * pairs sharing a sign-bucket (equi-join on the bucket id), so the
   * cost is sum of squared bucket sizes instead of N^2 — the 100 TB
   * path the all-pairs variant verifies against. High-cosine pairs
   * land in the same bucket with probability (1 - theta/pi)^nPlanes,
   * so recall trades against bucket size via `nPlanes` exactly like
   * the text-side MinHash banding.
   */
  def cosineNearDupPairsBlocked(vectors: DataFrame, threshold: Double,
                                nPlanes: Int = 4, dims: Int = 64,
                                id: String = "vec_id",
                                vec: String = "embedding"): DataFrame = {
    // both self-join sides need the bucket projection (nPlanes dot
    // products per vector) — materialize it once, lazily
    val b = vectors.select(col(id), col(vec),
        lshBucket(col(vec), nPlanes, dims).as("bucket"))
      .localCheckpoint(false)
    val l = b.select(col("bucket"), col(id).as("id_a"), col(vec).as("va"))
    val r = b.select(col("bucket"), col(id).as("id_b"), col(vec).as("vb"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .where(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
