package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding corpus `embeddings(vec_id, embedding:
  * array<float>, label)`. All math is Column-expression HOFs (zip_with /
  * aggregate) — codegen'd, no UDFs.
  *
  * Scale shape: brute force is the correctness baseline (O(Q·N), broadcast
  * the query side); the LSH and IVF variants bound the scan to matching
  * buckets/probed lists so N never fans out per query.
  */
object VectorOps {

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Codegen'd native dot product (graft.functions.DotProduct) — same
    * left-to-right summation order as the HOF formulation it replaced
    * (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`), so results are
    * bit-identical, just without interpreted lambdas + an intermediate
    * array per comparison.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: queries broadcast against the corpus.
    * Query set = vec_id < nQueries (deterministic).
    */
  def cosineTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic hyperplane components via splitmix64 — reproducible
    * across runs with no RNG state; materialized as one nested array
    * LITERAL so the projection is a pair of HOF loops, not dim×bits×tables
    * scalar expressions (which would explode codegen size).
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[graft] def planes(dim: Int, nBits: Int, nTables: Int): Seq[Seq[Double]] =
    (0 until nTables * nBits).map { j =>
      (0 until dim).map(d => splitmix64(j.toLong * 100003 + d).toDouble / Long.MaxValue)
    }

  /** SQL array literals of the hyperplanes (shortest round-trip digits —
    * a decimal literal parses back to the identical double), so an external
    * engine can recompute the projections BIT-exactly: its sequential
    * list_dot_product matches [[graft.functions.DotProduct]]'s left-to-right
    * summation, making the LSH bucket assignment independently checkable.
    */
  private[graft] def planeSqlLiterals(dim: Int, nBits: Int, nTables: Int): Seq[String] =
    planes(dim, nBits, nTables).map(_.map(d => java.lang.Double.toString(d))
      .mkString("[", ", ", "]"))

  /** Multi-table sign-random-projection codes: (vec_id, table_id, bucket).
    * L independent tables of nBits hyperplanes each — the standard LSH
    * recall lever (P(candidate) = 1-(1-p^nBits)^L).
    */
  def lshCodes(emb: DataFrame, dim: Int, nBits: Int, nTables: Int): DataFrame = {
    val e = toDouble(col("embedding"))
    val planesLit = typedLit(planes(dim, nBits, nTables))
    // proj[i] = <e, plane_i>; bucket_t = bits (t*nBits..t*nBits+nBits-1)
    // folded as acc*2 + sign-bit — all array HOFs, O(1) expression tree.
    val proj = transform(planesLit, p => dot(e, p))
    val codes = transform(sequence(lit(0), lit(nTables - 1)), t =>
      aggregate(slice(proj, t * lit(nBits) + 1, lit(nBits)), lit(0L),
        (acc, x) => acc * 2 + when(x > 0, 1L).otherwise(0L)))
    emb.select(col("vec_id"), col("embedding"),
      posexplode(codes).as(Seq("table_id", "bucket")))
  }

  /** ANN via multi-table LSH: candidates share a (table, bucket) with the
    * query in ANY table; union-distinct, then exact cosine on candidates
    * only. The scan is bounded by bucket sizes, never O(N) per query.
    */
  def annLsh(emb: DataFrame, dim: Int, nQueries: Int = 10, k: Int = 5,
             nBits: Int = 10, nTables: Int = 8): DataFrame = {
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val coded = lshCodes(emb, dim, nBits, nTables)
      .select(col("vec_id"), col("table_id"), col("bucket"))
    val qCodes = coded.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("table_id"), col("bucket"))
    val candidates = coded.join(broadcast(qCodes), Seq("table_id", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = candidates
      .join(base, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (the vector-space analog of
    * MinHash dedup): candidates share an LSH (table, bucket), exact cosine
    * verifies at threshold `tau`. Candidate space is bucket-bounded — never
    * the O(N²) all-pairs — which makes this the 100-TB-scale shape; recall
    * vs brute force is the standard (1-(1-p^nBits)^nTables) LSH trade,
    * asserted on clustered data in the spec.
    */
  def cosineNearDups(emb: DataFrame, dim: Int, tau: Double = 0.4,
                     nBits: Int = 10, nTables: Int = 8): DataFrame = {
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val coded = lshCodes(emb, dim, nBits, nTables)
      .select(col("vec_id"), col("table_id"), col("bucket"))
    val a = coded.select(col("table_id"), col("bucket"), col("vec_id").as("vec_a"))
    val b = coded.select(col("table_id"), col("bucket"), col("vec_id").as("vec_b"))
    val cands = a.join(b, Seq("table_id", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    cands
      .join(base.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na")), Seq("vec_a"))
      .join(base.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .where(col("cosine") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Deterministic k-means-lite coarse quantizer: seeds = the nCells vectors
    * with the smallest xxhash64(vec_id) (reproducible, data-independent
    * tie-break), then `iters` Lloyd rounds as assign→mean aggregation
    * passes. Each round is one shuffle keyed by cell.
    */
  def kmeansCells(base: DataFrame, nCells: Int, iters: Int = 3): DataFrame = {
    // Seed selection is a global top-k (smallest hash), NOT a global window:
    // orderBy(...).limit(k) plans as TakeOrderedAndProject — a tree-reduced
    // per-partition top-k — where row_number() over an unpartitioned Window
    // would funnel the ENTIRE corpus through one partition (the round-1
    // scale-killer). The window below runs on ≤ nCells rows only.
    val seeds = base.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nCells)
    val wSeed = Window.orderBy(xxhash64(col("vec_id")), col("vec_id"))
    var centroids = seeds
      .withColumn("rk", row_number().over(wSeed))
      .select((col("rk") - 1).as("cell"), col("e").as("ce"))
      .withColumn("cn", norm(col("ce")))

    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cell"))
    for (_ <- 0 until iters) {
      val assigned = base.crossJoin(broadcast(centroids))
        .withColumn("c_cos", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
        .withColumn("pr", row_number().over(wAssign))
        .where(col("pr") === 1)
        .select(col("cell"), col("e"))
      centroids = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("cv"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pcs"))
        .select(col("cell"), transform(col("pcs"), p => p.getField("cv")).as("ce"))
        .withColumn("cn", norm(col("ce")))
      centroids.cache().count() // materialize per Lloyd round
    }
    centroids
  }

  /** IVF-style ANN: k-means-lite coarse cells, queries probe the nProbe
    * nearest centroids, exact cosine only over those inverted lists.
    */
  def annIvf(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
             nProbe: Int = 2, nCells: Int = 16): DataFrame = {
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val centroids = kmeansCells(base, nCells)

    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cell"))
    val assigned = base.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("pr", row_number().over(wAssign))
      .where(col("pr") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))

    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select(col("query_id"), col("qe"), col("qn"), col("cell"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
