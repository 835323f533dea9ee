package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persisted IVF vector index — the vector twin of the text engine's
  * segment store: TRAIN ONCE (the deterministic sampled Lloyd shared
  * with [[TrainOps.annIvfKmeans]]), assign the full corpus once, and
  * persist `(vec_id, embedding)` PARTITIONED BY cell alongside the
  * centroid table, committed by an atomically-renamed manifest. A
  * query then collects the tiny centroid table, picks its probe
  * cells, and reads ONLY those cell partitions — `cell IN (...)` is a
  * partition-pruning predicate, so at 10¹²-vector scale the exact
  * rescore touches nprobe/cells of the data instead of scanning the
  * corpus to recompute assignments per query (which is what the
  * on-the-fly variant must do). Storage is invisible by construction:
  * training, assignment, probe order, rescore and tie-breaks are the
  * same arithmetic, so [[queryGate]] satisfies the same oracle as the
  * on-the-fly ann_ivf_kmeans entry.
  *
  * Reference framing: a Lucene segment's term dictionary + postings
  * become the centroid table + cell partitions; [[build]] is the
  * IndexWriter commit (idempotent: an existing manifest with the same
  * params is reused — the checkpoint-resume discipline of
  * graft.index.SegmentStore). */
object AnnIndex {

  private val ManifestName = "manifest.json"

  /** Deterministic per-(sfDir) root under the system tmpdir (the
    * Engine.segRoot sanitize+hash discipline — sanitization alone can
    * collide). */
  def defaultRoot(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val tag = Integer.toHexString(sfDir.hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft_ann_${safe}_$tag"
  }

  /** Train + assign + persist; no-op when a manifest with the same
    * params AND corpus fingerprint already exists (hyperparameters
    * alone are not identity — regenerated data at the same path must
    * invalidate the index). Returns the root. */
  def build(spark: SparkSession, sfDir: String,
      root0: String = null, cells: Int = TrainOps.IvfCells): String = {
    val root = Option(root0).getOrElse(defaultRoot(sfDir))
    val e = TrainOps.embeddings(spark, sfDir)
    // corpus fingerprint: one full-scan agg of row count + a
    // CONTENT-sensitive per-row hash XOR (id AND embedding — ids alone
    // would match a regenerated table with the same sequential ids;
    // XOR is order-independent and overflow-free under ANSI mode, and
    // coalesces to 0 on an empty corpus). At warehouse scale swap this
    // scan for the source table's snapshot id; the manifest contract
    // stays the same.
    val fpRow = e.select(TrainOps.h60(concat(
        col("vec_id").cast("string"), lit(":"),
        col("embedding").cast("string"))).as("h"))
      .agg(count(lit(1)),
        expr("coalesce(bit_xor(h), CAST(0 AS BIGINT))")).collect()(0)
    val params = s"""{"cells":$cells,""" +
      s""""probes":${TrainOps.IvfProbes},""" +
      s""""sample":${math.max(TrainOps.IvfTrainSample, 4 * cells)},""" +
      s""""iters":${TrainOps.IvfKmeansIters},""" +
      s""""corpus_n":${fpRow.getLong(0)},""" +
      s""""corpus_h":${fpRow.getLong(1)}}"""
    val manifest = new java.io.File(root, ManifestName)
    if (manifest.isFile) {
      val have = new String(java.nio.file.Files.readAllBytes(
        manifest.toPath), "UTF-8")
      if (have == params) return root // committed build, same identity
      // a mismatched committed manifest must not endorse the data
      // this rebuild is about to overwrite: invalidate FIRST, so a
      // crash mid-rebuild leaves an uncommitted (loudly unreadable)
      // store, never a stale-manifest/new-data hybrid
      java.nio.file.Files.delete(manifest.toPath)
    }
    val cents = TrainOps.ivfTrainCentroids(e, cells,
      math.max(TrainOps.IvfTrainSample, 4 * cells))
    import spark.implicits._
    // centroid table: (cell, centroid) — the broadcastable dictionary
    cents.zipWithIndex.map { case (cv, c) => (c, cv.toSeq) }
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/centroids")
    // cell partitions: the IVF "posting lists" — assignment is the
    // broadcast-argmax scan (one pass over the corpus at ANY cell count)
    TrainOps.ivfAssignCellsIdx(e, cents)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/cells")
    // manifest last + atomic rename = the commit point
    val tmp = new java.io.File(root, s"$ManifestName.tmp")
    java.nio.file.Files.write(tmp.toPath, params.getBytes("UTF-8"))
    if (!tmp.renameTo(manifest))
      sys.error(s"ann index commit failed: $root")
    root
  }

  /** Append a batch of `(vec_id, embedding)` rows to a committed
    * index — the IndexWriter-append discipline for vectors: the
    * centroid table is FROZEN (appends never retrain the dictionary,
    * exactly like text segments never rewrite the term space), the new
    * rows are assigned with it and written as additional files under
    * the same cell partitions, immediately visible to [[query]].
    * Centroid drift under heavy appends is the compaction story:
    * rebuild with [[build]] on a fresh root, then swap — same as
    * forceMerge. */
  def append(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    require(new java.io.File(root, ManifestName).isFile,
      s"no committed ann index at $root")
    val cents: IndexedSeq[Array[Double]] =
      spark.read.parquet(s"$root/centroids").orderBy("cell").collect()
        .map(r => r.getSeq[Double](1).toArray).toIndexedSeq
    TrainOps.ivfAssignCellsIdx(
        batch.select(col("vec_id"), col("embedding")), cents)
      .write.mode("append").partitionBy("cell").parquet(s"$root/cells")
  }

  /** Top-k for the embedding of `queryId` against the persisted index:
    * centroids collected (broadcast-dictionary role), probe cells
    * chosen driver-side, ONLY those partitions read and exactly
    * rescored. */
  def query(spark: SparkSession, root: String, qv: IndexedSeq[Double],
      excludeId: Long, k: Int,
      nprobe: Int = TrainOps.IvfProbes): DataFrame = {
    require(new java.io.File(root, ManifestName).isFile,
      s"no committed ann index at $root")
    val cents: IndexedSeq[Array[Double]] =
      spark.read.parquet(s"$root/centroids").orderBy("cell").collect()
        .map(r => r.getSeq[Double](1).toArray).toIndexedSeq
    val probed = TrainOps.ivfProbeCells(cents, qv, nprobe)
    spark.read.parquet(s"$root/cells")
      .filter(col("cell").isin(probed: _*)) // partition-pruned
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        TrainOps.cosToQueryD(col("embedding"), qv).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .select(col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Gate entry: build (or reuse) the persisted index, query it with
    * embedding 0 — must satisfy the SAME oracle as the on-the-fly
    * k-means IVF entry. */
  def queryGate(spark: SparkSession, sfDir: String,
      queryId: Long = 0L, k: Int = 10): DataFrame = {
    val root = build(spark, sfDir)
    val qv = TrainOps.embeddings(spark, sfDir)
      .filter(col("vec_id") === queryId)
      .select("embedding").collect()(0).getSeq[Float](0)
      .map(_.toDouble).toIndexedSeq
    query(spark, root, qv, queryId, k)
  }
}
