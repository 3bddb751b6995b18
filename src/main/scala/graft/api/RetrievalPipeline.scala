package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tunables for [[RetrievalPipeline]]. Defaults reproduce the oracle-gated
  * `sim_ivf_pq_topk` query exactly (PipelineSpec pins the equivalence).
  *
  * @param m      PQ subspaces (embedding dim must be m·subDim)
  * @param subDim dims per PQ subspace
  * @param nprobe coarse cells each query scans
  * @param topK   results per query
  */
case class RetrievalConfig(
    m: Int = 4,
    subDim: Int = 16,
    nprobe: Int = 2,
    topK: Int = 3)

/** IVF-PQ retrieval as a PUBLIC, composable API — index construction and
  * search as `DataFrame => DataFrame` stages that fuse into one Catalyst
  * plan, mirroring [[CorpusPipeline]]/[[DedupPipeline]]. The caller
  * supplies centroid/codebook seed rows (k-means in production —
  * [[graft.ops.LlmSimilarity.kmeans]] — data-seeded in the gated demo);
  * everything downstream is the same broadcast-LUT asymmetric-distance
  * plan the `sim_ivf_pq_topk` gate hash-checks.
  *
  * Contracts: `corpus` is (vec_id: Long, emb: Array[Double]); `cells` is
  * (cell: Int, cent: Array[Double]); queries are (q_id, q_emb). At scale
  * the index tables (cell + codes) persist as parquet and only `probe` →
  * `lut` → `adcSearch` runs per query batch, touching nprobe/k of the
  * corpus codes. */
class RetrievalPipeline(cfg: RetrievalConfig = RetrievalConfig()) {

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
  private def dotf(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def subspaces(df: DataFrame, vcol: String): DataFrame =
    df.select(col("vec_id"), col("cell"),
      posexplode(array((0 until cfg.m).map(j =>
        slice(col(vcol), j * cfg.subDim + 1, cfg.subDim)): _*))
        .as(Seq("j", "sub")))

  /** Min-L2 cell assignment; emits the residual each vector quantizes. */
  def assign(corpus: DataFrame, cells: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdist").asc, col("cell"))
    corpus.crossJoin(broadcast(cells))
      .withColumn("cdist", l2sq(col("emb"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"),
        zip_with(col("emb"), col("cent"), (x, c) => x - c).as("res"))
  }

  /** Residual PQ codebooks from caller-chosen seed rows of `assigned`. */
  def codebooks(seedRows: DataFrame): DataFrame =
    subspaces(seedRows, "res")
      .select(col("j"), col("vec_id").cast("int").as("cid"),
        col("sub").as("csub"))

  /** Compress every vector to m codes (nearest codebook entry per
    * subspace) + its cell id — the persisted index at scale. */
  def encode(assigned: DataFrame, cbook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dist").asc, col("cid"))
    subspaces(assigned, "res").join(broadcast(cbook), "j")
      .withColumn("dist", l2sq(col("sub"), col("csub")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("c_id"), col("cell").as("c_cell"),
        col("j"), col("cid").as("code"))
  }

  /** nprobe nearest cells per query, with the q·centroid term and the
    * query residual both carried forward. */
  def probe(queries: DataFrame, cells: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qdist").asc, col("cell"))
    queries.crossJoin(broadcast(cells))
      .withColumn("qdist", l2sq(col("q_emb"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cfg.nprobe)
      .select(col("q_id"), col("cell"),
        dotf(col("q_emb"), col("cent")).as("qc_dot"),
        zip_with(col("q_emb"), col("cent"), (x, c) => x - c).as("q_res"))
  }

  /** Per-(query, cell) lookup table of residual sub-dots per codebook
    * entry — the tiny broadcast that makes ADC scoring map-only. */
  def lut(probes: DataFrame, cbook: DataFrame): DataFrame =
    probes
      .select(col("q_id"), col("cell"), col("qc_dot"),
        posexplode(array((0 until cfg.m).map(j =>
          slice(col("q_res"), j * cfg.subDim + 1, cfg.subDim)): _*))
          .as(Seq("qj", "qsub")))
      .join(broadcast(cbook), col("qj") === col("j"))
      .select(col("q_id"), col("cell"), col("qc_dot"), col("qj"), col("cid"),
        dotf(col("qsub"), col("csub")).as("pdot"))

  /** Asymmetric-distance search: q·c ≈ q·centroid + Σⱼ LUT[j, codeⱼ],
    * summed value-sorted for engine-identical doubles; topK per query. */
  def adcSearch(codes: DataFrame, lutDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    codes.join(broadcast(lutDf),
        codes("c_cell") === lutDf("cell") && codes("j") === lutDf("qj") &&
          codes("code") === lutDf("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy(col("q_id"), col("c_id"), col("qc_dot"))
      .agg(aggregate(array_sort(collect_list(col("pdot"))),
        lit(0.0), (a, v) => a + v).as("rsum"))
      .withColumn("score", col("qc_dot") + col("rsum"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cfg.topK)
      .select(col("q_id"), col("rank"), col("c_id"), col("score"))
  }

  /** End-to-end: index the corpus against `cells`, train codebooks on
    * `codebookSeeds` (rows of the assignment), search `queries`. */
  def searchTopK(corpus: DataFrame, cells: DataFrame,
      codebookSeedIds: Column, queries: DataFrame): DataFrame = {
    val assigned = assign(corpus, cells).localCheckpoint(false)
    val cbook = codebooks(assigned.filter(codebookSeedIds))
    val codes = encode(assigned, cbook)
    adcSearch(codes, lut(probe(queries, cells), cbook))
      .orderBy(col("q_id"), col("rank"))
  }
}
