package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume diagnostic for the perceptual-hash pair family
  * (round 18; the PpStats discipline applied to mm_phash_pairs after
  * its first decade point read α 1.19 at sf1→sf10). Prints, per
  * corpus: doc/signature counts, the per-band bucket skew terms
  * (Σc², the band join's compare volume over DISTINCT signatures),
  * the Hamming-verified signature-pair count, and the emitted
  * doc-pair volume split into its cross / identical-signature tiers —
  * so a super-linear decade exponent can be attributed to candidate
  * skew vs genuine output growth before any re-plan.
  *
  *   tools/run_main.sh graft.PhashStats <sfDir>
  */
object PhashStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    GraftSession.quietStartup()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitions(cpus, GraftSession.dirBytes(sfDir)).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBenignLogs()

    val sim = graft.operators.Multimodal
      .phashImages(graft.operators.Multimodal.phashMedia(spark, sfDir))
      .filter(col("ok"))
      .select(col("doc_id"), col("phash").as("simhash"))
      .toDF().localCheckpoint()
    val nDocs = sim.count()
    val sigs = sim.select(col("simhash")).distinct().localCheckpoint()
    val nSigs = sigs.count()
    println(f"[phstats] docs=$nDocs sigs=$nSigs dupRatio=${nDocs.toDouble / nSigs}%.2f")

    val blocks = sigs.select(col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("block_idx", "block")))
    // per-band candidate volume: Σ c·(c−1)/2 over buckets, plus the
    // largest bucket (the skew the equi-join's biggest task sees)
    blocks.groupBy(col("block_idx"), col("block")).agg(count(lit(1)).as("c"))
      .groupBy(col("block_idx"))
      .agg(count(lit(1)).as("buckets"),
        sum(col("c") * (col("c") - 1) / 2).as("cand_pairs"),
        max(col("c")).as("max_bucket"))
      .orderBy(col("block_idx"))
      .collect().foreach(r => println(s"[phstats] band=${r.get(0)} " +
        s"buckets=${r.get(1)} cand_pairs=${r.get(2)} max_bucket=${r.get(3)}"))

    val sigPairs = blocks.as("a").join(blocks.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block") === col("b.block") &&
          col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("sa"), col("b.simhash").as("sb"))
    val nCand = sigPairs.count()
    val verified = sigPairs
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3).distinct()
      .localCheckpoint()
    val nVer = verified.count()
    val nCross = verified
      .join(sim.as("da"), col("sa") === col("da.simhash"))
      .join(sim.as("db"), col("sb") === col("db.simhash")).count()
    val nSame = sim.as("x").join(sim.as("y"),
      col("x.simhash") === col("y.simhash") &&
        col("x.doc_id") < col("y.doc_id")).count()
    println(f"[phstats] band_cand_sigpairs=$nCand verified_sigpairs=$nVer " +
      f"fp_ratio=${if (nVer > 0) nCand.toDouble / nVer else Double.NaN}%.1f " +
      f"cross_docpairs=$nCross samesig_docpairs=$nSame emitted=${nCross + nSame}")
    spark.stop()
  }
}
