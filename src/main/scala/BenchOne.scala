import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[benchone] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    graft.SparkEntry.queries("dedup_minhash_verified")(spark, dir).count() // warm
    val pairs = graft.SparkEntry.queries("dedup_minhash_verified")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val edges = t("edges-checkpoint") {
      pairs.unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .distinct().localCheckpoint()
    }
    var labels = t("labels-init") {
      edges.select(col("doc_a").as("doc")).distinct().withColumn("lbl", col("doc"))
        .localCheckpoint()
    }
    def step(ls: DataFrame): DataFrame = {
      val propagated = edges
        .join(ls.select(col("doc").as("doc_a"), col("lbl")), "doc_a")
        .groupBy(col("doc_b").as("doc")).agg(min(col("lbl")).as("nbl"))
      val merged = ls.join(propagated, Seq("doc"), "left")
        .select(col("doc"), least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"))
      merged.join(ls.select(col("doc").as("lbl"), col("lbl").as("plbl")), Seq("lbl"), "left")
        .select(col("doc"), least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
    }
    var converged = false; var iter = 0
    while (!converged && iter < 25) {
      val stepped = step(step(labels))
      val next = stepped.join(labels.select(col("doc"), col("lbl").as("old")), "doc")
        .select(col("doc"), col("lbl"), (col("lbl") =!= col("old")).as("chg"))
      labels = t(s"iter-$iter-checkpoint") { next.localCheckpoint() }
      converged = t(s"iter-$iter-probe") { labels.filter(col("chg")).limit(1).isEmpty }
      labels = labels.drop("chg")
      iter += 1
    }
    t("final") {
      val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "lbl")
        .select(col("doc"), col("lbl").as("cluster"), col("cluster_size"))
        .orderBy(col("doc")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
