object BenchSubset {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-subset")
    val dir = "/root/testdata/sf0.1"
    val all = graft.SparkEntry.queries
    for (n <- Seq("b2_smote", "b5_nearmiss", "b7_adasyn", "b9_smote_tomek",
                  "b10_smote_enn", "b8_borderline_smote")) {
      val t0 = System.nanoTime()
      val rows = all(n)(spark, dir).count()
      println(f"[subset] $n%-20s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
    }
    spark.stop()
  }
}
