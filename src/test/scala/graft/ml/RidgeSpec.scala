package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RidgeSpec extends SparkSpec {

  test("lambda=0 reduces to OLS; shrinkage is monotone in lambda") {
    import spark.implicits._
    val data = Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.5))
      .toDF("x", "y")
    // (w, b) read off the predictions at the existing x=0 and x=1 rows
    def wb(lam: Double): (Double, Double) = {
      val preds = Ridge.fitPredict(data, "y", "x", lam, roundTo = 9)
        .withColumn("rx", round(col("x"), 6))
      val rows = preds.select("rx", "pred").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toMap
      val b = rows(0.0); (rows(1.0) - b, b)
    }
    val (w0, b0) = wb(0.0)
    // closed-form OLS on the same data: mx=2, my=5.1, Sxy=21, Sxx=10
    assert(math.abs(w0 - 2.1) < 1e-6 && math.abs(b0 - 0.9) < 1e-6, (w0, b0))
    val ws = Seq(0.0, 0.5, 2.0, 10.0).map(l => wb(l)._1)
    assert(ws == ws.sorted.reverse, s"shrinkage not monotone: $ws")
    assert(ws.last > 0 && ws.last < w0)
    // hand value at lambda=1: w = 21 / (10 + 1*5) = 1.4, b = 5.1 - 1.4*2
    val (w1, b1) = wb(1.0)
    assert(math.abs(w1 - 1.4) < 1e-6 && math.abs(b1 - 2.3) < 1e-6, (w1, b1))
  }
}
